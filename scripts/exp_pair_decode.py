"""Diagnostic: per-pair essential decode accuracy on the e2e ring fixture.

For every adjacent (and +2) pair of the 16-view 240-degree ring, run the
mapper's padded essential RANSAC + decompose and compare the relative pose
against ground truth. Run from BOTH the repo and a worktree at an older
commit to attribute e2e drift changes to the two-view front-end vs the
mapper's growth logic.

Usage: python scripts/exp_pair_decode.py   (cwd decides which code runs)
"""

import os
import sys

sys.path.insert(0, os.getcwd())

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tests.test_sfm_e2e import make_textured_scene, ring_cameras, W, H, FX
from tpu_splat.core.types import Cameras
from tpu_splat.gs.render import render_cloud
from tpu_splat.sfm.features import FeatureConfig
from tpu_splat.sfm.geometry import decompose_essential, log_so3
from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig


def main():
    rng = np.random.default_rng(5)
    cloud = make_textured_scene(rng)
    viewmats = ring_cameras()
    n = len(viewmats)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n,), FX), fy=jnp.full((n,), FX),
        cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        distortion=jnp.zeros((n, 4)), width=W, height=H,
    )
    print("rendering...", flush=True)
    images = np.stack([
        np.asarray(render_cloud(cloud, cams, i, background=jnp.full(3, 0.7),
                                max_per_tile=256).color)
        for i in range(n)
    ])
    cfg = MapperConfig(
        feature=FeatureConfig(
            max_features=1024, num_octaves=3, contrast_threshold=0.006,
            upsample_first=True,
        ),
        matching_method="exhaustive",
        ratio=0.9,
        min_pair_inliers=20,
        ba_every=3,
    )
    with jax.default_matmul_precision("highest"):
        m = IncrementalMapper(images, cfg, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                              log_fn=lambda s: None)
        m.extract_all()
        m.match_all()
        thresh_n = cfg.pixel_threshold / FX

        rows = []
        for d in (1, 2):
            for a in range(n - d):
                b = a + d
                if (a, b) not in m.pair_matches:
                    rows.append((a, b, None, None, 0))
                    continue
                idx = m.pair_matches[(a, b)]
                xa = m._norm_coords(a, idx[:, 0])
                xb = m._norm_coords(b, idx[:, 1])
                E, inl, xap, xbp, _m2 = m._ransac_padded(xa, xb, thresh_n)
                Rrel, trel = decompose_essential(
                    E, jnp.asarray(xap), jnp.asarray(xbp), jnp.asarray(inl))
                Rrel, trel = np.asarray(Rrel), np.asarray(trel)
                # GT relative pose a->b: w2c_b @ c2w_a
                Rga = viewmats[a][:3, :3]
                Rgb = viewmats[b][:3, :3]
                tga = viewmats[a][:3, 3]
                tgb = viewmats[b][:3, 3]
                Rg = Rgb @ Rga.T
                tg = tgb - Rg @ tga
                tg = tg / np.linalg.norm(tg)
                dr = np.degrees(np.linalg.norm(np.asarray(
                    log_so3(jnp.asarray(Rrel @ Rg.T, jnp.float32)))))
                tn = trel / max(np.linalg.norm(trel), 1e-12)
                dt = np.degrees(np.arccos(np.clip(abs(float(tn @ tg)), -1, 1)))
                rows.append((a, b, dr, dt, int(np.asarray(inl).sum())))

        print(f"{'pair':>8} {'rot_err_deg':>12} {'t_dir_err_deg':>14} {'inl':>5}")
        errs_r, errs_t = [], []
        for a, b, dr, dt, ninl in rows:
            if dr is None:
                print(f"({a:2d},{b:2d})   unverified")
                continue
            print(f"({a:2d},{b:2d}) {dr:12.3f} {dt:14.3f} {ninl:5d}")
            if b - a == 1:
                errs_r.append(dr)
                errs_t.append(dt)
        print(f"adjacent-pair medians: rot {np.median(errs_r):.3f} deg, "
              f"tdir {np.median(errs_t):.3f} deg; "
              f"max rot {np.max(errs_r):.3f}, max tdir {np.max(errs_t):.3f}")


if __name__ == "__main__":
    main()
