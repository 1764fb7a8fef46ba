"""Diagnose detector quality vs render resolution (VERDICT r4 item 3).

Renders the e2e ring scene at several resolutions, extracts features with the
runner's config selection, matches adjacent pairs, and scores matches against
the GROUND-TRUTH essential matrix (symmetric epipolar distance) — a
registration-independent measure of detector/matcher scaling.

    JAX_PLATFORMS=cpu python scripts/exp_detector_scale.py [--res 160 240 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def gt_essential(w2c_a, w2c_b):
    """E such that x2n^T E x1n = 0 for normalized coords (a -> b)."""
    rel = w2c_b @ np.linalg.inv(w2c_a)
    R, t = rel[:3, :3], rel[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs="*", default=[160, 240, 320, 480])
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--octaves", type=int, default=0, help="0 = runner policy")
    ap.add_argument("--upsample", type=int, default=-1, help="-1 = policy")
    ap.add_argument("--maxfeat", type=int, default=0, help="0 = policy")
    args = ap.parse_args()

    from tests.test_sfm_e2e import make_textured_scene, ring_cameras
    from tpu_splat.core.types import Cameras
    from tpu_splat.gs.render import render_cloud
    from tpu_splat.sfm.features import (FeatureConfig, extract_features_batch,
                                        rgb_to_gray)
    from tpu_splat.sfm.matching import match_descriptors

    rng = np.random.default_rng(5)
    cloud = make_textured_scene(rng)
    viewmats_gt = ring_cameras(n_views=args.views)
    n = len(viewmats_gt)

    for res in args.res:
        w = h = res
        fx = 140.0 * res / 160.0
        cams = Cameras(
            camtoworlds=jnp.asarray(np.linalg.inv(viewmats_gt)),
            fx=jnp.full((n,), fx), fy=jnp.full((n,), fx),
            cx=jnp.full((n,), w / 2), cy=jnp.full((n,), h / 2),
            distortion=jnp.zeros((n, 4)), width=w, height=h,
        )
        images = np.stack([
            np.asarray(render_cloud(cloud, cams, i,
                                    background=jnp.full(3, 0.7),
                                    max_per_tile=256).color)
            for i in range(n)
        ])

        small = res < 400
        cfg = FeatureConfig(
            max_features=(args.maxfeat or (1024 if small else 4096)),
            num_octaves=(args.octaves or (3 if small else 4)),
            upsample_first=(small if args.upsample < 0 else bool(args.upsample)),
        )
        gray = jnp.asarray(np.stack([
            np.asarray(rgb_to_gray(jnp.asarray(im))) for im in images]))
        t0 = time.time()
        feats = extract_features_batch(gray, cfg, h, w)
        t_ext = time.time() - t0
        nval = np.asarray(feats.valid).sum(1)

        stats = []
        for i in range(n - 1):
            j = i + 1
            m_ab, m_valid = match_descriptors(
                feats.descriptor[i], feats.valid[i],
                feats.descriptor[j], feats.valid[j], ratio=0.9)
            m_ab = np.asarray(m_ab)[np.asarray(m_valid)]
            if len(m_ab) == 0:
                stats.append((0, 0, np.nan))
                continue
            xy_a = np.asarray(feats.xy[i])[m_ab[:, 0]]
            xy_b = np.asarray(feats.xy[j])[m_ab[:, 1]]
            x1n = np.concatenate(
                [(xy_a - [w / 2, h / 2]) / fx, np.ones((len(xy_a), 1))], 1)
            x2n = np.concatenate(
                [(xy_b - [w / 2, h / 2]) / fx, np.ones((len(xy_b), 1))], 1)
            E = gt_essential(viewmats_gt[i], viewmats_gt[j])
            Ex1 = x1n @ E.T
            Etx2 = x2n @ E
            num = np.abs(np.sum(x2n * Ex1, 1))
            # symmetric epipolar distance in PIXELS
            d = num * fx * np.sqrt(
                1.0 / np.maximum(Ex1[:, 0]**2 + Ex1[:, 1]**2, 1e-12)
                + 1.0 / np.maximum(Etx2[:, 0]**2 + Etx2[:, 1]**2, 1e-12)) / np.sqrt(2)
            good = d < 2.0  # px
            stats.append((len(m_ab), int(good.sum()),
                          float(np.median(d[good])) if good.any() else np.nan))

        nm = np.array([s[0] for s in stats])
        ni = np.array([s[1] for s in stats])
        med = np.array([s[2] for s in stats])
        print(f"res={res:4d} cfg(oct={cfg.num_octaves} up={int(cfg.upsample_first)} "
              f"K={cfg.max_features}): kp/img={nval.mean():6.0f}  "
              f"matches/pair={nm.mean():6.0f}  gt-inliers={ni.mean():6.0f} "
              f"({100*ni.sum()/max(nm.sum(),1):4.1f}%)  med_err="
              f"{np.nanmean(med):5.3f}px  t_extract={t_ext:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
