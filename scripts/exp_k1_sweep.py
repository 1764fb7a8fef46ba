"""Experiment: is two-view essential-RANSAC consensus a usable k1 selector?

Renders the e2e ring pinhole, applies known SIMPLE_RADIAL k1 to every frame
(same warp as exp_distort_selfcal), ratio-matches the strongest pairs, then
sweeps a k1 grid: undistort the raw matches with each candidate, run batched
essential RANSAC at a constant pixel tolerance, and plot inlier consensus vs
k1 at several tolerances. If the curve peaks at the true k1, this becomes the
mapper's k1 decision (the focal sweep's sibling) — decided BEFORE the map can
absorb distortion into warped geometry.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from tests.test_sfm_e2e import make_textured_scene, ring_cameras, W, H, FX
from tpu_splat.core.types import Cameras
from tpu_splat.gs.render import render_cloud
from tpu_splat.sfm.features import FeatureConfig
from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig
from tpu_splat.sfm.geometry import essential_ransac_pairs
from tpu_splat.sfm.matching import match_descriptors_pairs, select_pairs
from scripts.exp_distort_selfcal import distort_images

K1_TRUE = -0.10


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
    images_d = distort_images(images, FX, W / 2, H / 2, K1_TRUE)

    cfg = MapperConfig(
        feature=FeatureConfig(
            max_features=1024, num_octaves=3, contrast_threshold=0.006,
            upsample_first=True,
        ),
        matching_method="exhaustive", ratio=0.9, min_pair_inliers=20,
    )
    m = IncrementalMapper(images_d, cfg, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                          log_fn=lambda s: print("  " + s, flush=True))
    m.extract_all()

    descs = np.stack([f.descriptor for f in m.feats])
    valids = np.stack([f.valid for f in m.feats])
    pairs = np.asarray(select_pairs("exhaustive", n, exhaustive_max_images=64,
                                    descriptors=descs, valids=valids))
    mb = match_descriptors_pairs(
        jnp.asarray(descs), jnp.asarray(valids), pairs,
        ratio=cfg.ratio, max_matches=cfg.max_matches_per_pair)
    mb_idx, mb_valid = np.asarray(mb.idx), np.asarray(mb.valid)
    counts = mb_valid.sum(1)
    top = np.argsort(-counts)[:8]
    print("top pairs:", [tuple(pairs[i]) for i in top],
          "counts:", counts[top].tolist(), flush=True)

    xy = np.stack([f.xy for f in m.feats]).astype(np.float32)
    c = np.array([W / 2, H / 2], np.float32)
    A, B = pairs[top, 0], pairs[top, 1]
    pxa = (xy[A[:, None], mb_idx[top, :, 0]] - c) / FX  # (T, M, 2) normalized
    pxb = (xy[B[:, None], mb_idx[top, :, 1]] - c) / FX

    def undist(x, k1):
        xu = x
        for _ in range(4):
            r2 = np.sum(xu * xu, axis=-1, keepdims=True)
            xu = x / (1.0 + k1 * r2)
        return xu

    k1_grid = np.arange(-0.25, 0.2001, 0.05)
    for tol_px in (4.0, 2.0, 1.0):
        scores = []
        for k1 in k1_grid:
            xa = np.concatenate([undist(pxa, k1)])
            xb = np.concatenate([undist(pxb, k1)])
            keys = jax.random.split(jax.random.PRNGKey(7), len(top))
            _, inl = essential_ransac_pairs(
                jnp.asarray(xa, jnp.float32), jnp.asarray(xb, jnp.float32),
                jnp.asarray(mb_valid[top]), keys,
                jnp.full((len(top),), tol_px / FX, jnp.float32))
            scores.append(int(np.asarray(inl).sum()))
        peak = k1_grid[int(np.argmax(scores))]
        print(f"tol {tol_px:.0f}px: consensus {scores}  "
              f"peak k1={peak:+.2f} (true {K1_TRUE:+.2f})", flush=True)


if __name__ == "__main__":
    main()
