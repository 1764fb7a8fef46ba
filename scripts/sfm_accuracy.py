"""SfM accuracy harness: run the e2e ring scene, report per-view camera-center
error after similarity alignment, scale drift along the chain, and track-graph
connectivity stats. Run on CPU:
    JAX_PLATFORMS=cpu python scripts/sfm_accuracy.py [--views N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=16)
    args = ap.parse_args()

    from tests.test_sfm_e2e import make_textured_scene, ring_cameras, W, H, FX
    from tpu_splat.core.types import Cameras
    from tpu_splat.gs.render import render_cloud
    from tpu_splat.sfm.features import FeatureConfig
    from tpu_splat.sfm.geometry import umeyama_alignment
    from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig

    rng = np.random.default_rng(5)
    cloud = make_textured_scene(rng)
    viewmats_gt = ring_cameras(n_views=args.views)
    n = len(viewmats_gt)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats_gt)),
        fx=jnp.full((n,), FX), fy=jnp.full((n,), FX),
        cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        distortion=jnp.zeros((n, 4)), width=W, height=H,
    )
    images = np.stack([
        np.asarray(render_cloud(cloud, cams, i, background=jnp.full(3, 0.7),
                                max_per_tile=256).color)
        for i in range(n)
    ])

    cfg = MapperConfig(
        feature=FeatureConfig(max_features=1024, num_octaves=3,
                              contrast_threshold=0.006, upsample_first=True),
        matching_method="exhaustive", ratio=0.9, min_pair_inliers=20,
        ba_every=3,
    )
    t0 = time.time()
    m = IncrementalMapper(images, cfg, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                          log_fn=lambda s: None)
    m.extract_all()
    m.match_all()
    m.build_tracks()
    scene = m.reconstruct()
    dt = time.time() - t0

    reg = np.asarray(scene.registered)
    print(f"registered {reg.sum()}/{n} in {dt:.0f}s, {scene.num_points} points")

    # pair-graph connectivity: how far apart are matched views?
    spans = sorted(abs(a - b) for (a, b) in m.pair_matches)
    import collections
    hist = collections.Counter(spans)
    print("pair span histogram:", dict(sorted(hist.items())))
    tlens = [sum(m.registered[i] for i, _ in t) for t in m.tracks]
    tlens = [t for t, hp in zip(tlens, m.has_point) if hp]
    print(f"track length: mean {np.mean(tlens):.2f} max {max(tlens)} "
          f"n>=4: {np.mean(np.array(tlens) >= 4):.0%}")

    gt_centers = np.stack([
        -viewmats_gt[i][:3, :3].T @ viewmats_gt[i][:3, 3] for i in range(n)
    ])[reg]
    rec_centers = np.asarray(scene.cameras.camtoworlds[:, :3, 3])
    s, R, t = umeyama_alignment(jnp.asarray(rec_centers, jnp.float32),
                                jnp.asarray(gt_centers, jnp.float32))
    aligned = float(s) * rec_centers @ np.asarray(R).T + np.asarray(t)
    err = np.linalg.norm(aligned - gt_centers, axis=-1)
    rmse = np.sqrt(np.mean(err ** 2))
    print(f"center RMSE {rmse:.3f} ({rmse / 4.0:.1%} of scene size)")
    print("per-view err:", np.array2string(err, precision=3))

    # local scale drift: consecutive-camera distances vs GT
    d_rec = np.linalg.norm(np.diff(aligned, axis=0), axis=1)
    d_gt = np.linalg.norm(np.diff(gt_centers, axis=0), axis=1)
    print("consecutive-distance ratio:",
          np.array2string(d_rec / d_gt, precision=3))


if __name__ == "__main__":
    main()
