"""Debug harness for the ring self-calibration scenario (test_sfm_e2e.py::
test_sfm_self_calibration): caches the rendered capture, runs the mapper with
no intrinsics, prints the focal trajectory and PER-CAMERA center errors after
similarity alignment. Not a test — a diagnosis tool for registration-cliff
work on the 1-core box (re-rendering the fixture costs ~a minute per run)."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.test_sfm_e2e import (FX, H, W, make_textured_scene, ring_cameras)
from tpu_splat.core.types import Cameras
from tpu_splat.gs.render import render_cloud
from tpu_splat.sfm.features import FeatureConfig
from tpu_splat.sfm.geometry import umeyama_alignment
from tpu_splat.sfm.mapper import MapperConfig, run_sfm

def capture(size=None):
    size = size or W
    fx = FX * size / W
    cache = f"/tmp/selfcal_ring_capture_{size}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return d["images"], d["viewmats"], fx
    rng = np.random.default_rng(5)
    cloud = make_textured_scene(rng)
    viewmats = ring_cameras()
    n = len(viewmats)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n,), fx), fy=jnp.full((n,), fx),
        cx=jnp.full((n,), size / 2), cy=jnp.full((n,), size / 2),
        distortion=jnp.zeros((n, 4)), width=size, height=size,
    )
    images = np.stack([
        np.asarray(render_cloud(cloud, cams, i, background=jnp.full(3, 0.7),
                                max_per_tile=256).color)
        for i in range(n)
    ])
    np.savez(cache, images=images, viewmats=viewmats)
    return images, viewmats, fx


def main(gt_focal=False, size=None):
    images, viewmats_gt, fx_gt = capture(size)
    n = len(viewmats_gt)
    sz = images.shape[1]
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
    kw = dict(fx=fx_gt, fy=fx_gt, cx=sz / 2, cy=sz / 2) if gt_focal else {}
    scene = run_sfm(images, cfg, log_fn=lambda s: print(s, flush=True), **kw)
    reg = np.asarray(scene.registered)
    print(f"\nregistered {reg.sum()}/{n}; "
          f"fx={float(np.asarray(scene.cameras.fx)[0]):.1f} (GT {fx_gt:.1f})")
    gt_centers = np.stack([
        -viewmats_gt[i][:3, :3].T @ viewmats_gt[i][:3, 3] for i in range(n)
    ])[reg]
    rec_centers = np.asarray(scene.cameras.camtoworlds[:, :3, 3])
    s, R, t = umeyama_alignment(jnp.asarray(rec_centers, jnp.float32),
                                jnp.asarray(gt_centers, jnp.float32))
    aligned = float(s) * rec_centers @ np.asarray(R).T + np.asarray(t)
    err = np.linalg.norm(aligned - gt_centers, axis=-1)
    ids = np.nonzero(reg)[0]
    for i, e in zip(ids, err):
        print(f"cam {i:2d}: center err {e:.3f}")
    print(f"RMSE {np.sqrt(np.mean(err ** 2)):.3f} (bound 0.8)")


if __name__ == "__main__":
    size = None
    for a in sys.argv[1:]:
        if a.startswith("--size="):
            size = int(a.split("=")[1])
    main(gt_focal="--gt-focal" in sys.argv, size=size)
