"""Experiment: radial (k1) self-calibration on a synthetically distorted capture.

Renders the e2e ring scene pinhole, warps every frame with a known
SIMPLE_RADIAL k1 (forward distortion: the distorted image shows, at pixel
p_d, the scene content of the ideal pixel p_u with p_d = distort(p_u)), then
runs the mapper with refine_intrinsics on and reports the recovered k1 and
camera-center RMSE vs ground truth. Decides whether the distorted-capture
variant is stable enough to become a test ratchet.

Run on the 1-core CPU box: ~6-10 min.
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
from tpu_splat.sfm.geometry import umeyama_alignment
from tpu_splat.sfm.mapper import MapperConfig, run_sfm

K1_TRUE = -0.10


def distort_images(images: np.ndarray, fx, cx, cy, k1: float) -> np.ndarray:
    """Apply forward SIMPLE_RADIAL distortion to pinhole frames by sampling
    each distorted pixel at its undistorted source location."""
    n, h, w = images.shape[:3]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    xn = (xs - cx) / fx
    yn = (ys - cy) / fx
    # invert x_d = x (1 + k1 r^2): fixed point from x = x_d
    xu, yu = xn, yn
    for _ in range(8):
        r2 = xu * xu + yu * yu
        xu = xn / (1.0 + k1 * r2)
        yu = yn / (1.0 + k1 * r2)
    sx = np.clip(xu * fx + cx, 0, w - 1.001)
    sy = np.clip(yu * fx + cy, 0, h - 1.001)
    x0, y0 = sx.astype(int), sy.astype(int)
    fxw, fyw = sx - x0, sy - y0
    out = np.empty_like(images)
    for i in range(n):
        im = images[i]
        out[i] = (
            im[y0, x0] * ((1 - fxw) * (1 - fyw))[..., None]
            + im[y0, x0 + 1] * (fxw * (1 - fyw))[..., None]
            + im[y0 + 1, x0] * ((1 - fxw) * fyw)[..., None]
            + im[y0 + 1, x0 + 1] * (fxw * fyw)[..., None]
        )
    return out


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
    print(f"max frame delta from distortion: "
          f"{np.abs(images_d - images).max():.3f}", flush=True)

    cfg = MapperConfig(
        feature=FeatureConfig(
            max_features=1024, num_octaves=3, contrast_threshold=0.006,
            upsample_first=True,
        ),
        matching_method="exhaustive",
        ratio=0.9,
        min_pair_inliers=20,
        ba_every=3,
        refine_intrinsics=True,
    )
    logs = []
    scene = run_sfm(images_d, cfg, fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                    log_fn=lambda s: (logs.append(s), print("  " + s, flush=True)))
    reg = np.asarray(scene.registered)
    k1_est = float(np.asarray(scene.cameras.distortion)[0, 0])
    print(f"registered {reg.sum()}/{n}; k1_est={k1_est:+.4f} "
          f"(true {K1_TRUE:+.4f})")

    gt_centers = np.stack([
        -viewmats[i][:3, :3].T @ viewmats[i][:3, 3] for i in range(n)
    ])[reg]
    rec_centers = np.asarray(scene.cameras.camtoworlds[:, :3, 3])
    s, R, t = umeyama_alignment(jnp.asarray(rec_centers, jnp.float32),
                                jnp.asarray(gt_centers, jnp.float32))
    aligned = float(s) * rec_centers @ np.asarray(R).T + np.asarray(t)
    rmse = np.sqrt(np.mean(np.sum((aligned - gt_centers) ** 2, axis=-1)))
    print(f"camera center RMSE: {rmse:.3f} ({100 * rmse / 4.0:.1f}% of radius)")


if __name__ == "__main__":
    main()
