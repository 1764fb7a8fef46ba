"""Experiment: k1 self-calibration RECOVERY on a border-rich mesh capture.

The r3 gaussian-rendered e2e scenes never exercised the accepting direction of
the endgame k1 multistart: at their narrow FOV the injected distortion was
absorbable into geometry, the control trial tied, and pinhole was (correctly)
kept. VERDICT r4 #8 asks for a capture where k1 is NOT absorbable: wide FOV,
textured structure reaching into the frame corners (where r^2 — and therefore
the k1 signal — is large), rendered by the external mesh oracle.

This script renders that capture, warps it with a known SIMPLE_RADIAL k1,
runs the full mapper with intrinsics refinement, and prints the recovered k1
+ pose RMSE so the accept gate can be tuned before the result is frozen into
a test (tests/test_sfm_e2e.py::test_k1_recovery_on_wide_fov_capture).

Run on the 1-core CPU box: ~10-15 min.

    JAX_PLATFORMS=cpu python scripts/exp_k1_mesh.py [--k1 -0.15] [--fx 170]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from scripts.exp_distort_selfcal import distort_images
from tpu_splat.core.meshrender import make_capture_scene, orbit_w2c, render_mesh
from tpu_splat.sfm.features import FeatureConfig
from tpu_splat.sfm.geometry import umeyama_alignment
from tpu_splat.sfm.mapper import MapperConfig, run_sfm


def render_wide_capture(n_views=14, width=320, height=240, fx=220.0,
                        radius=3.4, seed=7):
    """Wide-FOV orbit INSIDE the walled capture scene: corners of every frame
    see textured walls/ground at large normalized radius."""
    mesh = make_capture_scene(seed=seed)
    mats = np.stack([orbit_w2c(a, radius=radius, height=-0.5)
                     for a in np.linspace(0, 4 * np.pi / 3, n_views)])
    imgs = np.stack([
        render_mesh(mesh, m, fx, fx, width / 2, height / 2, width, height)
        for m in mats
    ])
    return imgs.astype(np.float32), mats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=float, default=-0.15)
    # fx floor: x_d = x_u (1 + k1 x_u^2) folds at r_u = 1/sqrt(3|k1|)
    # (r_d_max ~ 0.99 for k1=-0.15) — the frame corner's distorted radius
    # must stay below it or the warp is non-invertible there. fx=220 puts
    # the 320x240 corner at r_d = 0.91 (~36 px of corner shift, hfov 72deg).
    ap.add_argument("--fx", type=float, default=220.0)
    ap.add_argument("--views", type=int, default=14)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=240)
    args = ap.parse_args()

    W, H, FX = args.width, args.height, args.fx
    r2_corner = ((W / 2) ** 2 + (H / 2) ** 2) / FX ** 2
    print(f"corner r^2 = {r2_corner:.2f}; corner shift = "
          f"{abs(args.k1) * r2_corner * 100:.1f}% of radius "
          f"(~{abs(args.k1) * r2_corner * np.hypot(W / 2, H / 2):.1f} px)")

    print("rendering...", flush=True)
    images, gt_w2c = render_wide_capture(args.views, W, H, FX)
    # --k1 0 is the CONTROL direction: undistorted input, pinhole must win
    images_d = (images if args.k1 == 0.0
                else distort_images(images, FX, W / 2, H / 2, args.k1))

    cfg = MapperConfig(
        matching_method="exhaustive",
        refine_intrinsics=True,
    )
    logs = []

    def log(s):
        logs.append(s)
        print(f"  [sfm] {s}", flush=True)

    scene = run_sfm(images_d, cfg, fx=FX, fy=FX, log_fn=log)
    k1_rec = float(scene.cameras.distortion[0, 0])
    fx_rec = float(scene.cameras.fx[0])
    n_reg = int(np.asarray(scene.registered).sum())
    print(f"\nregistered {n_reg}/{args.views}")
    err = (f"err {abs(k1_rec - args.k1) / abs(args.k1) * 100:.0f}%"
           if args.k1 else "control: must stay 0")
    print(f"recovered k1 = {k1_rec:+.4f}  (true {args.k1:+.4f}, {err})")
    print(f"recovered fx = {fx_rec:.1f}  (true {FX:.1f})")

    # pose accuracy vs GT (similarity-aligned camera centers)
    reg = np.asarray(scene.registered).astype(bool)
    c2w = np.asarray(scene.cameras.camtoworlds)
    centers = c2w[:, :3, 3]
    gt_centers = np.stack([-m[:3, :3].T @ m[:3, 3] for m in gt_w2c])[reg]
    s, R, t = umeyama_alignment(jnp.asarray(centers), jnp.asarray(gt_centers))
    aligned = float(s) * centers @ np.asarray(R).T + np.asarray(t)
    rmse = float(np.sqrt(((aligned - gt_centers) ** 2).sum(1).mean()))
    span = float(np.linalg.norm(gt_centers.max(0) - gt_centers.min(0)))
    print(f"center RMSE {rmse:.4f} ({rmse / span * 100:.2f}% of span)")


if __name__ == "__main__":
    main()
