"""The 30K-iteration PSNR number (VERDICT r4 #3): full-schedule training with
complete densification on the mesh-oracle fast-preset capture, evaluated on
held-out views against the external mesh renderer's GT.

Reuses the SfM model persisted by `bench.py --preset fast`
(/tmp/tpu_splat_fast_run/out/colmap/sparse/0) so the 30K run measures
training quality, not SfM again; reference quality gates live at
main.py:2031-2087 and the BASELINE parity axis is "PSNR within 0.2 dB of
splatfacto at 30K iters".

    timeout 5400 python scripts/run_30k_quality.py [--steps 30000]

Writes QUALITY_30K.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scripts._jaxcache  # noqa: F401  (persistent compile cache)


def load_scene(sparse_dir):
    import jax.numpy as jnp

    from tpu_splat.core.types import Cameras, SfMScene
    from tpu_splat.sfm.colmap_io import qvec_to_rotmat, read_colmap_model

    cams, images, pts, cols = read_colmap_model(sparse_dir)
    names = sorted(images.keys())
    c2ws, fx, fy, cx, cy = [], [], [], [], []
    for nm in names:
        rec = images[nm]
        R = qvec_to_rotmat(rec["qvec"])  # w2c rotation
        t = rec["tvec"]
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        c2ws.append(c2w)
        cam = cams[rec["camera_id"]]
        p = cam["params"]
        if cam["model"] == "PINHOLE":
            fx.append(p[0]); fy.append(p[1]); cx.append(p[2]); cy.append(p[3])
        else:  # SIMPLE_PINHOLE / SIMPLE_RADIAL
            fx.append(p[0]); fy.append(p[0]); cx.append(p[1]); cy.append(p[2])
    cam0 = cams[next(iter(cams))]
    scene = SfMScene(
        cameras=Cameras(
            camtoworlds=jnp.asarray(np.stack(c2ws), jnp.float32),
            fx=jnp.asarray(fx, jnp.float32), fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32), cy=jnp.asarray(cy, jnp.float32),
            distortion=jnp.zeros((len(names), 4), jnp.float32),
            width=int(cam0["width"]), height=int(cam0["height"]),
        ),
        points=jnp.asarray(pts, jnp.float32),
        point_colors=jnp.asarray(cols / 255.0, jnp.float32),
        point_errors=jnp.zeros((len(pts),), jnp.float32),
        track_counts=jnp.ones((len(pts),), jnp.float32),
        registered=jnp.ones((len(names),), bool),
    )
    return scene, names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--sparse", default="/tmp/tpu_splat_fast_run/out/colmap/sparse/0")
    ap.add_argument("--images", default="/tmp/tpu_splat_fast_capture/images")
    args = ap.parse_args()

    import cv2

    from tpu_splat.gs.pipeline import train_splat

    scene, names = load_scene(args.sparse)
    print(f"scene: {len(names)} cameras, {scene.num_points} points", flush=True)
    imgs = np.stack([
        cv2.imread(os.path.join(args.images, nm))[..., ::-1]
        for nm in names
    ]).astype(np.float32) / 255.0

    t0 = time.time()
    cloud, metrics = train_splat(
        scene, imgs, max_steps=args.steps,
        log_fn=lambda s: print(f"  [{time.time() - t0:7.1f}s] {s}", flush=True),
    )
    wall = time.time() - t0
    out = {
        "steps": args.steps,
        "train_wall_s": round(wall, 1),
        "it_s": round(args.steps / wall, 2),
        "psnr_heldout": round(metrics["psnr"], 2),
        "eval_views": int(metrics["eval_views"]),
        "num_gaussians": int(metrics["num_gaussians"]),
        "downscale_factor": int(metrics["downscale_factor"]),
        "n_frames": len(names),
        "gt": "mesh-oracle capture (core/meshrender.py), held-out views",
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "QUALITY_30K.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
