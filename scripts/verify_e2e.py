"""End-to-end verification drive: generate a tiny synthetic capture on disk,
run a full reconstruction job through the public CLI (`tpu-splat run`), and
assert the delivered artifacts exist and decode.

Usage: python scripts/verify_e2e.py [--steps N] [--keep]
Runs on CPU in a temp dir; ~2-4 min. This is the /verify harness — it drives
the same surface a user touches (job JSON -> runner -> SfM -> training ->
.ply/.spz delivery), not internals.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_capture(out_dir: str, n_views: int = 14, size: int = 160) -> str:
    """Render the test suite's textured synthetic scene from a camera ring and
    write the frames as PNGs. Returns the image dir."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import cv2

    from tests.test_sfm_e2e import make_textured_scene, ring_cameras
    from tpu_splat.core.types import Cameras
    from tpu_splat.gs.render import render_cloud

    rng = np.random.default_rng(11)
    cloud = make_textured_scene(rng)
    viewmats = ring_cameras(n_views=n_views)
    fx = size * 0.875
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n_views,), fx), fy=jnp.full((n_views,), fx),
        cx=jnp.full((n_views,), size / 2), cy=jnp.full((n_views,), size / 2),
        distortion=jnp.zeros((n_views, 4)), width=size, height=size,
    )
    img_dir = os.path.join(out_dir, "frames")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_views):
        out = render_cloud(cloud, cams, i, background=jnp.full((3,), 0.7),
                           max_per_tile=256)
        img = np.clip(np.asarray(out.color), 0, 1)
        cv2.imwrite(os.path.join(img_dir, f"frame_{i:04d}.png"),
                    (img[..., ::-1] * 255).astype(np.uint8))
    return img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="tpu_splat_verify_")
    try:
        img_dir = make_capture(work)
        out_dir = os.path.join(work, "out")
        job = {
            "uuid": "verify-e2e",
            "inputPath": img_dir,
            "outputPath": out_dir,
            "sfm": {"enable": True, "matchingMethod": "exhaustive"},
            "training": {"enable": True, "maxSteps": args.steps,
                         "model": "splatfacto"},
            "imageProcessing": {"filterBlurryImages": False},
        }
        job_path = os.path.join(work, "job.json")
        with open(job_path, "w") as f:
            json.dump(job, f)

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "tpu_splat.cli.main", "run", job_path],
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=1200,
        )
        sys.stdout.write(r.stdout[-3000:])
        sys.stderr.write(r.stderr[-3000:])
        assert r.returncode == 0, f"CLI run failed rc={r.returncode}"

        exports = os.path.join(out_dir, "workflow-output", "verify-e2e")
        ply = os.path.join(exports, "splat.ply")
        spz = os.path.join(exports, "splat.spz")
        assert os.path.exists(ply), f"missing {ply}"
        assert os.path.exists(spz), f"missing {spz}"
        from tpu_splat.core.ply import load_ply
        from tpu_splat.core.spz import load_spz

        cloud = load_ply(ply)
        assert cloud.num_points > 100, f"only {cloud.num_points} points in ply"
        cloud2 = load_spz(spz)
        assert cloud2.num_points > 100
        store = os.path.join(out_dir, "jobs", "verify-e2e.json")
        with open(store) as f:
            rec = json.load(f)
        assert rec["status"] == "Complete", rec
        print(f"VERIFY OK: {cloud.num_points} gaussians, "
              f"psnr={rec['metrics'].get('psnr', 0):.2f}, artifacts delivered")
    finally:
        if args.keep:
            print(f"kept: {work}")
        else:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
