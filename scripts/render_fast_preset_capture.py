"""Pre-render the fast-preset benchmark's GT capture (150 frames, 720p) into
the cache dir bench.py --preset fast reads. Safe to run on CPU while the TPU
is busy/unavailable — the capture is deterministic, so CPU/TPU renders serve
identically as job input.

    JAX_PLATFORMS=cpu python scripts/render_fast_preset_capture.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tests.test_sfm_e2e import make_textured_scene
    from tpu_splat.core.types import Cameras
    from tpu_splat.gs.render import render_cloud

    rng = np.random.default_rng(7)
    W, H = 1280, 720
    FX = 1050.0
    n = 150
    cloud = make_textured_scene(rng, n_gauss=12000)
    mats = []
    for ang in np.linspace(0, 2 * np.pi, n, endpoint=False):
        eye = np.array([4.0 * np.cos(ang), 0.6, 4.0 * np.sin(ang)])
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([x, y, z])
        w2c[:3, 3] = -w2c[:3, :3] @ eye
        mats.append(w2c)
    viewmats = np.stack(mats)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n,), FX), fy=jnp.full((n,), FX),
        cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        distortion=jnp.zeros((n, 4)), width=W, height=H,
    )
    img_dir = os.environ.get("FAST_PRESET_CAPTURE",
                             "/tmp/tpu_splat_fast_capture/images")
    os.makedirs(img_dir, exist_ok=True)
    existing = len(os.listdir(img_dir))
    if existing == n:
        print(f"capture already complete: {img_dir}")
        return
    for i in range(n):
        path = os.path.join(img_dir, f"frame_{i:04d}.png")
        if os.path.exists(path):
            continue
        img = np.asarray(render_cloud(cloud, cams, i,
                                      background=jnp.full(3, 0.7),
                                      max_per_tile=256).color)
        cv2.imwrite(path, (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8))
        if i % 10 == 0:
            print(f"rendered {i}/{n}", flush=True)
    print(f"done: {img_dir}")


if __name__ == "__main__":
    main()
