"""Pre-render the fast-preset benchmark's GT capture (150 frames, 720p) into
the cache dir bench.py --preset fast reads.

The capture is rendered by the CPU textured-MESH renderer
(tpu_splat/core/meshrender.py), NOT the repo's gaussian rasterizer — so the
fast preset's held-out PSNR is measured against an external oracle and cannot
hide a systematic rasterizer error (VERDICT r3 weak #3). Deterministic: the
same seed always produces byte-identical frames, safe to (re)run on CPU while
the TPU is busy.

    python scripts/render_fast_preset_capture.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Capture parameters shared with bench.bench_fast_preset (import from here).
W, H = 1280, 720
FX = 1050.0
N_FRAMES = 150


def render_capture(img_dir: str, n: int = N_FRAMES, width: int = W,
                   height: int = H, fx: float = FX,
                   log=lambda s: None) -> None:
    import cv2

    from tpu_splat.core.meshrender import (
        make_capture_scene, orbit_w2c, render_mesh)

    os.makedirs(img_dir, exist_ok=True)
    mesh = make_capture_scene(seed=7)
    for i, ang in enumerate(np.linspace(0, 2 * np.pi, n, endpoint=False)):
        path = os.path.join(img_dir, f"frame_{i:04d}.png")
        if os.path.exists(path):
            continue
        img = render_mesh(mesh, orbit_w2c(ang), fx, fx,
                          width / 2, height / 2, width, height)
        cv2.imwrite(path, (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8))
        if i % 10 == 0:
            log(f"rendered {i}/{n}")


def main():
    img_dir = os.environ.get("FAST_PRESET_CAPTURE",
                             "/tmp/tpu_splat_fast_capture/images")
    t0 = time.time()
    render_capture(img_dir, log=lambda s: print(s, flush=True))
    print(f"done in {time.time() - t0:.0f}s: {img_dir}")


if __name__ == "__main__":
    main()
