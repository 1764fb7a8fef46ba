"""Instrumented SfM run at fast-preset scale (150 x 720p mesh-oracle capture).

The r4 full-scale run spent 2699 s in SfM with this phase split:
  augment 1190s/7x, ba_ext 456s/12x, extract 368s/1x, match 335s/2x
(r5 batched the augment loop's per-pair dispatches — this script measures the
result and is the round's SfM wall-clock scoreboard; VERDICT r4 next-#1).

Runs SfM ONLY (no training) through the same config the fast preset uses,
prints the mapper's phase timers and writes /tmp/sfm_profile_r5.json.

    python scripts/profile_sfm_scale.py [--frames 150] [--res 720]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scripts._jaxcache  # noqa: F401  persistent compile cache

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--res", type=int, default=720, help="frame height")
    ap.add_argument("--out", default="/tmp/sfm_profile_r5.json")
    args = ap.parse_args()

    import cv2

    from scripts.render_fast_preset_capture import render_capture
    from tpu_splat.sfm.features import FeatureConfig
    from tpu_splat.sfm.mapper import MapperConfig, run_sfm

    img_dir = os.environ.get("FAST_PRESET_CAPTURE",
                             "/tmp/tpu_splat_fast_capture/images")
    render_capture(img_dir, log=lambda s: print(s, flush=True))
    idx = np.linspace(0, 149, args.frames).astype(int)
    imgs = []
    for i in idx:
        im = cv2.imread(f"{img_dir}/frame_{i:04d}.png")[..., ::-1]
        if args.res != 720:
            w = int(1280 * args.res / 720)
            im = cv2.resize(im, (w, args.res), interpolation=cv2.INTER_AREA)
        imgs.append(im.astype(np.float32) / 255.0)
    images = np.stack(imgs)
    print(f"{len(images)} frames @ {images.shape[2]}x{images.shape[1]}",
          flush=True)

    # Same MapperConfig the pipeline's _sfm stage builds for the fast preset
    # (runner.py _sfm: sequential matching, 4 octaves at >=400px).
    mcfg = MapperConfig(
        feature=FeatureConfig(max_features=4096, num_octaves=4),
        matching_method="sequential",
    )

    t0 = time.time()
    scene = run_sfm(images, mcfg, log_fn=lambda s: print(s, flush=True))
    wall = time.time() - t0
    reg = int(np.asarray(scene.registered).sum())
    out = {
        "wall_s": round(wall, 1),
        "img_per_s": round(len(images) / wall, 3),
        "registered": reg,
        "n_points": int(scene.points.shape[0]),
        "frames": len(images),
        "res": args.res,
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
