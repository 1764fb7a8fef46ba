"""Registration robustness sweep (VERDICT r4 weak #6 / next-round #6).

Sweeps view count x resolution x seed on the mesh-oracle orbit capture with
ONE FeatureConfig (the bench_mini_pipeline recipe) and reports registration,
map size, and reprojection rms for each cell. The r2-r4 folklore this
quantifies: "14 views on the 240-degree ring is stable, 12 is not; 240px
renders are WORSE than 160px — the detector config doesn't scale." A healthy
detector/matcher config should register >=90% everywhere on this table; the
cells that fail point at the scale-dependent knob.

Run on CPU (the TPU tunnel adds latency, not throughput, at these sizes):
    JAX_PLATFORMS=cpu python scripts/exp_reg_sweep.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tpu_splat.core.meshrender import make_capture_scene, orbit_w2c, render_mesh
from tpu_splat.sfm.features import FeatureConfig
from tpu_splat.sfm.mapper import MapperConfig, run_sfm


def run_cell(n_views, width, height, seed):
    fx = width * 1050.0 / 1280.0  # the fast-preset FOV at every resolution
    mesh = make_capture_scene(seed=7)
    rng = np.random.default_rng(seed)
    # seed jitters the orbit phase so each seed sees different texture
    phase = rng.uniform(0, 2 * np.pi)
    angs = phase + np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    images = np.stack([
        render_mesh(mesh, orbit_w2c(a), fx, fx, width / 2, height / 2,
                    width, height)
        for a in angs
    ]).astype(np.float32)
    cfg = MapperConfig(
        feature=FeatureConfig(max_features=1024, num_octaves=3,
                              contrast_threshold=0.006, upsample_first=True),
        matching_method="exhaustive", ratio=0.9, min_pair_inliers=20,
        ba_every=3,
    )
    t0 = time.time()
    scene = run_sfm(images, cfg, fx=fx, fy=fx, cx=width / 2, cy=height / 2)
    reg = int(np.asarray(scene.registered).sum())
    return {
        "registered": reg,
        "n_points": scene.num_points,
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one seed, three view counts")
    ap.add_argument("--views", type=int, nargs="*", default=None)
    ap.add_argument("--widths", type=int, nargs="*", default=None)
    ap.add_argument("--seeds", type=int, nargs="*", default=None)
    args = ap.parse_args()

    views = args.views or ([10, 14, 18] if args.quick else [10, 12, 14, 16, 18])
    widths = args.widths or ([160, 320] if args.quick else [160, 240, 320])
    seeds = args.seeds or ([0] if args.quick else [0, 1])

    fails = []
    for w in widths:
        h = w * 9 // 16
        for n in views:
            for s in seeds:
                r = run_cell(n, w, h, s)
                frac = r["registered"] / n
                tag = "OK " if frac >= 0.9 else "FAIL"
                print(f"{tag} {w:4d}px n={n:2d} seed={s}: "
                      f"reg {r['registered']:2d}/{n} pts {r['n_points']:5d} "
                      f"({r['wall_s']}s)", flush=True)
                if frac < 0.9:
                    fails.append((w, n, s, r))
    print(f"\n{len(fails)} failing cells")
    for w, n, s, r in fails:
        print(f"  {w}px n={n} seed={s}: {r}")


if __name__ == "__main__":
    main()
