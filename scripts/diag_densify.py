"""Diagnose frozen densification on a persisted fast-preset SfM model.

Replicates train_splat's exact setup (same seeding, capacity, downscale,
eval split — gs/pipeline.py), runs past the first refine boundary, and
prints the distributions that decide densification: avg_grad percentiles vs
grad_threshold and the visibility counters. Distinguishes the r4 failure
modes: (a) tile saturation — gaussians counted visible but given zero
gradient, avg_grad diluted below threshold; (b) threshold mis-scale —
avg_grad uniformly tiny.

    python scripts/diag_densify.py [--steps 1100] [--cpu] [--downscale 4]
"""

import argparse
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import scripts._jaxcache  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sparse",
                    default="/tmp/tpu_splat_fast_run/out/colmap/sparse/0")
    ap.add_argument("--images",
                    default="/tmp/tpu_splat_fast_capture/images")
    ap.add_argument("--steps", type=int, default=1100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--downscale", type=int, default=0)
    ap.add_argument("--no-refine", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import cv2
    import numpy as np

    from scripts.run_30k_quality import load_scene
    from tpu_splat.gs.params import init_params_from_points
    from tpu_splat.gs.pipeline import (auto_downscale_factor,
                                       downscale_images, eval_split)
    from tpu_splat.gs.trainer import TrainConfig, Trainer, effective_cfg

    scene, names = load_scene(args.sparse)
    images = np.stack([
        cv2.imread(os.path.join(args.images, nm))[..., ::-1]
        for nm in names
    ]).astype(np.float32) / 255.0
    n_img = images.shape[0]
    factor = args.downscale or auto_downscale_factor(
        n_img, max_dim=max(images.shape[1], images.shape[2]))
    imgs = downscale_images(images, factor)
    cams = scene.cameras
    viewmats = np.asarray(cams.worldtocams)
    intrin = np.stack([np.asarray(cams.fx), np.asarray(cams.fy),
                       np.asarray(cams.cx), np.asarray(cams.cy)], 1) / factor
    pts = np.asarray(scene.points)
    colors = np.clip(np.asarray(scene.point_colors), 0.0, 1.0)
    scene_scale = float(np.mean(np.linalg.norm(pts - pts.mean(0), axis=1))) * 1.1
    capacity = 1 << int(math.ceil(math.log2(max(len(pts) * 16, 4096))))
    params = init_params_from_points(pts, colors, capacity=capacity)
    hold = eval_split(n_img)
    tr_idx = np.setdiff1d(np.arange(n_img), hold)
    from dataclasses import replace as _replace

    cfg = TrainConfig.for_model("splatfacto", max_steps=5000)
    if args.no_refine:
        # isolate ACCUMULATION from refine's post-use reset: never refine,
        # read the raw accumulators at the end
        cfg = _replace(cfg, densify=_replace(cfg.densify, refine_start=10 ** 9))
    print(f"factor {factor} capacity {capacity} pts {len(pts)} "
          f"scene_scale {scene_scale:.2f}")
    print(f"cfg: K={cfg.max_per_tile} warmup_K={cfg.warmup_max_per_tile} "
          f"thr={cfg.densify.grad_threshold} "
          f"refine {cfg.densify.refine_start}..{cfg.densify.refine_stop}"
          f"/{cfg.densify.refine_every}")
    print(f"effective K at step 100: "
          f"{effective_cfg(cfg, 100).max_per_tile}")

    trainer = Trainer(params, imgs[tr_idx], viewmats[tr_idx], intrin[tr_idx],
                      scene_scale=scene_scale, cfg=cfg, log_fn=print)
    trainer.run(args.steps)

    d = trainer.dstate
    alive = np.asarray(trainer.params["alive"])
    cnt = np.asarray(d.count_accum)[alive]
    avg = (np.asarray(d.grad_accum)
           / np.maximum(np.asarray(d.count_accum), 1.0))[alive]
    print(f"alive {alive.sum()}  seen>0 {(cnt > 0).mean():.1%}")
    for q in (10, 50, 90, 99):
        print(f"  avg_grad p{q}: {np.percentile(avg, q):.6f}   "
              f"count p{q}: {np.percentile(cnt, q):.1f}")
    thr = cfg.densify.grad_threshold
    print(f"  frac avg_grad > thr({thr}): {(avg > thr).mean():.2%}")
    # zero-grad-but-visible: the tile-saturation signature
    zg = (cnt > 0) & (np.asarray(d.grad_accum)[alive] == 0.0)
    print(f"  visible-but-zero-grad: {zg.mean():.2%}")


if __name__ == "__main__":
    main()
