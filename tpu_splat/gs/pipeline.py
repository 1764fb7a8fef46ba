"""Bridge from SfM output to 3DGS training — the ns-train invocation analog
(main.py:1245-1382): builds training data from an SfMScene, applies the
image-count downscale policy (>=250 images -> 1/4 resolution, >=120 -> 1/2;
main.py:1260-1263), sizes the capacity, runs the Trainer (single-chip, or the
mesh DistributedTrainer — the gsplat multi-GPU analog, main.py:1317-1347), and
returns the trained GaussianCloud + metrics with held-out PSNR."""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_splat.core.types import GaussianCloud, SfMScene
from tpu_splat.gs.params import init_params_from_points
from tpu_splat.gs.trainer import TrainConfig, Trainer

MAX_TRAIN_DIM = 1600  # nerfstudio-style training resolution cap
EVAL_HOLD = 8  # hold out every 8th view for PSNR when the capture is big enough


def auto_downscale_factor(n_images: int, max_dim: int = 0) -> int:
    """Image-count policy (main.py:1260-1263) plus a resolution cap: training
    above ~1600px costs quadratic rasterizer work for no fidelity gain (the
    reference's nerfstudio dataparser applies the same cap), and keeps the tile
    count within the binning key's 16-bit range."""
    factor = 4 if n_images >= 250 else 2 if n_images >= 120 else 1
    while max_dim and max_dim / factor > MAX_TRAIN_DIM:
        factor *= 2
    return factor


def downscale_images(images: np.ndarray, factor: int) -> np.ndarray:
    if factor <= 1:
        return images
    import cv2

    out = []
    h, w = images.shape[1:3]
    for img in images:
        out.append(
            cv2.resize(img, (w // factor, h // factor), interpolation=cv2.INTER_AREA)
        )
    return np.stack(out)


def eval_split(n_images: int) -> np.ndarray:
    """Held-out view indices: every EVAL_HOLD-th view when the capture is large
    enough to spare them (nerfstudio eval-split semantics); empty otherwise."""
    if n_images >= 2 * EVAL_HOLD:
        return np.arange(0, n_images, EVAL_HOLD)
    return np.empty(0, np.int64)


def _psnr_over_views(params, viewmats, intrin, imgs, idx, sh_degree, cfg) -> float:
    from tpu_splat.gs.losses import psnr
    from tpu_splat.gs.render import render_view

    vals = []
    for i in idx:
        out = render_view(
            params["means"], params["scales"], params["quats"],
            params["opacities"], params["sh0"], params["shN"],
            jnp.asarray(viewmats[i]), *intrin[i], imgs.shape[2], imgs.shape[1],
            sh_degree=sh_degree, background=jnp.zeros(3),
            max_per_tile=cfg.max_per_tile, alive=params["alive"],
        )
        vals.append(float(psnr(out.color, jnp.asarray(imgs[i]))))
    return float(np.mean(vals))


def train_splat(
    scene: SfMScene,
    images: np.ndarray,
    model: str = "splatfacto",
    max_steps: int = 30000,
    downscale_factor: int = 0,
    masks: Optional[np.ndarray] = None,
    sh_degree: int = 3,
    seed: int = 0,
    checkpoint_dir: Optional[str] = None,
    resume: bool = False,
    checkpoint_every: int = 0,
    distributed: bool = False,
    log_fn=None,
) -> Tuple[GaussianCloud, Dict[str, float]]:
    """Train a splat from SfM output. images must align with scene.cameras."""
    n_img = images.shape[0]
    factor = downscale_factor or auto_downscale_factor(
        n_img, max_dim=max(images.shape[1], images.shape[2])
    )
    imgs = downscale_images(images.astype(np.float32), factor)
    if masks is not None and factor > 1:
        masks = downscale_images(masks.astype(np.float32), factor)

    cams = scene.cameras
    viewmats = np.asarray(cams.worldtocams)
    intrin = np.stack(
        [np.asarray(cams.fx), np.asarray(cams.fy), np.asarray(cams.cx),
         np.asarray(cams.cy)], axis=1,
    ) / float(factor)

    pts = np.asarray(scene.points)
    colors = np.clip(np.asarray(scene.point_colors), 0.0, 1.0)
    scene_scale = float(np.mean(np.linalg.norm(pts - pts.mean(0), axis=1))) * 1.1

    # Capacity: room to densify ~16x from the sparse init, power-of-two sized.
    capacity = 1 << int(math.ceil(math.log2(max(len(pts) * 16, 4096))))
    params = init_params_from_points(pts, colors, capacity=capacity,
                                     sh_degree=sh_degree)

    # Held-out eval split: train on the rest, report PSNR on unseen views.
    hold = eval_split(n_img)
    train_idx = np.setdiff1d(np.arange(n_img), hold)
    t_imgs = imgs[train_idx]
    t_masks = masks[train_idx] if masks is not None else None
    t_viewmats = viewmats[train_idx]
    t_intrin = intrin[train_idx]

    cfg = TrainConfig.for_model(model, max_steps=max_steps)
    if checkpoint_every:
        from dataclasses import replace as _replace

        cfg = _replace(cfg, checkpoint_every=checkpoint_every)

    if distributed:
        from tpu_splat.gs.trainer import scale_schedule
        from tpu_splat.mesh.trainer import DistributedTrainer

        trainer = DistributedTrainer(
            params, t_imgs, t_viewmats, t_intrin, scene_scale=scene_scale,
            cfg=cfg, seed=seed, masks=t_masks, log_fn=log_fn,
        )
        # gsplat steps_scaler semantics (main.py:1322-1338): each distributed
        # step consumes `batch` views, so the step count AND every step-indexed
        # milestone (SH ramp, densify window, opacity resets) shrink together.
        trainer.cfg = scale_schedule(cfg, trainer.batch)
        steps = trainer.cfg.max_steps
        if checkpoint_dir:
            trainer.checkpoint_dir = checkpoint_dir
            if resume:
                try:
                    trainer.load_checkpoint(checkpoint_dir)
                except FileNotFoundError:
                    pass
                except Exception as e:
                    if log_fn:
                        log_fn(f"checkpoint restore failed ({e}); "
                               f"training from scratch")
        trainer.run(steps - trainer.step)
        eval_viewmats = viewmats.copy()
        eval_viewmats[train_idx] = trainer.adjusted_viewmats()
        eval_params = trainer.host_params()
    else:
        trainer = Trainer(
            params, t_imgs, t_viewmats, t_intrin, scene_scale=scene_scale,
            cfg=cfg, seed=seed, masks=t_masks, log_fn=log_fn,
        )
        if checkpoint_dir:
            trainer.checkpoint_dir = checkpoint_dir
            if resume:
                try:
                    trainer.load_checkpoint(checkpoint_dir)
                except FileNotFoundError:
                    pass
                except Exception as e:  # incompatible checkpoint: restart fresh
                    if log_fn:
                        log_fn(f"checkpoint restore failed ({e}); "
                               f"training from scratch")
        trainer.run(max_steps - trainer.step)
        # camera-pose optimization refines the SfM poses; evaluate train views
        # with them (held-out views keep their SfM poses)
        eval_viewmats = viewmats.copy()
        eval_viewmats[train_idx] = trainer.adjusted_viewmats()
        eval_params = trainer.params

    cloud = trainer.cloud()
    metrics = {
        "num_gaussians": float(cloud.num_points),
        "train_steps": float(max_steps),
        "downscale_factor": float(factor),
    }
    deg = min(sh_degree, cloud.sh_degree)
    if len(hold):
        metrics["psnr"] = _psnr_over_views(
            eval_params, eval_viewmats, intrin, imgs, hold, deg, cfg
        )
        metrics["eval_views"] = float(len(hold))
    else:  # capture too small for a held-out split: report train-view PSNR
        idx = range(0, len(train_idx), max(len(train_idx) // 4, 1))
        metrics["psnr"] = _psnr_over_views(
            eval_params, eval_viewmats, intrin, imgs,
            [train_idx[i] for i in idx], deg, cfg,
        )
        metrics["eval_views"] = 0.0
    return cloud, metrics
