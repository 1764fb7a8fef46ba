"""Bridge from SfM output to 3DGS training — the ns-train invocation analog
(main.py:1245-1382): builds training data from an SfMScene, applies the
image-count downscale policy (>=250 images -> 1/4 resolution, >=120 -> 1/2;
main.py:1260-1263), sizes the capacity, runs the Trainer, and returns the
trained GaussianCloud + metrics."""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_splat.core.types import GaussianCloud, SfMScene
from tpu_splat.gs.params import init_params_from_points
from tpu_splat.gs.trainer import TrainConfig, Trainer


def auto_downscale_factor(n_images: int) -> int:
    if n_images >= 250:
        return 4
    if n_images >= 120:
        return 2
    return 1


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
    log_fn=None,
) -> Tuple[GaussianCloud, Dict[str, float]]:
    """Train a splat from SfM output. images must align with scene.cameras."""
    n_img = images.shape[0]
    factor = downscale_factor or auto_downscale_factor(n_img)
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

    cfg = TrainConfig.for_model(model, max_steps=max_steps)
    if checkpoint_every:
        from dataclasses import replace as _replace

        cfg = _replace(cfg, checkpoint_every=checkpoint_every)
    trainer = Trainer(
        params, imgs, viewmats, intrin, scene_scale=scene_scale, cfg=cfg,
        seed=seed, masks=masks, log_fn=log_fn,
    )
    if checkpoint_dir:
        trainer.checkpoint_dir = checkpoint_dir
        if resume:
            try:
                trainer.load_checkpoint(checkpoint_dir)
            except FileNotFoundError:
                pass
    trainer.run(max_steps - trainer.step)
    cloud = trainer.cloud()
    # camera-pose optimization refines the SfM poses; evaluate with them
    viewmats = trainer.adjusted_viewmats()
    metrics = {
        "num_gaussians": float(cloud.num_points),
        "train_steps": float(max_steps),
        "downscale_factor": float(factor),
    }
    # final PSNR on a few training views
    from tpu_splat.gs.losses import psnr
    from tpu_splat.gs.render import render_view

    vals = []
    for i in range(0, imgs.shape[0], max(imgs.shape[0] // 4, 1)):
        out = render_view(
            trainer.params["means"], trainer.params["scales"], trainer.params["quats"],
            trainer.params["opacities"], trainer.params["sh0"], trainer.params["shN"],
            jnp.asarray(viewmats[i]), *intrin[i], imgs.shape[2], imgs.shape[1],
            sh_degree=min(sh_degree, cloud.sh_degree),
            background=jnp.zeros(3), max_per_tile=cfg.max_per_tile,
            alive=trainer.params["alive"],
        )
        vals.append(float(psnr(out.color, jnp.asarray(imgs[i]))))
    metrics["psnr"] = float(np.mean(vals))
    return cloud, metrics
