"""Training losses for 3DGS: L1 + D-SSIM, scale regularization, alpha/background
losses (for the splatfacto-w-light analog). Matches the splatfacto/gsplat loss
surface (reference invokes these via ns-train flags, main.py:1270-1316)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Structural similarity over (H, W, C) images in [0, 1]. Returns scalar mean.

    The gaussian window is separable, so the 11x11 depthwise conv is two 11-tap
    passes (the 2-D form costs ~10x more on TPU where C=3 channels underfill the
    compute units)."""
    c1, c2 = 0.01**2, 0.03**2
    size = window_size
    x1 = np.arange(size) - size // 2
    g1 = np.exp(-(x1**2) / (2 * 1.5**2))
    g1 = (g1 / g1.sum()).astype(np.float32)
    c = img1.shape[-1]
    krow = jnp.tile(jnp.asarray(g1)[None, None, :, None], (c, 1, 1, 1))  # (C,1,k,1)
    kcol = jnp.tile(jnp.asarray(g1)[None, None, None, :], (c, 1, 1, 1))  # (C,1,1,k)

    def conv(x):
        x = x[None].transpose(0, 3, 1, 2)  # NCHW
        y = jax.lax.conv_general_dilated(x, krow, (1, 1), "SAME",
                                         feature_group_count=c)
        y = jax.lax.conv_general_dilated(y, kcol, (1, 1), "SAME",
                                         feature_group_count=c)
        return y.transpose(0, 2, 3, 1)[0]

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return jnp.mean(num / den)


def image_loss(pred: jnp.ndarray, gt: jnp.ndarray, ssim_lambda: float = 0.2) -> jnp.ndarray:
    """(1 - lambda) * L1 + lambda * (1 - SSIM), the standard 3DGS photometric loss."""
    l1 = jnp.mean(jnp.abs(pred - gt))
    return (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - ssim(pred, gt))


def scale_regularization(log_scales: jnp.ndarray, alive: jnp.ndarray,
                         max_ratio: float = 10.0) -> jnp.ndarray:
    """Penalize anisotropic gaussians: mean(max(exp(max-min log-scale ratio), r) - r).

    The splatfacto 'scale regularization' analog (use_scale_regularization).
    """
    s = jnp.exp(log_scales)
    ratio = jnp.max(s, axis=-1) / jnp.maximum(jnp.min(s, axis=-1), 1e-8)
    pen = jnp.maximum(ratio, max_ratio) - max_ratio
    denom = jnp.maximum(jnp.sum(alive), 1.0)
    return jnp.sum(jnp.where(alive, pen, 0.0)) / denom


def opacity_entropy_loss(opacity_logits: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Pushes opacities toward 0/1 (used by the -w-light variant's alpha loss)."""
    a = jax.nn.sigmoid(opacity_logits)
    ent = -(a * jnp.log(a + 1e-8) + (1 - a) * jnp.log(1 - a + 1e-8))
    denom = jnp.maximum(jnp.sum(alive), 1.0)
    return jnp.sum(jnp.where(alive, ent, 0.0)) / denom


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
