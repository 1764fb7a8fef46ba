"""Image undistortion: SIMPLE_RADIAL / OPENCV -> pinhole.

The colmap image_undistorter replacement (invoked at main.py:1161-1180 for the
multi-GPU and 3DGRUT paths). Pure-JAX remap: for each output (pinhole) pixel,
apply the forward distortion model to find its source location in the distorted
image and sample bilinearly — one vectorized gather, batchable over frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def distort_normalized(xn: jnp.ndarray, yn: jnp.ndarray, k1: float, k2: float = 0.0,
                       p1: float = 0.0, p2: float = 0.0):
    """Forward OPENCV distortion of normalized coords (k1, k2 radial; p1, p2
    tangential). SIMPLE_RADIAL is the k1-only special case."""
    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    return xd, yd


@functools.partial(jax.jit, static_argnames=("width", "height"))
def undistort_image(
    image: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    k1: float,
    k2: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
    width: int = 0,
    height: int = 0,
) -> jnp.ndarray:
    """(H, W, C) distorted image -> undistorted pinhole image of the same size
    and intrinsics."""
    h, w = image.shape[:2]
    width = width or w
    height = height or h
    ys = (jnp.arange(height) - cy) / fy
    xs = (jnp.arange(width) - cx) / fx
    xn, yn = jnp.meshgrid(xs, ys)
    xd, yd = distort_normalized(xn, yn, k1, k2, p1, p2)
    sx = xd * fx + cx
    sy = yd * fy + cy

    sx = jnp.clip(sx, 0.0, w - 1.001)
    sy = jnp.clip(sy, 0.0, h - 1.001)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fxp = (sx - x0)[..., None]
    fyp = (sy - y0)[..., None]
    out = (
        image[y0, x0] * (1 - fxp) * (1 - fyp)
        + image[y0, x0 + 1] * fxp * (1 - fyp)
        + image[y0 + 1, x0] * (1 - fxp) * fyp
        + image[y0 + 1, x0 + 1] * fxp * fyp
    )
    return out


def undistort_points(
    points2d: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    k1: float,
    k2: float = 0.0,
    p1: float = 0.0,
    p2: float = 0.0,
    iters: int = 8,
) -> np.ndarray:
    """Inverse distortion of pixel coordinates (fixed-point iteration: the
    standard undistortPoints scheme). Returns pinhole pixel coords."""
    xn = (points2d[:, 0] - cx) / fx
    yn = (points2d[:, 1] - cy) / fy
    xu, yu = xn.copy(), yn.copy()
    for _ in range(iters):
        xd, yd = distort_normalized(xu, yu, k1, k2, p1, p2)
        xu = xu - (np.asarray(xd) - xn)
        yu = yu - (np.asarray(yd) - yn)
    return np.stack([xu * fx + cx, yu * fy + cy], axis=1)


def undistort_batch(images: np.ndarray, fx, fy, cx, cy, k1, k2=0.0, p1=0.0,
                    p2=0.0) -> np.ndarray:
    out = []
    for img in images:
        out.append(np.asarray(undistort_image(
            jnp.asarray(img), fx, fy, cx, cy, k1, k2, p1, p2
        )))
    return np.stack(out)
