"""Equirectangular <-> cubemap <-> perspective projections, pure JAX.

TPU-native replacement for the reference's spherical stack (Equirec2Cube.py's
torch grid_sample, the vendored py360convert, and 360ImageConverterforColmap's
threaded e2p tiling): every projection is one vectorized bilinear gather,
batchable with vmap and jittable.

Conventions: equirectangular images map longitude u in [-pi, pi) to x and
latitude v in [-pi/2, pi/2] to y (top = -pi/2). World frame: +z forward, +x
right, +y down (OpenCV-style), matching the rest of the pipeline.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FACE_NAMES = ("front", "right", "back", "left", "up", "down")

# Rotation matrices taking face-local viewing directions to world directions.
# Face-local: +z looks out of the face, +x right, +y down.
_FACE_ROTS = {
    "front": np.eye(3),
    "right": np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]]).T,
    "back": np.array([[-1.0, 0, 0], [0, 1, 0], [0, 0, -1]]).T,
    "left": np.array([[0, 0, -1.0], [0, 1, 0], [1, 0, 0]]).T,
    "up": np.array([[1.0, 0, 0], [0, 0, 1], [0, -1, 0]]).T,
    "down": np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]]).T,
}


def _bilinear_wrap(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample (H, W, C) with horizontal wrap (ERP) and vertical clamp."""
    h, w = img.shape[:2]
    x = jnp.mod(x, w)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.mod(x0 + 1, w)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


def dirs_to_erp_xy(dirs: jnp.ndarray, h: int, w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unit directions (..., 3) -> ERP pixel coords."""
    lon = jnp.arctan2(dirs[..., 0], dirs[..., 2])  # [-pi, pi], 0 = +z
    lat = jnp.arcsin(jnp.clip(dirs[..., 1], -1.0, 1.0))  # [-pi/2, pi/2], + = down
    x = (lon / (2 * jnp.pi) + 0.5) * w - 0.5
    y = (lat / jnp.pi + 0.5) * h - 0.5
    return x, y


def rotation_yaw_pitch(yaw_deg: float, pitch_deg: float) -> np.ndarray:
    """World rotation for a view looking yaw degrees right and pitch degrees up."""
    ya = math.radians(yaw_deg)
    pa = math.radians(pitch_deg)
    Ry = np.array(
        [[math.cos(ya), 0, math.sin(ya)], [0, 1, 0], [-math.sin(ya), 0, math.cos(ya)]]
    )
    Rx = np.array(
        [[1, 0, 0], [0, math.cos(pa), math.sin(pa)], [0, -math.sin(pa), math.cos(pa)]]
    )
    return Ry @ Rx


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "fov_deg"))
def erp_to_perspective(
    erp: jnp.ndarray,
    rot: jnp.ndarray,
    out_h: int,
    out_w: int,
    fov_deg: float = 90.0,
) -> jnp.ndarray:
    """Extract a pinhole view from an ERP image. rot (3,3): view-to-world."""
    f = 0.5 * out_w / math.tan(math.radians(fov_deg) / 2)
    xs = (jnp.arange(out_w) - (out_w - 1) / 2) / f
    ys = (jnp.arange(out_h) - (out_h - 1) / 2) / f
    xx, yy = jnp.meshgrid(xs, ys)
    local = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    local = local / jnp.linalg.norm(local, axis=-1, keepdims=True)
    world = local @ rot.T
    x, y = dirs_to_erp_xy(world, erp.shape[0], erp.shape[1])
    return _bilinear_wrap(erp, x, y)


def erp_to_cubemap(erp: jnp.ndarray, face_size: int,
                   faces: Sequence[str] = FACE_NAMES) -> jnp.ndarray:
    """ERP -> (F, face_size, face_size, C) cube faces (90-degree views)."""
    outs = []
    for name in faces:
        rot = jnp.asarray(_FACE_ROTS[name], jnp.float32)
        outs.append(erp_to_perspective(erp, rot, face_size, face_size, 90.0))
    return jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def cubemap_to_erp(faces: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(6, S, S, C) faces (FACE_NAMES order) -> ERP (h, w, C)."""
    s = faces.shape[1]
    lon = (jnp.arange(w) + 0.5) / w * 2 * jnp.pi - jnp.pi
    lat = (jnp.arange(h) + 0.5) / h * jnp.pi - jnp.pi / 2
    lon, lat = jnp.meshgrid(lon, lat)
    d = jnp.stack(
        [jnp.cos(lat) * jnp.sin(lon), jnp.sin(lat), jnp.cos(lat) * jnp.cos(lon)],
        axis=-1,
    )  # (h, w, 3)
    out = jnp.zeros((h, w, faces.shape[-1]), faces.dtype)
    best = jnp.full((h, w), -jnp.inf)
    f = (s - 1) / 2.0  # focal for 90 deg FOV at size s
    for i, name in enumerate(FACE_NAMES):
        R = jnp.asarray(_FACE_ROTS[name], jnp.float32)
        local = d @ R  # world -> face-local (R is orthonormal: v_local = R^T... R cols are local axes in world; d@R = R^T d)
        z = local[..., 2]
        u = local[..., 0] / jnp.maximum(z, 1e-9) * f + (s - 1) / 2
        v = local[..., 1] / jnp.maximum(z, 1e-9) * f + (s - 1) / 2
        valid = (z > 0) & (u >= -0.5) & (u <= s - 0.5) & (v >= -0.5) & (v <= s - 0.5)
        sample = _bilinear_wrap(faces[i], jnp.clip(u, 0, s - 1.001),
                                jnp.clip(v, 0, s - 1.001))
        better = valid & (z > best)
        out = jnp.where(better[..., None], sample, out)
        best = jnp.where(better, z, best)
    return out
