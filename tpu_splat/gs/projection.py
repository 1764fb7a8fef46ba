"""EWA projection of 3D gaussians to screen space.

TPU-native replacement for the CUDA projection kernels (gsplat fully_fused_projection
/ the INRIA rasterizer preprocess). Everything is batched dense linear algebra —
quaternion->rotation, covariance assembly, perspective Jacobian — which XLA maps
straight onto the MXU/VPU; no per-gaussian scalar loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# Low-pass filter added to the 2D covariance diagonal (screen-space dilation),
# the standard 0.3px of the 3DGS rasterizer.
EPS2D = 0.3


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities for one camera."""

    means2d: jnp.ndarray  # (N, 2) pixel coordinates
    conics: jnp.ndarray  # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    depths: jnp.ndarray  # (N,) camera-space z
    radii: jnp.ndarray  # (N,) screen-space extent in pixels (0 = culled)
    compensations: jnp.ndarray  # (N,) AA opacity scaling (1.0 when not antialiased)


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) wxyz quaternions (not necessarily unit) -> (N, 3, 3) rotations."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(q.shape[:-1] + (3, 3))


def covariance_3d(log_scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T with S = diag(exp(log_scales)). Returns (N, 3, 3)."""
    R = quat_to_rotmat(quats)
    S = jnp.exp(log_scales)
    M = R * S[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    viewmat: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    near: float = 0.01,
    far: float = 1e10,
    antialiased: bool = False,
) -> Projected:
    """Project N gaussians through one camera (OpenCV convention, w2c viewmat 4x4)."""
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t  # (N, 3)
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    zs = jnp.maximum(z, 1e-6)

    # Perspective with the standard tangent-plane clamp: limit x/z, y/z so the
    # EWA Jacobian stays bounded for gaussians far outside the frustum.
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = jnp.clip(x / zs, -lim_x, lim_x) * zs
    ty = jnp.clip(y / zs, -lim_y, lim_y) * zs

    cov3d = covariance_3d(log_scales, quats)  # (N, 3, 3)
    cov_cam = jnp.einsum("ij,njk,lk->nil", R, cov3d, R)

    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    # J: (N, 2, 3) Jacobian of (fx X/Z + cx, fy Y/Z + cy).
    zeros = jnp.zeros_like(zs)
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, cov_cam, J)  # (N, 2, 2)

    det_raw = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    cov2d = cov2d.at[:, 0, 0].add(EPS2D).at[:, 1, 1].add(EPS2D)
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    det = jnp.maximum(det, 1e-12)
    # Mip-splatting opacity compensation: sqrt(det_raw / det_blurred).
    comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / det)

    inv_det = 1.0 / det
    conic = jnp.stack(
        [cov2d[:, 1, 1] * inv_det, -cov2d[:, 0, 1] * inv_det, cov2d[:, 0, 0] * inv_det],
        axis=-1,
    )

    means2d = jnp.stack([fx * x * inv_z + cx, fy * y * inv_z + cy], axis=-1)

    # Screen radius: 3 sigma of the major axis.
    mid = 0.5 * (cov2d[:, 0, 0] + cov2d[:, 1, 1])
    lambda1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Cull: behind camera, out of depth range, or fully off-screen.
    inside = (
        (z > near)
        & (z < far)
        & (means2d[:, 0] + radius > 0)
        & (means2d[:, 0] - radius < width)
        & (means2d[:, 1] + radius > 0)
        & (means2d[:, 1] - radius < height)
    )
    radii = jnp.where(inside, radius, 0.0)
    comp = jnp.where(antialiased, comp, jnp.ones_like(comp))
    return Projected(means2d=means2d, conics=conic, depths=z, radii=radii,
                     compensations=comp)
