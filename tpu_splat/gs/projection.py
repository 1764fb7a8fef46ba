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
    opacities: jnp.ndarray | None = None,
) -> Projected:
    """Project N gaussians through one camera (OpenCV convention, w2c viewmat 4x4).

    Written structure-of-arrays: all per-gaussian quantities are (N,) vectors and
    the tiny 3x3 algebra is unrolled into scalar expressions. On TPU, (N, 3, 3)
    tensors pad the trailing dims to the 8x128 register tile (a ~40x memory blow-
    up); the scalarized form keeps everything in dense (N,) lanes."""
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_cam = means @ R.T + t  # (N, 3): one real matmul, fine on the MXU
    x, y, z = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]
    zs = jnp.maximum(z, 1e-6)

    # Perspective with the standard tangent-plane clamp: limit x/z, y/z so the
    # EWA Jacobian stays bounded for gaussians far outside the frustum.
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = jnp.clip(x / zs, -lim_x, lim_x) * zs
    ty = jnp.clip(y / zs, -lim_y, lim_y) * zs

    # --- covariance as 6 scalar channels -----------------------------------
    # unit quaternion entries
    qn = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    # rotation matrix entries (N,)
    r = [
        1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy),
        2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx),
        2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy),
    ]
    s2 = jnp.exp(2.0 * log_scales)  # (N, 3) squared scales
    s0, s1, s2_ = s2[:, 0], s2[:, 1], s2[:, 2]

    def sig(i, j):
        # Sigma_ij = sum_k s_k^2 R_ik R_jk
        return (
            s0 * r[3 * i + 0] * r[3 * j + 0]
            + s1 * r[3 * i + 1] * r[3 * j + 1]
            + s2_ * r[3 * i + 2] * r[3 * j + 2]
        )

    S = [[sig(0, 0), sig(0, 1), sig(0, 2)],
         [None, sig(1, 1), sig(1, 2)],
         [None, None, sig(2, 2)]]
    S[1][0], S[2][0], S[2][1] = S[0][1], S[0][2], S[1][2]

    # camera-frame covariance C = W Sigma W^T with constant W = viewmat rotation
    def cam_cov(i, j):
        acc = 0.0
        for a in range(3):
            Wia = R[i, a]
            row = S[a]
            for b in range(3):
                acc = acc + Wia * row[b] * R[j, b]
        return acc

    C00, C01, C02 = cam_cov(0, 0), cam_cov(0, 1), cam_cov(0, 2)
    C11, C12, C22 = cam_cov(1, 1), cam_cov(1, 2), cam_cov(2, 2)

    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    f1 = fx * inv_z
    f2 = fy * inv_z
    j13 = -fx * tx * inv_z2
    j23 = -fy * ty * inv_z2
    # cov2d = J C J^T for J = [[f1, 0, j13], [0, f2, j23]]
    a = f1 * f1 * C00 + 2 * f1 * j13 * C02 + j13 * j13 * C22
    c = f2 * f2 * C11 + 2 * f2 * j23 * C12 + j23 * j23 * C22
    b = f1 * f2 * C01 + f1 * j23 * C02 + f2 * j13 * C12 + j13 * j23 * C22

    det_raw = a * c - b * b
    a = a + EPS2D
    c = c + EPS2D
    det = jnp.maximum(a * c - b * b, 1e-12)
    # Mip-splatting opacity compensation: sqrt(det_raw / det_blurred).
    comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / det)

    inv_det = 1.0 / det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    means2d = jnp.stack([fx * x * inv_z + cx, fy * y * inv_z + cy], axis=-1)

    # Screen radius of the major axis. With a known (post-sigmoid) opacity the
    # exact visibility cutoff alpha >= 1/255 gives k = sqrt(2 ln(255 op)) sigma
    # — smaller than the classic 3 sigma for op < 0.35, which shrinks the pair
    # set and per-tile work substantially (most of a trained scene is low-
    # opacity, and opacity resets drop everything to 0.01). Capped at 3 sigma
    # to match the classic extent for opaque gaussians.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.0))
    if opacities is not None:
        k = jnp.sqrt(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(opacities * 255.0, 1e-6)), 0.0))
        k = jnp.minimum(k, 3.0)
        visible_op = opacities * 255.0 > 1.0
    else:
        k = 3.0
        visible_op = True
    radius = jnp.ceil(k * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # Cull: behind camera, out of depth range, invisible, or fully off-screen.
    inside = (
        (z > near)
        & (z < far)
        & visible_op
        & (radius > 0)
        & (means2d[:, 0] + radius > 0)
        & (means2d[:, 0] - radius < width)
        & (means2d[:, 1] + radius > 0)
        & (means2d[:, 1] - radius < height)
    )
    radii = jnp.where(inside, radius, 0.0)
    comp = jnp.where(antialiased, comp, jnp.ones_like(comp))
    return Projected(means2d=means2d, conics=conic, depths=z, radii=radii,
                     compensations=comp)
