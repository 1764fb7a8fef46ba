"""Real spherical harmonics: basis evaluation (degrees 0..3) and color decoding.

Replaces the CUDA SH kernels the reference delegates to (gsplat/nerfstudio). The
basis uses the standard real-SH constants in the 3DGS ordering: for degree d, the
coefficients are ordered m = -d..d, matching the INRIA/gsplat layout so exported
.ply/.spz files render identically in external viewers.
"""

from __future__ import annotations

import jax.numpy as jnp

# Degree-0 normalization (1/(2 sqrt(pi))).
SH_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    dirs: (..., 3) unit vectors. Returns (..., (degree+1)^2) basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, SH_C0, dtype=dirs.dtype)]
    if degree >= 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def sh_to_color(sh0: jnp.ndarray, shN: jnp.ndarray, dirs: jnp.ndarray,
                degree: int) -> jnp.ndarray:
    """Decode SH coefficients to RGB at the given view directions.

    sh0: (N, 3) DC coefficients; shN: (N, K, 3) rest (K >= (degree+1)^2 - 1);
    dirs: (N, 3) unit view directions. Returns (N, 3) colors (0.5 offset applied,
    clipped to >= 0 as in the 3DGS renderer).
    """
    basis = eval_sh_basis(degree, dirs)  # (N, B)
    color = sh0 * basis[..., :1]
    b = basis.shape[-1] - 1
    if b > 0:
        color = color + jnp.einsum("nk,nkc->nc", basis[..., 1:], shN[:, :b, :])
    return jnp.maximum(color + 0.5, 0.0)
