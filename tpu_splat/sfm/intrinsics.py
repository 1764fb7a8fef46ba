"""Per-camera intrinsics refinement against a converged map.

COLMAP's mapper/triangulator refine focal length and principal point per
camera (`refine_intrinsics`, reference main.py:1090-1113; COLMAP's
ba_refine_focal_length/ba_refine_principal_point). The mapper here models one
SHARED focal during reconstruction (the single-camera capture regime,
ImageReader.single_camera=1 in the reference) — this module adds the missing
per-camera polish as a POST step: with poses and points FIXED at their
converged values, each camera's focal scale and principal-point shift is an
independent 3-parameter weighted least squares over its own observations,
solved in closed form for every camera at once (segment sums + a vmapped 3x3
solve), with a couple of IRLS Huber rounds for robustness.

Model per observation o of camera c (normalized image coordinates):
    obs_o  ~=  s_c * proj_o + d_c          (s_c ~ f'_c / f_c,  d_c = pp shift)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpu_splat.sfm.ba import BAProblem


def refine_intrinsics_per_camera(
    problem: BAProblem,
    iters: int = 3,
    huber_delta: float = 0.01,
    max_focal_step: float = 0.15,
    max_pp_shift: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (focal_scale (C,), pp_shift (C, 2), rms_after).

    focal_scale multiplies each camera's fx/fy; pp_shift is in NORMALIZED
    units (multiply by fx to get pixels, add to cx/cy). Cameras with too few
    observations (<12) keep identity — a 3-parameter fit on a handful of
    points is noise. Steps are trust-clamped: |log s| <= max_focal_step,
    |shift| <= max_pp_shift (a post-polish must never overrule the map)."""
    C = problem.cam_rotmats.shape[0]
    Rc = problem.cam_rotmats[problem.obs_cam]
    tc = problem.cam_trans[problem.obs_cam]
    Xp = problem.points[problem.obs_pt]
    pc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc
    z = jnp.maximum(pc[:, 2], 1e-6)
    proj = pc[:, :2] / z[:, None]  # (O, 2) ideal normalized projections
    valid = problem.obs_valid & (pc[:, 2] > 1e-6)
    obs = problem.obs_uv
    cam = problem.obs_cam

    s = jnp.ones((C,))
    d = jnp.zeros((C, 2))

    def seg(x):
        return jax.ops.segment_sum(x, cam, num_segments=C)

    for _ in range(iters):
        model = proj * s[cam][:, None] + d[cam]
        r = jnp.linalg.norm(model - obs, axis=-1)
        w = jnp.where(r <= huber_delta, 1.0,
                      huber_delta / jnp.maximum(r, 1e-12))
        w = w * valid.astype(jnp.float32)
        # 3x3 normal equations per camera for (s, dx, dy); both residual rows
        # share s, principal axes are independent
        px, py = proj[:, 0], proj[:, 1]
        ux, uy = obs[:, 0], obs[:, 1]
        A = jnp.stack([
            jnp.stack([seg(w * (px * px + py * py)), seg(w * px), seg(w * py)], -1),
            jnp.stack([seg(w * px), seg(w), jnp.zeros((C,))], -1),
            jnp.stack([seg(w * py), jnp.zeros((C,)), seg(w)], -1),
        ], axis=-2)  # (C, 3, 3)
        b = jnp.stack([
            seg(w * (px * ux + py * uy)), seg(w * ux), seg(w * uy)
        ], axis=-1)  # (C, 3)
        n_obs = seg(valid.astype(jnp.float32))
        A = A + 1e-9 * jnp.eye(3)
        sol = jax.vmap(jnp.linalg.solve)(A, b)  # (C, 3)
        ok = n_obs >= 12
        s_new = jnp.clip(sol[:, 0], jnp.exp(-max_focal_step),
                         jnp.exp(max_focal_step))
        d_new = jnp.clip(sol[:, 1:3], -max_pp_shift, max_pp_shift)
        s = jnp.where(ok, s_new, s)
        d = jnp.where(ok[:, None], d_new, d)

    model = proj * s[cam][:, None] + d[cam]
    r2 = jnp.sum((model - obs) ** 2, axis=-1) * valid
    rms = jnp.sqrt(jnp.sum(r2) / jnp.maximum(jnp.sum(valid), 1))
    return s, d, rms
