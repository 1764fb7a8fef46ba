"""Bundle adjustment: matrix-free Levenberg-Marquardt with CG on the Gauss-Newton
normal equations.

Replaces COLMAP/GLOMAP's ceres-based BA (invoked via `colmap mapper`,
main.py:1114-1154). Instead of sparse Schur factorization (which maps poorly to
the TPU's dense units), the normal equations are solved matrix-free: Hv = J^T(Jv)
is computed with one jvp + one vjp through the vmapped residual function, so the
whole solver is dense batched math over the observation arrays. A Jacobi (block-
diagonal) preconditioner is assembled from per-observation Jacobian diagonals via
segment sums. Robustness via IRLS Huber weights recomputed each outer iteration.

Observations are static-shape: (O,) index arrays + validity mask; padded
observations carry zero weight.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu_splat.sfm.geometry import exp_so3


class BAProblem(NamedTuple):
    cam_rotmats: jnp.ndarray  # (C, 3, 3) w2c rotations (reference point)
    cam_trans: jnp.ndarray  # (C, 3)
    points: jnp.ndarray  # (P, 3)
    obs_cam: jnp.ndarray  # (O,) int32
    obs_pt: jnp.ndarray  # (O,) int32
    obs_uv: jnp.ndarray  # (O, 2) normalized image coords
    obs_valid: jnp.ndarray  # (O,) bool


def _residuals(theta, problem: BAProblem, weights, fixed_cam_mask,
               k1_base=0.0):
    """Weighted reprojection residuals (O*2,). theta = dict(dw, dt, dX[, df, dk1]).

    `df` (scalar, optional) is a shared log-focal correction: the model
    projection is scaled by exp(df), which is exactly a change of the shared
    focal length in normalized-coordinate space (self-calibration; COLMAP's
    mapper refines intrinsics by default, reference main.py:1090-1113).
    `dk1` (scalar, optional) is a shared SIMPLE_RADIAL radial-distortion
    correction applied to the ideal projection BEFORE the focal scale
    (x_d = x * (1 + k1 r^2), COLMAP's default camera model): the caller's
    observations are assumed already undistorted with its current k1
    estimate, so dk1 measures the residual distortion left in them."""
    dw = theta["dw"] * (1.0 - fixed_cam_mask[:, None])
    dt = theta["dt"] * (1.0 - fixed_cam_mask[:, None])
    R = exp_so3(dw) @ problem.cam_rotmats  # (C, 3, 3)
    t = problem.cam_trans + dt
    X = problem.points + theta["dX"]

    Rc = R[problem.obs_cam]  # (O, 3, 3)
    tc = t[problem.obs_cam]
    Xp = X[problem.obs_pt]
    pc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc
    z = jnp.maximum(pc[:, 2], 1e-6)
    proj = pc[:, :2] / z[:, None]
    if "dk1" in theta:
        k1 = k1_base + theta["dk1"]
        r2 = jnp.sum(proj**2, axis=-1, keepdims=True)
        proj = proj * (1.0 + k1 * r2)
    if "df" in theta:
        proj = proj * jnp.exp(theta["df"])
    res = (proj - problem.obs_uv) * weights[:, None]
    # observations behind the camera get zeroed (weights handle validity)
    res = jnp.where((pc[:, 2] > 1e-6)[:, None], res, 0.0)
    return res.reshape(-1)


def _huber_weights(problem, theta, fixed_cam_mask, delta, k1_base=0.0):
    ones = jnp.ones_like(problem.obs_valid, dtype=jnp.float32)
    r = _residuals(theta, problem, ones, fixed_cam_mask,
                   k1_base=k1_base).reshape(-1, 2)
    e = jnp.linalg.norm(r, axis=-1)
    w = jnp.sqrt(jnp.where(e <= delta, 1.0, delta / jnp.maximum(e, 1e-12)))
    return w * problem.obs_valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("outer_iters", "cg_iters",
                                              "fix_first_cam", "optimize_focal",
                                              "optimize_k1"))
def bundle_adjust(
    problem: BAProblem,
    huber_delta: float = 0.01,
    outer_iters: int = 8,
    cg_iters: int = 24,
    lm_lambda: float = 1e-5,
    fix_first_cam: bool = True,
    optimize_focal: bool = False,
    optimize_k1: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Run BA; returns (cam_rotmats, cam_trans, points, rms_error, focal_scale,
    k1_delta).

    With optimize_focal, a shared log-focal correction is estimated jointly
    (single-camera captures); the caller should multiply its fx/fy by the
    returned focal_scale. focal_scale is 1.0 otherwise.
    With optimize_k1, a shared SIMPLE_RADIAL k1 correction is estimated
    jointly; the caller should ADD the returned k1_delta to its current k1
    estimate (the observations it fed were undistorted with that estimate, so
    the delta is the residual distortion — exact in the limit of BA-round
    iteration, first-order per call). k1_delta is 0.0 otherwise."""
    C = problem.cam_rotmats.shape[0]
    fixed = jnp.zeros((C,), jnp.float32)
    if fix_first_cam:
        fixed = fixed.at[0].set(1.0)

    def zero_theta():
        th = {
            "dw": jnp.zeros((C, 3)),
            "dt": jnp.zeros((C, 3)),
            "dX": jnp.zeros_like(problem.points),
        }
        if optimize_focal:
            th["df"] = jnp.zeros(())
        if optimize_k1:
            th["dk1"] = jnp.zeros(())
        return th

    def apply_theta(prob, theta):
        dw = theta["dw"] * (1.0 - fixed[:, None])
        dt = theta["dt"] * (1.0 - fixed[:, None])
        # A focal step exp(df) on the model is folded into the problem by
        # scaling the observations by exp(-df); the cumulative df is carried
        # separately so the caller can update its fx/fy.
        obs_uv = prob.obs_uv
        if "df" in theta:
            obs_uv = obs_uv * jnp.exp(-theta["df"])
        return prob._replace(
            cam_rotmats=exp_so3(dw) @ prob.cam_rotmats,
            cam_trans=prob.cam_trans + dt,
            points=prob.points + theta["dX"],
            obs_uv=obs_uv,
        )

    def outer(carry, _):
        prob, log_s, k1, key = carry
        theta0 = zero_theta()
        w = _huber_weights(prob, theta0, fixed, huber_delta, k1_base=k1)

        res_fn = lambda th: _residuals(th, prob, w, fixed, k1_base=k1)
        r0 = res_fn(theta0)
        # gradient g = J^T r
        _, vjp = jax.vjp(res_fn, theta0)
        g = vjp(r0)[0]

        def gn_hvp(v):
            # Gauss-Newton H v = J^T (J v)
            _, jv = jax.jvp(res_fn, (theta0,), (v,))
            return vjp(jv)[0]

        # Exact Jacobi preconditioner. Each observation involves exactly one
        # camera and one point, so a JVP with a unit tangent on coordinate k of
        # EVERY camera (or point) simultaneously yields per-observation Jacobian
        # columns that scatter back to their owners without cross-talk:
        # diag_H[c, k] = sum_{o in cam c} ||J_o e_k||^2. Nine JVPs total.
        # Camera and point blocks have wildly different curvature; CG without
        # this stalls long before the noise floor.
        n_cams = prob.cam_rotmats.shape[0]
        n_pts = prob.points.shape[0]

        def diag_for(name, dim, seg_ids, n_seg):
            cols = []
            for k in range(dim):
                tangent = jax.tree.map(jnp.zeros_like, theta0)
                tangent[name] = tangent[name].at[:, k].set(1.0)
                _, jv = jax.jvp(res_fn, (theta0,), (tangent,))
                sq = jnp.sum(jv.reshape(-1, 2) ** 2, axis=-1)
                cols.append(jax.ops.segment_sum(sq, seg_ids, num_segments=n_seg))
            return jnp.stack(cols, axis=-1)

        diag = {
            "dw": diag_for("dw", 3, prob.obs_cam, n_cams),
            "dt": diag_for("dt", 3, prob.obs_cam, n_cams),
            "dX": diag_for("dX", 3, prob.obs_pt, n_pts),
        }
        if optimize_focal:
            tangent = jax.tree.map(jnp.zeros_like, theta0)
            tangent["df"] = jnp.ones(())
            _, jv = jax.jvp(res_fn, (theta0,), (tangent,))
            diag["df"] = jnp.sum(jv**2)
        if optimize_k1:
            tangent = jax.tree.map(jnp.zeros_like, theta0)
            tangent["dk1"] = jnp.ones(())
            _, jv = jax.jvp(res_fn, (theta0,), (tangent,))
            diag["dk1"] = jnp.sum(jv**2)
        diag = jax.tree.map(lambda d: jnp.maximum(d, 1e-10), diag)

        def hvp(v):
            hv = gn_hvp(v)
            # scale-aware LM damping: H + lambda * diag(H)
            return jax.tree.map(lambda a, d, b: a + lm_lambda * d * b, hv, diag, v)

        def precond(r):
            return jax.tree.map(lambda a, d: a / (d * (1 + lm_lambda)), r, diag)

        def tdot(a, b):
            return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))

        x = jax.tree.map(jnp.zeros_like, g)
        r = jax.tree.map(lambda a: -a, g)
        z = precond(r)
        p = z
        rz = tdot(r, z)

        def cg_step(carry, _):
            x, r, p, rz = carry
            hp = hvp(p)
            denom = tdot(p, hp)
            alpha = rz / jnp.maximum(denom, 1e-20)
            x = jax.tree.map(lambda a, b: a + alpha * b, x, p)
            r = jax.tree.map(lambda a, b: a - alpha * b, r, hp)
            z = precond(r)
            rz_new = tdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = jax.tree.map(lambda a, b: a + beta * b, z, p)
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(cg_step, (x, r, z, rz), None, length=cg_iters)

        if optimize_focal:
            # trust region on the shared focal: one outer step may move the
            # focal at most ~5% — unclamped, early poorly-conditioned rounds
            # oscillate the focal +-20% and destabilize the whole map
            x = dict(x, df=jnp.clip(x["df"], -0.05, 0.05))
        if optimize_k1:
            # same trust region logic for the radial term (k1 is strongly
            # coupled to focal through the image-border observations; a big
            # joint step trades one off against the other and overshoots)
            x = dict(x, dk1=jnp.clip(x["dk1"], -0.02, 0.02))
        # Accept the step only if the weighted cost does not increase; try a
        # half step as a cheap fallback before rejecting.
        cost0 = jnp.sum(r0**2)
        cost_full = jnp.sum(res_fn(x) ** 2)
        x_half = jax.tree.map(lambda a: 0.5 * a, x)
        cost_half = jnp.sum(res_fn(x_half) ** 2)
        use_half = (cost_half < cost_full) & (cost_half < cost0)
        use_full = (cost_full <= cost_half) & (cost_full < cost0)
        scale = jnp.where(use_full, 1.0, jnp.where(use_half, 0.5, 0.0))
        x = jax.tree.map(lambda a: scale * a, x)
        new_log_s = log_s + (x["df"] if optimize_focal else 0.0)
        new_k1 = k1 + (x["dk1"] if optimize_k1 else 0.0)
        return (apply_theta(prob, x), new_log_s, new_k1, key), jnp.minimum(
            cost_full, cost0)

    (prob, log_s, k1, _), _ = jax.lax.scan(
        outer, (problem, jnp.zeros(()), jnp.zeros(()), jax.random.PRNGKey(0)),
        None, length=outer_iters,
    )

    ones = jnp.ones_like(problem.obs_valid, dtype=jnp.float32)
    r = _residuals(zero_theta(), prob, ones * prob.obs_valid, fixed,
                   k1_base=k1).reshape(-1, 2)
    nvalid = jnp.maximum(jnp.sum(prob.obs_valid), 1)
    rms = jnp.sqrt(jnp.sum(r**2) / nvalid)
    return prob.cam_rotmats, prob.cam_trans, prob.points, rms, jnp.exp(log_s), k1


def reprojection_errors(problem: BAProblem) -> jnp.ndarray:
    """Per-observation reprojection error (normalized units), inf for invalid."""
    Rc = problem.cam_rotmats[problem.obs_cam]
    tc = problem.cam_trans[problem.obs_cam]
    Xp = problem.points[problem.obs_pt]
    pc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc
    z = jnp.maximum(pc[:, 2], 1e-6)
    proj = pc[:, :2] / z[:, None]
    err = jnp.linalg.norm(proj - problem.obs_uv, axis=-1)
    err = jnp.where(pc[:, 2] > 1e-6, err, jnp.inf)
    return jnp.where(problem.obs_valid, err, jnp.inf)
