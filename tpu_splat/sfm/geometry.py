"""Multi-view geometry kernels: batched RANSAC (essential matrix, PnP),
triangulation, and SE(3) utilities.

Replaces COLMAP's two-view estimation and registration internals. RANSAC here is
TPU-shaped: instead of the classic sequential hypothesize-and-verify loop, all S
minimal-set hypotheses are sampled, solved (batched SVD), and scored against all
correspondences in one shot — a dense (S x M) computation that XLA vectorizes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [zeros, -z, y, z, zeros, -x, -y, x, zeros], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Written in sinc form (no w/|w| normalization) so gradients are finite at
    w = 0 — BA gauge-fixes cameras by zeroing their updates, and a NaN gradient
    at the origin would poison the whole Hessian-vector product."""
    n2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    # eps keeps theta >= 1e-6: sin(theta)/theta == 1 in f32 there, and no
    # denominator gets small enough for its gradient to overflow f32.
    t2 = n2 + 1e-12
    theta = jnp.sqrt(t2)
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / t2  # -> 0 as w -> 0; multiplies hat(w)^2 which is O(w^2)
    k = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a * k + b * (k @ k)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle."""
    tr = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(tr)
    w = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    scale = jnp.where(theta < 1e-6, 0.5, theta / (2 * jnp.sin(theta) + 1e-12))
    return w * scale[..., None]


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray,
                    x2: jnp.ndarray) -> jnp.ndarray:
    """Two-view DLT triangulation. P: (3,4) projection matrices; x: (M, 2) pixel
    (or normalized) coords consistent with P. Returns (M, 3) points."""

    def solve_one(u1, u2):
        A = jnp.stack([
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
            u2[0] * P2[2] - P2[0],
            u2[1] * P2[2] - P2[1],
        ])
        X = _smallest_right_vector4(A)
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(solve_one)(x1, x2)


def _tri_solve_upper4(R: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 4x4 back-substitution (R upper-triangular, diag pre-clamped)."""
    x3 = b[3] / R[3, 3]
    x2 = (b[2] - R[2, 3] * x3) / R[2, 2]
    x1 = (b[1] - R[1, 2] * x2 - R[1, 3] * x3) / R[1, 1]
    x0 = (b[0] - R[0, 1] * x1 - R[0, 2] * x2 - R[0, 3] * x3) / R[0, 0]
    return jnp.stack([x0, x1, x2, x3])


def _tri_solve_lower4(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled 4x4 forward substitution (L lower-triangular)."""
    x0 = b[0] / L[0, 0]
    x1 = (b[1] - L[1, 0] * x0) / L[1, 1]
    x2 = (b[2] - L[2, 0] * x0 - L[2, 1] * x1) / L[2, 2]
    x3 = (b[3] - L[3, 0] * x0 - L[3, 1] * x1 - L[3, 2] * x2) / L[3, 3]
    return jnp.stack([x0, x1, x2, x3])


def _smallest_right_vector4(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest right-singular vector of a (R, 4) DLT system.

    NOT jnp.linalg.svd: XLA lowers batched tall-skinny SVDs through a QR
    custom call whose scoped-VMEM allocation scales with the vmap batch —
    a (32768, 16, 4) retriangulation batch exceeded the 16 MB scoped limit
    on v5e (hard compile error). And NOT plain eigh(A^T A): FORMING the Gram
    in f32 squares the condition number and destroys the null direction on
    drifty DLT systems — the r4 regression that bent the ring benchmark's
    recovered orbit (center RMSE 0.66 -> 1.61, bisected to exactly this).
    Instead: an in-graph Householder QR of A (static shapes, no custom
    call, tiny fixed footprint), then inverse iteration with the triangular
    factor (x <- R^-1 R^-T x), which applies (A^T A)^-1 STABLY — errors stay
    relative to cond(A), not cond(A)^2, because the Gram is never formed.
    eigh on the 4x4 Gram only seeds the iteration (any seed with a nonzero
    component along the target works; the eigh vector is the best cheap one)."""
    r = A.shape[0]
    # Householder QR -> R4 (4x4 upper-triangular), Q discarded
    M = A
    rows = jnp.arange(r)
    for j in range(4):
        v = jnp.where(rows >= j, M[:, j], 0.0)
        nv = jnp.linalg.norm(v)
        sign = jnp.where(v[j] >= 0, 1.0, -1.0)
        u = v.at[j].add(sign * nv)
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
        M = M - 2.0 * jnp.outer(u, u @ M)
    R4 = jnp.triu(M[:4])
    # clamp the diagonal away from exact zero (perfect-data rank deficiency):
    # amplification caps at ~1e7, far past what 2 iterations need
    d = jnp.diag(R4)
    floor = 1e-7 * jnp.maximum(jnp.max(jnp.abs(d)), 1e-30)
    d_safe = jnp.where(jnp.abs(d) < floor,
                       jnp.where(d >= 0, floor, -floor), d)
    R4 = R4 + jnp.diag(d_safe - d)

    _, v = jnp.linalg.eigh(R4.T @ R4)
    x = v[:, 0]
    for _ in range(2):
        y = _tri_solve_lower4(R4.T, x)
        x = _tri_solve_upper4(R4, y)
        x = x / jnp.maximum(jnp.linalg.norm(x), 1e-30)
    return x


def triangulate_multiview(Ps: jnp.ndarray, xs: jnp.ndarray,
                          valid: jnp.ndarray) -> jnp.ndarray:
    """N-view DLT: Ps (V, 3, 4); xs (V, 2); valid (V,). Returns (3,) point.

    Rows from invalid views are zeroed (they contribute nothing to A^T A)."""
    rows_a = xs[:, 0:1] * Ps[:, 2] - Ps[:, 0]  # (V, 4)
    rows_b = xs[:, 1:2] * Ps[:, 2] - Ps[:, 1]
    A = jnp.concatenate([rows_a, rows_b], axis=0)  # (2V, 4)
    w = jnp.concatenate([valid, valid], axis=0).astype(A.dtype)[:, None]
    A = A * w
    X = _smallest_right_vector4(A)
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])


def _eight_point(x1n: jnp.ndarray, x2n: jnp.ndarray,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Essential matrix from >= 8 normalized correspondences (batched-friendly).

    With `weights`, rows are scaled (zero weight = ignored) — used for the
    locally-optimized refit on inliers."""
    u1, v1 = x1n[:, 0], x1n[:, 1]
    u2, v2 = x2n[:, 0], x2n[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
        axis=-1,
    )  # (M, 9)
    if weights is not None:
        A = A * weights[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    E = vt[-1].reshape(3, 3)
    # project onto the essential manifold: singular values (s, s, 0)
    u, s, vt2 = jnp.linalg.svd(E)
    s_mean = (s[0] + s[1]) / 2
    return u @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * s_mean) @ vt2


@functools.lru_cache(maxsize=None)
def _fib_sphere_dirs_np(n: int):
    import numpy as _np
    i = _np.arange(n) + 0.5
    phi = _np.arccos(1 - 2 * i / n)
    theta = _np.pi * (1 + 5**0.5) * i
    return _np.stack(
        [_np.sin(phi) * _np.cos(theta), _np.sin(phi) * _np.sin(theta),
         _np.cos(phi)], axis=-1).astype(_np.float32)


def _fib_sphere_dirs(n: int) -> jnp.ndarray:
    """Fibonacci-lattice unit directions (trace-time constant; numpy-cached —
    never cache jnp arrays created under jit, see CLAUDE.md)."""
    return jnp.asarray(_fib_sphere_dirs_np(n))


def sampson_error(E: jnp.ndarray, x1n: jnp.ndarray, x2n: jnp.ndarray) -> jnp.ndarray:
    """Sampson distance of normalized correspondences to an essential matrix."""
    ones = jnp.ones_like(x1n[:, :1])
    p1 = jnp.concatenate([x1n, ones], axis=-1)  # (M, 3)
    p2 = jnp.concatenate([x2n, ones], axis=-1)
    Ep1 = p1 @ E.T  # (M, 3)
    Etp2 = p2 @ E
    num = jnp.sum(p2 * Ep1, axis=-1) ** 2
    den = Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2 + Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "n_fib", "pre_steps"))
def essential_ransac(
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    threshold: float,
    num_hypotheses: int = 512,
    n_fib: int = 128,
    pre_steps: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Progressive batched-RANSAC essential matrix.

    x*n: (M, 2) normalized camera coords; threshold in normalized units
    (pixel_threshold / focal). Returns (E, inliers).

    Minimal 8-point fits are extremely noise-sensitive for narrow-FOV captures
    (a clean sample recovers only a fraction of the true inliers), so a single
    hypothesize-and-verify round under-segments. Instead: stage 1 draws minimal
    8-point hypotheses from all matches to get a small but nearly outlier-free
    consensus; stages 2 and 3 redraw *larger* least-squares samples (24 and 40
    points) restricted to the previous consensus, which is now pure enough that
    most samples are clean and the better-conditioned LS fit recovers the full
    inlier set. All stages are batched (S x M dense scoring, XLA-friendly).

    Hypotheses are selected by MSAC score (sum of threshold-truncated squared
    Sampson errors), not inlier count. Counting saturates on rotation-dominant
    pairs: the classic sideways-translation / pan-rotation ambiguity yields a
    wrong model whose residuals all sit just under a loose threshold, tying or
    beating the true model's count (measured on a 20-view orbit: every
    adjacent pair decoded ~22deg off with count selection, while the truncated
    cost separated true/wrong by ~2x at 1px)."""
    m = x1n.shape[0]
    t2 = threshold**2
    # Basin RANKING runs at a 4x tighter truncation than the consensus gate:
    # the wrong quasi-degenerate basin keeps most residuals just under the
    # full threshold (that is what makes count selection fail), so a cost
    # truncated there barely separates the basins — the measured ~2x
    # separation only appears near 1px. The RANSAC stages keep the full
    # threshold (minimal fits are noisy; a tight cap there starves stage 1).
    t2_sel = (threshold / 4.0) ** 2

    def msac_cost(errs, cap=t2):
        # invalid rows contribute the cap, so they never influence selection
        return jnp.sum(jnp.where(valid, jnp.minimum(errs, cap), cap), axis=-1)

    def stage(k, probs, n_sample, n_hyp):
        idx = jax.random.choice(k, m, shape=(n_hyp, n_sample), p=probs)
        Es = jax.vmap(lambda i: _eight_point(x1n[i], x2n[i]))(idx)
        errs = jax.vmap(lambda E: sampson_error(E, x1n, x2n))(Es)
        best = jnp.argmin(jax.vmap(msac_cost)(errs))
        inl = (errs[best] < t2) & valid
        return Es[best], inl

    k1, k2, k3 = jax.random.split(key, 3)
    probs0 = valid.astype(jnp.float32)
    probs0 = probs0 / jnp.maximum(probs0.sum(), 1.0)
    _, inl = stage(k1, probs0, 8, num_hypotheses)

    p = inl.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    _, inl = stage(k2, p, 24, num_hypotheses // 2)

    p = inl.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    E_best, inl_best = stage(k3, p, 40, num_hypotheses // 2)

    # Quasi-degeneracy rescue + multistart polish. Rotation-dominant pairs
    # (orbit/turntable steps) leave the epipolar design matrix with a
    # near-degenerate tail: the true essential lies in the span of the last
    # few right singular vectors but NOT along the last one, so every linear
    # fit above — minimal or LS — lands ~20deg off in the same wrong basin
    # (measured on a 20-view ring: every adjacent pair decoded ~22deg off).
    # The wrong basin is wide and the true one narrow, so scoring UNPOLISHED
    # candidates always favors the wrong basin; only bottom-vs-bottom
    # comparison is reliable (measured: GT bottom wins at every truncation).
    # Hence: refit on the consensus, span the last-3 singular vectors with a
    # Fibonacci sphere, manifold-project, GN-polish EVERY candidate to its
    # basin bottom, then select by MSAC. Healthy spectra make all starts
    # collapse into the single basin — a no-op beyond the old single polish.
    # Budget: the full 10-step polish of every candidate is ~30x the cost of
    # the RANSAC stages, so the multistart runs two-phase — `pre_steps` GN
    # iterations on all `n_fib` candidates (enough to fall to the right
    # neighborhood for ranking), then the full polish on the winner only
    # (measured in scripts/exp_msac_polish.py: sub-degree decode holds).
    ones = jnp.ones_like(x1n[:, :1])
    p1 = jnp.concatenate([x1n, ones], axis=-1)
    p2 = jnp.concatenate([x2n, ones], axis=-1)

    def signed_sampson(E):
        Ep1 = p1 @ E.T
        Etp2 = p2 @ E
        num = jnp.sum(p2 * Ep1, axis=-1)
        den = Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2 + Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2
        return num / jnp.sqrt(jnp.maximum(den, 1e-12))

    def polish(E_init, n_steps):
        # Trimmed Gauss-Newton on the essential manifold (5 DOF: rotation +
        # translation direction), minimizing the signed Sampson residual over
        # hard-trimmed inliers. Both twisted-pair rotations give the same E,
        # so one start per candidate suffices; chirality is resolved later in
        # decompose_essential.
        u, _, vt = jnp.linalg.svd(E_init)
        u = u * jnp.sign(jnp.linalg.det(u))
        vt = vt * jnp.sign(jnp.linalg.det(vt))
        W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
        R0 = u @ W @ vt
        t0 = u[:, 2]

        def E_of(params):
            w, dt = params[:3], params[3:]
            t = t0 + dt
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
            return hat(t) @ (exp_so3(w) @ R0)

        def gn_step(params, _):
            r = signed_sampson(E_of(params))
            wgt = ((jnp.abs(r) < threshold) & valid).astype(x1n.dtype)
            J = jax.jacfwd(lambda q: signed_sampson(E_of(q)))(params)
            JW = J * wgt[:, None]
            H = JW.T @ J + 1e-4 * jnp.eye(6)
            return params - jnp.linalg.solve(H, JW.T @ r), None

        params, _ = jax.lax.scan(gn_step, jnp.zeros(6), None, length=n_steps)
        return E_of(params)

    if n_fib > 0:
        wcons = inl_best.astype(x1n.dtype)
        u1, v1 = x1n[:, 0], x1n[:, 1]
        u2, v2 = x2n[:, 0], x2n[:, 1]
        A = jnp.stack(
            [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
             jnp.ones_like(u1)],
            axis=-1,
        ) * wcons[:, None]
        _, _, vtA = jnp.linalg.svd(A, full_matrices=False)
        basis = vtA[-3:]  # (3, 9)
        dirs = _fib_sphere_dirs(n_fib)
        cands = (dirs @ basis).reshape(-1, 3, 3)
        # stage-3 winner joins the candidate pool (guards the healthy case)
        cands = jnp.concatenate([E_best[None], cands], axis=0)
        pre = jax.vmap(lambda E: polish(E, pre_steps))(cands)
        pre_costs = jax.vmap(
            lambda E: msac_cost(sampson_error(E, x1n, x2n), t2_sel))(pre)
        E_win = pre[jnp.argmin(pre_costs)]
    else:
        E_win = E_best
    E_ref = polish(E_win, 10)
    # the unpolished stage-3 winner competes too (refinement must never
    # lose ground by tight-truncation MSAC)
    cost_ref = msac_cost(sampson_error(E_ref, x1n, x2n), t2_sel)
    best_cost = msac_cost(sampson_error(E_best, x1n, x2n), t2_sel)
    E_out = jnp.where(best_cost <= cost_ref, E_best, E_ref)
    inl_out = (sampson_error(E_out, x1n, x2n) < t2) & valid
    return E_out, inl_out


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _essential_ransac_vmapped(x1n, x2n, valid, keys, thresholds,
                              num_hypotheses):
    return jax.vmap(
        lambda a, b, v, k, t: essential_ransac(
            a, b, v, k, t, num_hypotheses=num_hypotheses)
    )(x1n, x2n, valid, keys, thresholds)


def essential_ransac_pairs(
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    valid: jnp.ndarray,
    keys: jnp.ndarray,
    thresholds: jnp.ndarray,
    num_hypotheses: int = 512,
    chunk: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched essential RANSAC over a leading pair axis (the per-pair host
    loop was the SfM throughput bottleneck — one dispatch per `chunk` pairs
    amortizes the tunnel latency). thresholds may differ per pair (used by the
    focal self-calibration sweep). Returns (E (P,3,3), inliers (P,M))."""
    import numpy as _np

    p = x1n.shape[0]
    Es, inls = [], []
    for i in range(0, p, chunk):
        n = min(chunk, p - i)
        pad = chunk - n

        def blk(a):
            b = a[i:i + n]
            if pad:
                b = jnp.concatenate([b, jnp.repeat(b[-1:], pad, axis=0)])
            return b

        E, inl = _essential_ransac_vmapped(
            blk(x1n), blk(x2n), blk(valid), blk(keys), blk(thresholds),
            num_hypotheses,
        )
        Es.append(_np.asarray(E[:n]))
        inls.append(_np.asarray(inl[:n]))
    return _np.concatenate(Es), _np.concatenate(inls)


@functools.partial(jax.jit, static_argnums=())
def _decompose_essential_vmapped(Es, x1n, x2n, inliers):
    return jax.vmap(decompose_essential)(Es, x1n, x2n, inliers)


def decompose_essential_pairs(
    Es: jnp.ndarray,
    x1n: jnp.ndarray,
    x2n: jnp.ndarray,
    inliers: jnp.ndarray,
    chunk: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched decompose_essential over a leading pair axis, chunked to a
    fixed block size so every call hits the same compiled program (per-pair
    dispatch latency through the remote tunnel dominated the endgame's
    wide-pair augmentation). Returns (R (P,3,3), t (P,3)) as numpy."""
    import numpy as _np

    p = Es.shape[0]
    Rs, ts = [], []
    for i in range(0, p, chunk):
        n = min(chunk, p - i)
        pad = chunk - n

        def blk(a):
            b = jnp.asarray(a[i:i + n])
            if pad:
                b = jnp.concatenate([b, jnp.repeat(b[-1:], pad, axis=0)])
            return b

        R, t = _decompose_essential_vmapped(
            blk(Es), blk(x1n), blk(x2n), blk(inliers))
        Rs.append(_np.asarray(R[:n]))
        ts.append(_np.asarray(t[:n]))
    return _np.concatenate(Rs), _np.concatenate(ts)


def decompose_essential(
    E: jnp.ndarray, x1n: jnp.ndarray, x2n: jnp.ndarray, inliers: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E -> (R, t) of camera 2 in camera-1 frame (w2c convention: x2 = R x1 + t),
    selecting the chirality with the most points in front of both cameras."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]

    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)

    def count_front(R, tt):
        P2 = jnp.concatenate([R, tt[:, None]], axis=1)
        X = triangulate_dlt(P1, P2, x1n, x2n)
        z1 = X[:, 2]
        z2 = (X @ R.T + tt)[:, 2]
        return jnp.sum((z1 > 0) & (z2 > 0) & inliers)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([count_front(R, tt) for R, tt in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]


def umeyama_alignment(src: jnp.ndarray, dst: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Similarity transform (s, R, t) minimizing ||dst - (s R src + t)||^2.

    Used to compare reconstructions to ground truth and to anchor metric scale
    (tripod measurement). Classic Umeyama closed form via SVD of the cross-covariance."""
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    S = jnp.diag(jnp.array([1.0, 1.0, d]))
    R = u @ S @ vt
    var_s = jnp.mean(jnp.sum(sc**2, axis=-1))
    scale = jnp.sum(s * jnp.diag(S)) / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * R @ mu_s
    return scale, R, t


def _pnp_dlt(X: jnp.ndarray, xn: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projection-matrix DLT from 6+ 3D-2D correspondences (normalized coords),
    followed by orthogonalization of the rotation block."""
    n = X.shape[0]
    ones = jnp.ones((n, 1))
    Xh = jnp.concatenate([X, ones], axis=1)  # (n, 4)
    zeros = jnp.zeros_like(Xh)
    rows1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=1)  # (n, 12)
    rows2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows1, rows2], axis=0)  # (2n, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    # fix sign: points should be in front
    depths = Xh @ P[2]
    P = P * jnp.sign(jnp.sum(jnp.sign(depths)))
    M = P[:, :3]
    # orthogonalize via SVD; scale from singular values
    u, s, vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(u @ vt2)
    R = u @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.sign(det)) @ vt2
    scale = jnp.mean(s) * jnp.sign(det)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return R, t


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def pnp_ransac(
    points3d: jnp.ndarray,
    points2d_n: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    threshold: float,
    num_hypotheses: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Progressive batched-RANSAC PnP (same staging rationale as essential_ransac).
    points2d_n normalized coords. Returns (R, t, inliers)."""
    m = points3d.shape[0]

    def reproj_err(R, t):
        pc = points3d @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) < 1e-9, 1e-9, pc[:, 2])
        proj = pc[:, :2] / z[:, None]
        err = jnp.sum((proj - points2d_n) ** 2, axis=-1)
        return jnp.where(pc[:, 2] > 0, err, jnp.inf)

    def stage(k, probs, n_sample, n_hyp):
        idx = jax.random.choice(k, m, shape=(n_hyp, n_sample), p=probs)
        Rs, ts = jax.vmap(lambda i: _pnp_dlt(points3d[i], points2d_n[i]))(idx)
        errs = jax.vmap(reproj_err)(Rs, ts)
        inl = (errs < threshold**2) & valid[None, :]
        best = jnp.argmax(jnp.sum(inl, axis=-1))
        return Rs[best], ts[best], inl[best]

    k1, k2, k3 = jax.random.split(key, 3)
    probs0 = valid.astype(jnp.float32)
    probs0 = probs0 / jnp.maximum(probs0.sum(), 1.0)
    _, _, inl = stage(k1, probs0, 6, num_hypotheses)

    p = inl.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    _, _, inl = stage(k2, p, 16, num_hypotheses // 2)

    p = inl.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    return stage(k3, p, 32, num_hypotheses // 2)


@functools.partial(jax.jit, static_argnames=("iters",))
def pnp_refine_annealed(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    points3d: jnp.ndarray,
    points2d_n: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float,
    iters: int = 20,
    start_multiplier: float = 8.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Trimmed Gauss-Newton PnP from a pose seed, with an annealed inlier gate.

    The workhorse of incremental registration: minimal DLT PnP is hopelessly
    noise-sensitive (the A-matrix null space collapses at ~1px noise on small
    images), but a pose seed from a connected, already-registered camera plus
    hard-trimmed GN with a threshold annealed from `start_multiplier * threshold`
    down to `threshold` converges reliably. Returns (R, t, inliers)."""

    def resid(params):
        w, dt = params[:3], params[3:]
        R = exp_so3(w) @ R0
        t = t0 + dt
        pc = points3d @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None]
        r = (proj - points2d_n).reshape(-1)
        return r

    def gn_step(params, it):
        anneal = jnp.maximum(
            start_multiplier * (0.8 ** it.astype(jnp.float32)), 1.0
        ) * threshold
        r = resid(params).reshape(-1, 2)
        e = jnp.linalg.norm(r, axis=-1)
        wgt = ((e < anneal) & valid).astype(jnp.float32)
        w2 = jnp.repeat(wgt, 2)
        J = jax.jacfwd(resid)(params)  # (2M, 6)
        JW = J * w2[:, None]
        H = JW.T @ J + 1e-5 * jnp.eye(6)
        g = JW.T @ r.reshape(-1)
        return params - jnp.linalg.solve(H, g), None

    params, _ = jax.lax.scan(gn_step, jnp.zeros(6), jnp.arange(iters))
    R = exp_so3(params[:3]) @ R0
    t = t0 + params[3:]
    pc = points3d @ R.T + t
    z = jnp.maximum(pc[:, 2], 1e-6)
    err = jnp.linalg.norm(pc[:, :2] / z[:, None] - points2d_n, axis=-1)
    inl = (err < threshold) & (pc[:, 2] > 0) & valid
    return R, t, inl


def refine_pnp(
    R: jnp.ndarray,
    t: jnp.ndarray,
    points3d: jnp.ndarray,
    points2d_n: jnp.ndarray,
    weights: jnp.ndarray,
    iters: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton refinement of a single camera pose on weighted inliers."""

    def residuals(params):
        w, tt = params[:3], params[3:]
        Rcur = exp_so3(w) @ R
        pc = points3d @ Rcur.T + tt
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None]
        return ((proj - points2d_n) * weights[:, None]).reshape(-1)

    params = jnp.concatenate([jnp.zeros(3), t])

    def step(params, _):
        J = jax.jacfwd(residuals)(params)  # (2M, 6)
        r = residuals(params)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        g = J.T @ r
        return params - jnp.linalg.solve(H, g), None

    params, _ = jax.lax.scan(step, params, None, length=iters)
    return exp_so3(params[:3]) @ R, params[3:]
