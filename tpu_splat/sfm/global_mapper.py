"""Global structure-from-motion: rotation averaging + position averaging.

The GLOMAP-mapper analog (the reference selects it with sfm.softwareName=glomap,
main.py:1114-1154). Instead of registering cameras one at a time (incremental,
drift-prone), all pairwise relative poses are fused at once:

1. Front end shared with the incremental mapper: features, matching + essential
   verification, tracks; each verified pair also yields (R_ij, t_ij-direction).
2. Robust iterative chordal rotation averaging (anchor R_0): every sweep sets
   each camera's rotation to the reweighted chordal mean of its neighbors'
   predictions and projects back to SO(3) — all cameras updated in parallel as
   one batched SVD (TPU-friendly, no sequential chain).
3. Position averaging: minimize sum_ij w_ij ||(c_j - c_i) - s_ij u_ij||^2 with
   per-pair baseline scales s_ij alternated in closed form and camera centers
   solved by a (damped) graph-Laplacian least squares.
4. Global triangulation of all tracks + observation filtering + extended bundle
   adjustment (shared with the incremental path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpu_splat.core.types import SfMScene
from tpu_splat.sfm.geometry import decompose_essential, essential_ransac
from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig


def _project_so3(mats: np.ndarray) -> np.ndarray:
    """Batched projection of (N, 3, 3) matrices onto SO(3)."""
    u, _, vt = np.linalg.svd(mats)
    det = np.linalg.det(u @ vt)
    fix = np.tile(np.eye(3), (mats.shape[0], 1, 1))
    fix[:, 2, 2] = np.sign(det)
    return u @ fix @ vt


def rotation_averaging(
    n: int,
    pairs: List[Tuple[int, int]],
    rel_rots: List[np.ndarray],
    weights: List[float],
    iters: int = 50,
) -> np.ndarray:
    """Absolute w2c rotations from relative ones (R_j ~ R_ij R_i), anchor cam 0.

    Robust IRLS chordal averaging: neighbor predictions are averaged with Cauchy
    weights on the chordal residual, then projected to SO(3)."""
    R = np.tile(np.eye(3), (n, 1, 1))
    # spanning-tree init: BFS from 0 through the pair graph
    adj: Dict[int, List[Tuple[int, np.ndarray]]] = {i: [] for i in range(n)}
    for (a, b), Rab in zip(pairs, rel_rots):
        adj[a].append((b, Rab))  # R_b = Rab @ R_a
        adj[b].append((a, Rab.T))
    seen = {0}
    frontier = [0]
    while frontier:
        nxt = []
        for i in frontier:
            for j, Rij in adj[i]:
                if j not in seen:
                    R[j] = Rij @ R[i]
                    seen.add(j)
                    nxt.append(j)
        frontier = nxt

    sigma = 0.2  # chordal scale for the Cauchy weight
    for _ in range(iters):
        acc = np.zeros((n, 3, 3))
        wsum = np.zeros(n)
        for (a, b), Rab, w in zip(pairs, rel_rots, weights):
            pred_b = Rab @ R[a]
            pred_a = Rab.T @ R[b]
            rb = np.linalg.norm(pred_b - R[b])
            ra = np.linalg.norm(pred_a - R[a])
            wb = w / (1.0 + (rb / sigma) ** 2)
            wa = w / (1.0 + (ra / sigma) ** 2)
            acc[b] += wb * pred_b
            wsum[b] += wb
            acc[a] += wa * pred_a
            wsum[a] += wa
        # keep the anchor fixed; blend others toward the neighbor mean
        upd = wsum > 0
        upd[0] = False
        mixed = R.copy()
        mixed[upd] = 0.5 * R[upd] + 0.5 * (acc[upd] / wsum[upd, None, None])
        R = _project_so3(mixed)
        R[0] = np.eye(3)
    return R


def position_averaging(
    n: int,
    pairs: List[Tuple[int, int]],
    world_dirs: List[np.ndarray],  # unit vector c_a -> c_b in world frame
    weights: List[float],
    irls_rounds: int = 3,
) -> np.ndarray:
    """Camera centers from pairwise direction constraints.

    Uses the linear cross-product form: (c_j - c_i) x u_ij = 0 is linear in the
    centers, so with c_0 anchored the solution is the smallest right singular
    vector of the stacked constraint matrix (global scale is the gauge freedom;
    the sign is fixed so most baselines point along their measured directions).
    A few IRLS rounds downweight outlier directions."""
    m = len(pairs)
    if m == 0 or n < 2:
        return np.zeros((n, 3))
    U = np.stack(world_dirs)  # (m, 3)
    w = np.sqrt(np.asarray(weights, np.float64))

    def cross_mat(u):
        return np.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])

    for _ in range(irls_rounds):
        A = np.zeros((3 * m, 3 * (n - 1)))
        for k, (a, b) in enumerate(pairs):
            X = w[k] * cross_mat(U[k])
            if a > 0:
                A[3 * k : 3 * k + 3, 3 * (a - 1) : 3 * a] = -X
            if b > 0:
                A[3 * k : 3 * k + 3, 3 * (b - 1) : 3 * b] = X
        _, _, vt = np.linalg.svd(A, full_matrices=False)
        x = vt[-1]
        c = np.concatenate([np.zeros((1, 3)), x.reshape(n - 1, 3)], axis=0)
        # fix the sign so baselines align with their measured directions
        base = c[[b for _, b in pairs]] - c[[a for a, _ in pairs]]
        dots = np.sum(base * U, axis=1)
        if np.sum(np.sign(dots)) < 0:
            c = -c
            dots = -dots
        # IRLS: downweight pairs whose direction disagrees
        lens = np.linalg.norm(base, axis=1) + 1e-12
        cosang = dots / lens
        w = np.sqrt(np.asarray(weights, np.float64)) / (1.0 + 5.0 * (1.0 - cosang) ** 2)
    # gauge: mean baseline 1
    scale = np.mean(np.linalg.norm(base, axis=1))
    return c / max(scale, 1e-12)


def global_positioning(
    n: int,
    centers_init: np.ndarray,          # (n, 3) from position_averaging
    cam_pairs: List[Tuple[int, int]],
    pair_dirs: np.ndarray,             # (m, 3) unit c_a -> c_b, world frame
    pair_w: np.ndarray,                # (m,)
    obs_cam: np.ndarray,               # (M,) camera index per observation
    obs_tid: np.ndarray,               # (M,) track index per observation
    obs_dir: np.ndarray,               # (M, 3) unit world ray camera -> point
    obs_w: np.ndarray,                 # (M,)
    n_tracks: int,
    rounds: int = 60,
) -> Tuple[np.ndarray, np.ndarray]:
    """Joint camera-center + track-point solve from ray directions (GLOMAP-style).

    The cam-cam chain alone (`position_averaging`) has near-null bending modes:
    on a closed ring only adjacent cameras constrain each other, so noise
    integrates along the loop (measured r3: 94% center RMSE on a 20-view ring).
    GLOMAP's global positioning step (reference runs it inside the glomap
    mapper, main.py:1114-1154) braces every pair of cameras that co-observe a
    track: minimize over centers c, points p, and per-ray depths d

        sum_obs w_ik ||p_k - c_i - d_ik v_ik||^2  +  sum_pairs w_ij ||(c_j - c_i) - s_ij u_ij||^2

    alternating (a) closed-form depths/baseline scales d, s (projections onto
    the fixed directions, floored away from zero), (b) IRLS reweighting by the
    depth-normalized residual, and (c) one exact linear solve for (c, p) with
    the points eliminated per-track (Schur complement), which reduces to a
    3-RHS (n-1)x(n-1) graph-Laplacian system over the covisibility graph —
    host-side numpy; n is at most a few hundred cameras.

    Returns (centers (n,3), points (n_tracks,3)); gauge: c_0 = 0, mean
    cam-cam baseline 1.
    """
    c = np.asarray(centers_init, np.float64).copy()
    mpair = len(cam_pairs)
    pa = np.asarray([a for a, _ in cam_pairs], np.int64)
    pb = np.asarray([b for _, b in cam_pairs], np.int64)
    U = np.asarray(pair_dirs, np.float64)
    wp0 = np.asarray(pair_w, np.float64)
    oc = np.asarray(obs_cam, np.int64)
    ot = np.asarray(obs_tid, np.int64)
    V = np.asarray(obs_dir, np.float64)
    wo0 = np.asarray(obs_w, np.float64)

    # initial points: midpoint triangulation from the init centers — per track
    # minimize sum_i ||(I - v v^T)(p - c_i)||^2, a batched 3x3 solve.
    eye = np.eye(3)
    P_orth = eye[None] - V[:, :, None] * V[:, None, :]   # (M, 3, 3)
    A = np.zeros((n_tracks, 3, 3))
    b = np.zeros((n_tracks, 3))
    np.add.at(A, ot, P_orth)
    np.add.at(b, ot, np.einsum("mij,mj->mi", P_orth, c[oc]))
    A += 1e-9 * eye[None]
    p = np.linalg.solve(A, b[:, :, None])[:, :, 0]

    scale0 = 1.0
    if mpair:
        scale0 = max(float(np.mean(np.linalg.norm(c[pb] - c[pa], axis=1))), 1e-9)
    d_min = 1e-3 * scale0
    # Graduated non-convexity: the IRLS scale on the depth-normalized
    # (angular) residual anneals from wide-open to tight, so a poor chain
    # init (closed rings make position_averaging underdetermined) is first
    # pulled into the right basin before outliers are gated. Round 0 uses
    # unit depths/scales — a convex pure direction-graph embedding — which
    # discards the init's (possibly degenerate) depth structure entirely.
    sigma_hi, sigma_lo = 1.0, 0.02
    wo = wo0.copy()
    wpair = wp0.copy()

    for r in range(rounds):
        if r == 0:
            d = np.ones(len(oc))
            s = np.ones(mpair)
        else:
            sigma = max(sigma_lo, sigma_hi * (0.7 ** (r - 1)))
            # (a) closed-form depths / baseline scales
            rel = p[ot] - c[oc]
            d = np.maximum(np.einsum("ij,ij->i", rel, V), d_min)
            # (b) IRLS on the angular residual ||rel - d v|| / d
            res = np.linalg.norm(rel - d[:, None] * V, axis=1) / d
            wo = wo0 / (1.0 + (res / sigma) ** 2)
            if mpair:
                base = c[pb] - c[pa]
                s = np.maximum(np.einsum("ij,ij->i", base, U), d_min)
                resp = np.linalg.norm(base - s[:, None] * U, axis=1) / s
                wpair = wp0 / (1.0 + (resp / sigma) ** 2)

        # (c) eliminate points: p_k = (sum_i w(c_i + d v)) / S_k, then the
        # camera system is (L x I3) c = B with scalar Laplacian L.
        S = np.zeros(n_tracks)
        np.add.at(S, ot, wo)
        S = np.maximum(S, 1e-12)
        Wm = np.zeros((n_tracks, n))
        np.add.at(Wm, (ot, oc), wo)
        wdv = wo[:, None] * d[:, None] * V  # (M, 3)
        Vk = np.zeros((n_tracks, 3))
        np.add.at(Vk, ot, wdv)

        L = np.zeros((n, n))
        diag = np.zeros(n)
        np.add.at(diag, oc, wo)
        L[np.arange(n), np.arange(n)] += diag
        L -= (Wm / S[:, None]).T @ Wm
        B = np.zeros((n, 3))
        np.add.at(B, oc, -wdv)
        B += (Wm / S[:, None]).T @ Vk
        if mpair:
            wsu = wpair[:, None] * s[:, None] * U
            np.add.at(L, (pa, pa), wpair)
            np.add.at(L, (pb, pb), wpair)
            np.add.at(L, (pa, pb), -wpair)
            np.add.at(L, (pb, pa), -wpair)
            np.add.at(B, pa, -wsu)
            np.add.at(B, pb, wsu)

        # pin c_0 = 0 (translation gauge); tiny damping for isolated cameras
        lam = 1e-9 * max(np.trace(L) / max(n, 1), 1.0)
        Lr = L[1:, 1:] + lam * np.eye(n - 1)
        c = np.concatenate([np.zeros((1, 3)), np.linalg.solve(Lr, B[1:])], axis=0)
        # recover points from the elimination
        Sc = np.zeros((n_tracks, 3))
        np.add.at(Sc, ot, wo[:, None] * c[oc])
        p = (Sc + Vk) / S[:, None]
        # scale gauge: mean cam-cam baseline 1 (pure rescale, keeps geometry)
        if mpair:
            g = max(float(np.mean(np.linalg.norm(c[pb] - c[pa], axis=1))), 1e-12)
            c /= g
            p /= g
    return c, p


class GlobalMapper(IncrementalMapper):
    """Global SfM sharing the incremental front end (features/matching/tracks)."""

    def reconstruct(self) -> SfMScene:
        cfg = self.cfg
        if not self.pair_matches:
            raise RuntimeError("SfM failed to converge: no verified image pairs")
        thresh_n = cfg.pixel_threshold / self.fx

        # Per-pair relative poses from the stored verified matches.
        pairs, rel_rots, world_dirs_raw, weights = [], [], [], []
        for (a, b), idx in self.pair_matches.items():
            xa = self._norm_coords(a, idx[:, 0])
            xb = self._norm_coords(b, idx[:, 1])
            E, inl = essential_ransac(
                jnp.asarray(xa), jnp.asarray(xb), jnp.ones(len(xa), bool),
                self._next_key(), threshold=thresh_n,
            )
            n_inl = int(np.asarray(inl).sum())
            if n_inl < cfg.min_pair_inliers:
                continue
            Rrel, trel = decompose_essential(E, jnp.asarray(xa), jnp.asarray(xb), inl)
            pairs.append((a, b))
            rel_rots.append(np.asarray(Rrel, np.float64))
            world_dirs_raw.append(np.asarray(trel, np.float64))
            weights.append(float(n_inl))
        if not pairs:
            raise RuntimeError("SfM failed to converge: no relative poses")

        self.log(f"global: {len(pairs)} relative poses")
        R = rotation_averaging(self.n, pairs, rel_rots, weights)

        # camera-center directions in world: c_b - c_a ~ -R_a^T R_ab^T t_ab
        dirs = []
        for (a, b), Rab, tab in zip(pairs, rel_rots, world_dirs_raw):
            d = -R[a].T @ (Rab.T @ tab)
            nrm = np.linalg.norm(d)
            dirs.append(d / max(nrm, 1e-12))
        centers = position_averaging(self.n, pairs, dirs, weights)

        # Track-braced global positioning: refine the chain-init centers with
        # camera->point ray constraints so co-observing cameras anywhere in
        # the graph are directly coupled (closed loops stop integrating noise).
        in_graph = np.zeros(self.n, bool)
        for a, b in pairs:
            in_graph[a] = in_graph[b] = True
        track_ids = sorted(
            range(len(self.tracks)), key=lambda t: -len(self.tracks[t])
        )[: 20000]
        trip = []  # (dense track id, img, feat)
        n_dense = 0
        for tid in track_ids:
            obs = [(i, f) for i, f in self.tracks[tid] if in_graph[i]]
            if len(obs) < 2:
                continue
            trip.extend((n_dense, i, f) for i, f in obs)
            n_dense += 1
        if n_dense:
            trip = np.asarray(trip, np.int64)  # (M, 3)
            obs_tid, obs_cam, feat_idx = trip[:, 0], trip[:, 1], trip[:, 2]
            xn = np.zeros((len(trip), 2), np.float64)
            for i in np.unique(obs_cam):
                sel = obs_cam == i
                xn[sel] = self._norm_coords(int(i), feat_idx[sel])
            rays = np.concatenate([xn, np.ones((len(trip), 1))], axis=1)
            rays /= np.linalg.norm(rays, axis=1, keepdims=True)
            # w2c: x_cam = R X + t -> world ray = R^T ray_cam
            obs_dir = np.einsum("nji,nj->ni", R[obs_cam], rays)
            self.log(f"global: positioning with {n_dense} tracks / "
                     f"{len(trip)} rays")
            centers, _ = global_positioning(
                self.n, centers, pairs, np.stack(dirs),
                np.asarray(weights, np.float64),
                obs_cam, obs_tid, obs_dir, np.ones(len(trip)), n_dense,
            )

        self.R = R.astype(np.float32)
        self.t = np.stack([-R[i] @ centers[i] for i in range(self.n)]).astype(
            np.float32
        )
        # cameras in the pair graph count as registered
        self.registered = np.zeros(self.n, bool)
        for a, b in pairs:
            self.registered[a] = True
            self.registered[b] = True
        n_tracks = len(self.tracks)
        self.points = np.zeros((n_tracks, 3), np.float32)
        self.has_point = np.zeros(n_tracks, bool)
        self._attempts = np.zeros(self.n, np.int32)

        self._retriangulate()
        self._bundle_adjust()
        self._filter_observations()
        self._retriangulate()
        self._bundle_adjust(extended=True)
        self._filter_points()
        return self._to_scene()


def run_global_sfm(
    images: np.ndarray,
    cfg: Optional[MapperConfig] = None,
    fx: Optional[float] = None,
    fy: Optional[float] = None,
    cx: Optional[float] = None,
    cy: Optional[float] = None,
    log_fn=None,
) -> SfMScene:
    """Global SfM entry point (the glomap-mapper analog)."""
    import jax

    cfg = cfg or MapperConfig()
    with jax.default_matmul_precision("highest"):
        m = GlobalMapper(images, cfg, fx=fx, fy=fy, cx=cx, cy=cy, log_fn=log_fn)
        m.extract_all()
        m.match_all()
        m.build_tracks()
        return m.reconstruct()
