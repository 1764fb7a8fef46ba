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
