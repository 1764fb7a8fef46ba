"""Feature matching: descriptor distances on the MXU + pair-selection policies.

Replaces COLMAP's sequential/spatial/vocab/exhaustive matchers (main.py:1011-1086).
The core kernel is one big matmul (descriptors are L2-normalized, so L2 distance
ranking == dot-product ranking) with Lowe ratio test and mutual-nearest filtering,
all static-shape.

Pair-selection policies:
- exhaustive: all N*(N-1)/2 pairs (auto-selected below a threshold image count,
  mirroring main.py:1017-1032).
- sequential: sliding window of `overlap` neighbors + power-of-2 loop-closure
  links (COLMAP's sequential matcher quadratic overlap analog).
- spatial: k-nearest by camera position prior (pose priors) when available,
  else falls back to retrieval.
- vocab/retrieval: global-descriptor (mean pooled) similarity top-k — the
  vocab-tree analog without an offline vocabulary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Matches(NamedTuple):
    idx: jnp.ndarray  # (M, 2) int32 indices into features of image a / image b
    valid: jnp.ndarray  # (M,) bool


@functools.partial(jax.jit, static_argnames=("max_matches",))
def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float = 0.8,
    max_matches: int = 2048,
) -> Matches:
    """Mutual-nearest-neighbor matching with Lowe's ratio test.

    desc_*: (K, 128) L2-normalized. Returns up to max_matches pairs sorted by
    similarity. One dot-product matmul does all the work (MXU).
    """
    sim = desc_a @ desc_b.T  # (Ka, Kb) cosine similarity
    neg = -jnp.inf
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, neg)

    # Top-2 along b for the ratio test, as two max reductions — NOT
    # lax.top_k(sim, 2), which lowers to a full per-row sort (Ka sorts of Kb
    # lanes; the dominant cost of the whole matcher at 4096 features).
    # L2^2 = 2 - 2*sim for unit vectors.
    m1 = jnp.max(sim, axis=1)
    best_b = jnp.argmax(sim, axis=1)
    m2 = jnp.max(
        jnp.where(jnp.arange(sim.shape[1])[None, :] == best_b[:, None], neg, sim),
        axis=1,
    )
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * m1, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * m2, 0.0))
    ratio_ok = d1 < ratio * d2

    # Mutual check: a must be b's best too.
    best_a_of_b = jnp.argmax(sim, axis=0)  # (Kb,)
    mutual = best_a_of_b[best_b] == jnp.arange(sim.shape[0])

    ok = ratio_ok & mutual & valid_a & (m1 > neg)
    score = jnp.where(ok, m1, -jnp.inf)
    top_scores, sel_a = jax.lax.top_k(score, min(max_matches, score.shape[0]))
    pairs = jnp.stack([sel_a, best_b[sel_a]], axis=-1).astype(jnp.int32)
    return Matches(idx=pairs, valid=jnp.isfinite(top_scores))


@functools.partial(jax.jit, static_argnames=("max_matches", "chunk"))
def _match_pairs_vmapped(desc, valid, pa, pb, ratio, max_matches, chunk):
    def one(a, b):
        return match_descriptors(desc[a], valid[a], desc[b], valid[b],
                                 ratio=ratio, max_matches=max_matches)

    return jax.vmap(one)(pa, pb)


def match_descriptors_pairs(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    pairs: np.ndarray,
    ratio: float = 0.8,
    max_matches: int = 2048,
    chunk: int = 32,
) -> Matches:
    """Batched pair matching: desc (N, K, 128), valid (N, K), pairs (P, 2) ->
    Matches with leading pair axis. One dispatch per `chunk` pairs — per-pair
    dispatch latency dominates on remote-tunnel TPU setups."""
    outs = []
    p = len(pairs)
    for i in range(0, p, chunk):
        blk = pairs[i:i + chunk]
        pad = chunk - len(blk)
        if pad:
            blk = np.concatenate([blk, np.tile(blk[-1:], (pad, 1))])
        m = _match_pairs_vmapped(
            desc, valid, jnp.asarray(blk[:, 0]), jnp.asarray(blk[:, 1]),
            ratio, max_matches, chunk,
        )
        outs.append(jax.tree.map(lambda a: a[:chunk - pad] if pad else a, m))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


@functools.partial(jax.jit, static_argnames=("max_matches",))
def guided_match(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    xy_a_n: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    xy_b_n: jnp.ndarray,
    E: jnp.ndarray,
    epipolar_threshold: float,
    min_similarity: float = 0.8,
    max_matches: int = 2048,
) -> Matches:
    """Epipolar-guided re-matching (COLMAP's guided matching analog).

    Once a pair's essential matrix is verified, re-match with the epipolar
    constraint as a gate instead of the ratio test: candidates are all descriptor
    pairs that are both similar enough and Sampson-consistent with E; keep mutual
    best. Recovers matches the conservative ratio test dropped, which lengthens
    tracks and stiffens bundle adjustment."""
    sim = desc_a @ desc_b.T  # (Ka, Kb)

    ones_a = jnp.ones_like(xy_a_n[:, :1])
    ones_b = jnp.ones_like(xy_b_n[:, :1])
    p1 = jnp.concatenate([xy_a_n, ones_a], axis=-1)  # (Ka, 3)
    p2 = jnp.concatenate([xy_b_n, ones_b], axis=-1)  # (Kb, 3)
    Ep1 = p1 @ E.T  # (Ka, 3)
    Etp2 = p2 @ E  # (Kb, 3)
    num = (Ep1 @ p2.T) ** 2  # (Ka, Kb): (p2^T E p1)^2 transposed layout
    den = (
        (Ep1[:, 0] ** 2 + Ep1[:, 1] ** 2)[:, None]
        + (Etp2[:, 0] ** 2 + Etp2[:, 1] ** 2)[None, :]
    )
    sampson = num / jnp.maximum(den, 1e-12)

    ok = (
        (sampson < epipolar_threshold**2)
        & (sim > min_similarity)
        & valid_a[:, None]
        & valid_b[None, :]
    )
    gated = jnp.where(ok, sim, -jnp.inf)
    # Ratio test *within* the epipolar-gated candidates: without it, anything
    # lying along the epipolar line matches freely and floods the tracks.
    best_sim = jnp.max(gated, axis=1)  # two max reductions, not a per-row sort
    best_b = jnp.argmax(gated, axis=1)
    second = jnp.max(
        jnp.where(jnp.arange(gated.shape[1])[None, :] == best_b[:, None],
                  -jnp.inf, gated),
        axis=1,
    )
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best_sim, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 0.0))
    ratio_ok = jnp.where(jnp.isfinite(second), d1 < 0.9 * d2, True)
    best_a_of_b = jnp.argmax(gated, axis=0)
    mutual = best_a_of_b[best_b] == jnp.arange(desc_a.shape[0])
    good = mutual & ratio_ok & jnp.isfinite(best_sim)
    score = jnp.where(good, best_sim, -jnp.inf)
    top_scores, sel_a = jax.lax.top_k(score, min(max_matches, score.shape[0]))
    pairs = jnp.stack([sel_a, best_b[sel_a]], axis=-1).astype(jnp.int32)
    return Matches(idx=pairs, valid=jnp.isfinite(top_scores))


@functools.partial(jax.jit, static_argnames=("max_matches",))
def _guided_match_vmapped(desc, valid, xy_n, pa, pb, Es, epipolar_thresholds,
                          max_matches):
    def one(a, b, E, thr):
        return guided_match(desc[a], valid[a], xy_n[a], desc[b], valid[b],
                            xy_n[b], E, thr, max_matches=max_matches)

    return jax.vmap(one)(pa, pb, Es, epipolar_thresholds)


def guided_match_pairs(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    xy_n: jnp.ndarray,
    pairs: np.ndarray,
    Es: np.ndarray,
    epipolar_thresholds: np.ndarray,
    max_matches: int = 2048,
    chunk: int = 16,
) -> Matches:
    """Batched guided re-matching: desc (N,K,128), valid (N,K), xy_n (N,K,2)
    normalized coords, pairs (P,2), Es (P,3,3). One dispatch per `chunk` pairs
    (the per-pair host loop dominated SfM wall-clock through the tunnel)."""
    outs = []
    p = len(pairs)
    for i in range(0, p, chunk):
        blk = pairs[i:i + chunk]
        eb = Es[i:i + chunk]
        tb = epipolar_thresholds[i:i + chunk]
        pad = chunk - len(blk)
        if pad:
            blk = np.concatenate([blk, np.tile(blk[-1:], (pad, 1))])
            eb = np.concatenate([eb, np.tile(eb[-1:], (pad, 1, 1))])
            tb = np.concatenate([tb, np.tile(tb[-1:], pad)])
        m = _guided_match_vmapped(
            desc, valid, xy_n, jnp.asarray(blk[:, 0]), jnp.asarray(blk[:, 1]),
            jnp.asarray(eb), jnp.asarray(tb), max_matches,
        )
        outs.append(jax.tree.map(lambda a: a[:chunk - pad] if pad else a, m))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


def sequential_pairs(n: int, overlap: int = 10, loop_closure: bool = True) -> np.ndarray:
    """COLMAP sequential-matcher pair list: window + power-of-2 links."""
    pairs = set()
    for i in range(n):
        for d in range(1, overlap + 1):
            if i + d < n:
                pairs.add((i, i + d))
        if loop_closure:
            d = overlap * 2
            while i + d < n:
                pairs.add((i, i + d))
                d *= 2
    return np.array(sorted(pairs), dtype=np.int32).reshape(-1, 2)


def exhaustive_pairs(n: int) -> np.ndarray:
    return np.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], dtype=np.int32
    ).reshape(-1, 2)


def retrieval_pairs(descriptors: np.ndarray, valids: np.ndarray, k: int = 10) -> np.ndarray:
    """Vocab-tree analog: rank pairs by global-descriptor similarity.

    descriptors: (N, K, 128); valids: (N, K). Global descriptor = mean of local
    descriptors (a simple but effective VLAD-lite retrieval signal)."""
    n = descriptors.shape[0]
    w = valids[..., None].astype(np.float32)
    g = (descriptors * w).sum(1) / np.maximum(w.sum(1), 1.0)
    g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-8)
    sim = g @ g.T
    np.fill_diagonal(sim, -np.inf)
    pairs = set()
    for i in range(n):
        for j in np.argsort(-sim[i])[:k]:
            a, b = min(i, int(j)), max(i, int(j))
            pairs.add((a, b))
    return np.array(sorted(pairs), dtype=np.int32).reshape(-1, 2)


def spatial_pairs(positions: Optional[np.ndarray], n: int, k: int = 10,
                  descriptors: Optional[np.ndarray] = None,
                  valids: Optional[np.ndarray] = None) -> np.ndarray:
    """Spatial matcher: k-nearest by position prior; retrieval fallback."""
    if positions is None:
        if descriptors is not None:
            return retrieval_pairs(descriptors, valids, k=k)
        return sequential_pairs(n)
    pairs = set()
    for i in range(n):
        d = np.linalg.norm(positions - positions[i], axis=-1)
        d[i] = np.inf
        for j in np.argsort(d)[:k]:
            a, b = min(i, int(j)), max(i, int(j))
            pairs.add((a, b))
    return np.array(sorted(pairs), dtype=np.int32).reshape(-1, 2)


def select_pairs(
    method: str,
    n: int,
    exhaustive_max_images: int = 20,
    positions: Optional[np.ndarray] = None,
    descriptors: Optional[np.ndarray] = None,
    valids: Optional[np.ndarray] = None,
    overlap: int = 10,
    k: int = 10,
) -> np.ndarray:
    """Pair policy dispatch with the reference's small-set exhaustive override."""
    if n <= exhaustive_max_images:
        return exhaustive_pairs(n)
    if method == "exhaustive":
        return exhaustive_pairs(n)
    if method == "sequential":
        return sequential_pairs(n, overlap=overlap)
    if method == "spatial":
        return spatial_pairs(positions, n, k=k, descriptors=descriptors, valids=valids)
    if method in ("vocab", "vocab_tree", "retrieval"):
        if descriptors is None:
            return sequential_pairs(n, overlap=overlap)
        return retrieval_pairs(descriptors, valids, k=k)
    raise ValueError(f"unknown matching method {method!r}")
