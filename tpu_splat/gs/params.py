"""Splat training parameters: fixed-capacity arrays + alive mask.

TPU-native state layout: instead of growing/shrinking tensors per densification
(which would recompile XLA programs), parameters live in fixed-capacity arrays with
an `alive` mask. Densify/prune are pure jitted array ops that move gaussians
between slots; capacity grows geometrically on the host only when occupancy
crosses a threshold (one recompile per growth, a handful per run).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from tpu_splat.core.types import GaussianCloud, SH_DIM_FOR_DEGREE
from tpu_splat.gs.sh import SH_C0

Params = Dict[str, jnp.ndarray]  # means, scales, quats, opacities, sh0, shN, alive


def knn_mean_dist(points: np.ndarray, k: int = 3, chunk: int = 2048) -> np.ndarray:
    """Mean distance to the k nearest neighbors (excluding self), chunked O(N^2)."""
    n = points.shape[0]
    out = np.empty(n, np.float32)
    for i in range(0, n, chunk):
        d2 = np.sum((points[i : i + chunk, None] - points[None]) ** 2, axis=-1)
        np.fill_diagonal(d2[:, i : i + chunk], np.inf)
        kk = min(k, n - 1)
        nearest = np.partition(d2, kk - 1, axis=1)[:, :kk]
        out[i : i + chunk] = np.sqrt(np.maximum(nearest, 1e-12)).mean(axis=1)
    return out


def init_params_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
) -> Params:
    """Standard 3DGS initialization from an SfM sparse cloud.

    points (P, 3); colors (P, 3) in [0, 1]. Capacity >= P; remaining slots dead.
    """
    p = points.shape[0]
    if capacity < p:
        raise ValueError(f"capacity {capacity} < {p} points")
    k = SH_DIM_FOR_DEGREE[sh_degree]

    dist = np.clip(knn_mean_dist(points), 1e-7, None)
    means = np.zeros((capacity, 3), np.float32)
    means[:p] = points
    scales = np.zeros((capacity, 3), np.float32)
    scales[:p] = np.log(dist)[:, None]
    quats = np.zeros((capacity, 4), np.float32)
    quats[:, 0] = 1.0
    opac = np.full((capacity,), float(np.log(init_opacity / (1 - init_opacity))), np.float32)
    sh0 = np.zeros((capacity, 3), np.float32)
    sh0[:p] = (np.clip(colors, 0, 1) - 0.5) / SH_C0
    shn = np.zeros((capacity, k, 3), np.float32)
    alive = np.zeros((capacity,), bool)
    alive[:p] = True

    return {
        "means": jnp.asarray(means),
        "scales": jnp.asarray(scales),
        "quats": jnp.asarray(quats),
        "opacities": jnp.asarray(opac),
        "sh0": jnp.asarray(sh0),
        "shN": jnp.asarray(shn),
        "alive": jnp.asarray(alive),
    }


def params_to_cloud(params: Params) -> GaussianCloud:
    """Extract alive gaussians into an interchange GaussianCloud (host-side)."""
    alive = np.asarray(params["alive"])
    idx = np.nonzero(alive)[0]
    return GaussianCloud(
        means=np.asarray(params["means"])[idx],
        scales=np.asarray(params["scales"])[idx],
        quats=np.asarray(params["quats"])[idx],
        opacities=np.asarray(params["opacities"])[idx],
        sh0=np.asarray(params["sh0"])[idx],
        shN=np.asarray(params["shN"])[idx],
    )


def grow_capacity(params: Params, new_capacity: int) -> Params:
    """Pad all arrays to a larger capacity (host-side, triggers one recompile)."""
    cap = params["means"].shape[0]
    if new_capacity <= cap:
        return params
    pad = new_capacity - cap
    out = {}
    for name, arr in params.items():
        pad_width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        if name == "quats":
            filler = jnp.zeros((pad, 4), arr.dtype).at[:, 0].set(1.0)
            out[name] = jnp.concatenate([arr, filler], axis=0)
        else:
            out[name] = jnp.pad(arr, pad_width)
    return out


def num_alive(params: Params) -> int:
    return int(jnp.sum(params["alive"]))


def grow_tree(tree, new_capacity: int):
    """Pad every array in a dict pytree (e.g. Adam moments) along axis 0 with zeros
    to the new capacity — preserves optimizer state across capacity growth."""
    out = {}
    for name, arr in tree.items():
        cap = arr.shape[0]
        pad_width = [(0, new_capacity - cap)] + [(0, 0)] * (arr.ndim - 1)
        out[name] = jnp.pad(arr, pad_width)
    return out
