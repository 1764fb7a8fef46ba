"""Densification / pruning strategies for 3DGS training.

TPU-native port of the classic 3DGS "default" adaptive-density strategy (and the
MCMC variant, see mcmc.py): all operations are pure jitted array ops over
fixed-capacity slot arrays — split/duplicate targets are allocated into dead slots
with a cumsum ranking + scatter, so the compiled program never changes shape.

Semantics follow the gsplat/splatfacto defaults the reference trains with
(main.py:1270-1347): refine every 100 steps in [500, 15000), screen-gradient
threshold 2e-4 (NDC), split when scale > 1% of scene extent, prune at opacity
< 0.005, opacity reset every 3000 steps.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpu_splat.gs.optim import AdamState, reset_slots
from tpu_splat.gs.projection import quat_to_rotmat

Params = Dict[str, jnp.ndarray]


@dataclass(frozen=True)
class DensifyConfig:
    refine_start: int = 500
    refine_stop: int = 15000
    refine_every: int = 100
    grad_threshold: float = 0.0002  # NDC-units screen gradient
    split_scale_threshold: float = 0.01  # x scene_scale: bigger -> split, else duplicate
    prune_opacity: float = 0.005
    prune_scale3d: float = 0.1  # x scene_scale: prune world-space giants
    reset_opacity_every: int = 3000
    reset_opacity_value: float = 0.01
    split_factor: float = 1.6


class DensifyState(NamedTuple):
    grad_accum: jnp.ndarray  # (N,) accumulated NDC gradient norms
    count_accum: jnp.ndarray  # (N,) number of steps each gaussian was visible


def densify_state_init(capacity: int) -> DensifyState:
    return DensifyState(
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        count_accum=jnp.zeros((capacity,), jnp.float32),
    )


def accumulate_gradients(
    state: DensifyState,
    means2d_grad: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
) -> DensifyState:
    """Accumulate screen-space gradient norms (converted to NDC units)."""
    g = means2d_grad * jnp.array([width / 2.0, height / 2.0])
    norm = jnp.linalg.norm(g, axis=-1)
    visible = radii > 0
    return DensifyState(
        grad_accum=state.grad_accum + jnp.where(visible, norm, 0.0),
        count_accum=state.count_accum + visible.astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine(
    params: Params,
    adam_state: AdamState,
    dstate: DensifyState,
    key: jax.Array,
    scene_scale: jnp.ndarray,
    cfg: DensifyConfig,
    step: jnp.ndarray = jnp.zeros((), jnp.int32),
) -> Tuple[Params, AdamState, DensifyState, Dict[str, jnp.ndarray]]:
    """One densify+prune pass. Returns updated (params, adam, dstate, stats)."""
    capacity = params["means"].shape[0]
    alive = params["alive"]

    avg_grad = dstate.grad_accum / jnp.maximum(dstate.count_accum, 1.0)
    seen = dstate.count_accum > 0
    candidate = alive & seen & (avg_grad > cfg.grad_threshold)

    scale_max = jnp.exp(jnp.max(params["scales"], axis=-1))
    is_split = candidate & (scale_max > cfg.split_scale_threshold * scene_scale)
    is_dup = candidate & ~is_split

    # Prune: transparent gaussians always; world-space oversized ones only after the
    # first opacity reset (the default-strategy schedule — pruning giants earlier
    # would wipe out the sparse knn-scaled initialization).
    opac = jax.nn.sigmoid(params["opacities"])
    prune_big = (scale_max > cfg.prune_scale3d * scene_scale) & (
        step > cfg.reset_opacity_every
    )
    prune = alive & ((opac < cfg.prune_opacity) | prune_big)
    is_split = is_split & ~prune
    is_dup = is_dup & ~prune
    alive = alive & ~prune

    # Slot allocation: each split or dup requests exactly one dead slot.
    request = is_split | is_dup
    rank = jnp.cumsum(request) - 1  # (N,) rank among requesters
    dead_sorted = jnp.argsort(alive)  # dead slots first (False < True)
    n_dead = jnp.sum(~alive)
    granted = request & (rank < n_dead)
    # Target slot per gaussian; invalid requesters scatter out of range (dropped).
    target = jnp.where(granted, dead_sorted[jnp.clip(rank, 0, capacity - 1)], capacity)

    # Child values. For splits both the in-place parent and the new child are
    # resampled inside the parent gaussian with scales shrunk by split_factor.
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(params["quats"])  # (N, 3, 3)
    std = jnp.exp(params["scales"])

    def sample_offset(k):
        local = jax.random.normal(k, (capacity, 3)) * std
        return jnp.einsum("nij,nj->ni", R, local)

    split_scales = params["scales"] - jnp.log(cfg.split_factor)

    # Values written to the NEW slot (child2 for splits, plain copy for dups).
    child = {
        "means": jnp.where(
            is_split[:, None], params["means"] + sample_offset(k1), params["means"]
        ),
        "scales": jnp.where(is_split[:, None], split_scales, params["scales"]),
        "quats": params["quats"],
        "opacities": params["opacities"],
        "sh0": params["sh0"],
        "shN": params["shN"],
    }
    # In-place updates for split parents (child1).
    new_params = dict(params)
    new_params["means"] = jnp.where(
        is_split[:, None], params["means"] + sample_offset(k2), params["means"]
    )
    new_params["scales"] = jnp.where(is_split[:, None], split_scales, params["scales"])

    # Scatter children into granted slots.
    for name, vals in child.items():
        new_params[name] = new_params[name].at[target].set(vals, mode="drop")
    new_alive = alive.at[target].set(granted, mode="drop")
    new_params["alive"] = new_alive

    # Reset optimizer moments for changed slots: split parents and all new slots.
    moved = jnp.zeros((capacity,), bool).at[target].set(granted, mode="drop")
    adam_state = reset_slots(adam_state, moved | is_split | prune)

    stats = {
        "n_split": jnp.sum(is_split & granted),
        "n_dup": jnp.sum(is_dup & granted),
        "n_pruned": jnp.sum(prune),
        "n_alive": jnp.sum(new_alive),
    }
    return new_params, adam_state, densify_state_init(capacity), stats


@jax.jit
def reset_opacity(
    params: Params, adam_state: AdamState, value: float = 0.01
) -> Tuple[Params, AdamState]:
    """Clamp opacities to at most `value` (in probability space) and clear the
    opacity optimizer moments — the periodic opacity reset of the default strategy."""
    logit = jnp.log(value / (1.0 - value))
    new = dict(params)
    new["opacities"] = jnp.minimum(params["opacities"], logit)
    mu = dict(adam_state.mu)
    nu = dict(adam_state.nu)
    mu["opacities"] = jnp.zeros_like(mu["opacities"])
    nu["opacities"] = jnp.zeros_like(nu["opacities"])
    return new, AdamState(mu=mu, nu=nu, count=adam_state.count)
