"""MCMC densification strategy (3DGS-as-MCMC), the splatfacto-mcmc analog.

Fixed-capacity by construction — ideal for TPU static shapes. Instead of
split/duplicate, dead (transparent) gaussians are *relocated* to samples drawn
from the live population (probability proportional to opacity), and every step the
means receive covariance-shaped exploration noise gated by opacity (SGLD-style).

The reference reaches this strategy through gsplat's `simple_trainer.py mcmc`
(main.py:1317-1347); the relocation opacity correction here uses the two-sample
case of the MCMC paper's binomial correction.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tpu_splat.gs.optim import AdamState, reset_slots
from tpu_splat.gs.projection import quat_to_rotmat

Params = Dict[str, jnp.ndarray]


@dataclass(frozen=True)
class MCMCConfig:
    min_opacity: float = 0.005
    noise_lr: float = 5e5  # noise scale multiplier (gsplat default)
    grow_fraction: float = 0.05  # fraction of capacity to activate per refine


@functools.partial(jax.jit, static_argnames=("cfg",))
def add_noise(params: Params, key: jax.Array, lr_means: float, cfg: MCMCConfig) -> Params:
    """Add opacity-gated, covariance-shaped positional noise (exploration term)."""
    op = jax.nn.sigmoid(params["opacities"])
    gate = jax.nn.sigmoid(-100.0 * (op - cfg.min_opacity * 2))
    R = quat_to_rotmat(params["quats"])
    std = jnp.exp(params["scales"])
    eps = jax.random.normal(key, params["means"].shape)
    noise = jnp.einsum("nij,nj->ni", R, eps * std)
    noise = noise * (gate * cfg.noise_lr * lr_means)[:, None]
    noise = jnp.where(params["alive"][:, None], noise, 0.0)
    return {**params, "means": params["means"] + noise}


@functools.partial(jax.jit, static_argnames=("cfg",))
def relocate_and_grow(
    params: Params, adam_state: AdamState, key: jax.Array, cfg: MCMCConfig
) -> Tuple[Params, AdamState]:
    """Relocate transparent gaussians onto samples from the live population, and
    activate a budgeted number of dead capacity slots the same way."""
    capacity = params["means"].shape[0]
    alive = params["alive"]
    op = jax.nn.sigmoid(params["opacities"])

    # Targets: dead slots plus transparent live ones, budgeted per refine.
    transparent = alive & (op < cfg.min_opacity)
    grow_budget = int(capacity * cfg.grow_fraction)
    dead = ~alive
    dead_rank = jnp.cumsum(dead) - 1
    grow = dead & (dead_rank < grow_budget)
    target = transparent | grow

    # Sources: sample live gaussians with probability ~ opacity.
    probs = jnp.where(alive & ~transparent, op, 0.0)
    probs = probs / jnp.maximum(jnp.sum(probs), 1e-12)
    src = jax.random.choice(key, capacity, shape=(capacity,), p=probs)

    # Two-sample binomial opacity correction: each of the pair gets
    # 1 - sqrt(1 - o). Applied to both the source and its copy.
    src_op = op[src]
    new_op = 1.0 - jnp.sqrt(jnp.clip(1.0 - src_op, 1e-6, 1.0))
    new_logit = jnp.log(new_op / (1.0 - new_op))

    new_params = dict(params)
    for name in ("means", "scales", "quats", "sh0", "shN"):
        v = params[name]
        new_params[name] = jnp.where(
            target.reshape((-1,) + (1,) * (v.ndim - 1)), v[src], v
        )
    new_params["opacities"] = jnp.where(target, new_logit, params["opacities"])
    # Source slots that were actually copied from also get the corrected opacity.
    copied_from = jnp.zeros((capacity,), bool).at[jnp.where(target, src, capacity)].set(
        True, mode="drop"
    )
    new_params["opacities"] = jnp.where(
        copied_from,
        jnp.log(
            jnp.clip(
                1.0 - jnp.sqrt(jnp.clip(1.0 - op, 1e-6, 1.0)), 1e-6, 1.0 - 1e-6
            )
            / jnp.clip(jnp.sqrt(jnp.clip(1.0 - op, 1e-6, 1.0)), 1e-6, None)
        ),
        new_params["opacities"],
    )
    new_params["alive"] = alive | target

    adam_state = reset_slots(adam_state, target | copied_from)
    return new_params, adam_state
