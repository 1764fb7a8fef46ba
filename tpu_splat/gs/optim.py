"""Adam optimizer with slot-level control for densification.

A hand-rolled Adam (equivalent to optax.adam per parameter group) that exposes its
moments as plain arrays so the densification strategy can re-zero moments when
gaussians move between capacity slots, and supports *selective* updates (only
gaussians visible in the current view get moment/param updates — the
selective_adam idea the reference enables for 3DGRUT, main.py:1362).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    count: jnp.ndarray  # scalar int32


# The SH-rest FIRST moment is stored in bf16: shN is 45 of the 60 per-gaussian
# state channels, the optimizer step is HBM-bandwidth-bound on TPU, and with
# b1=0.9 the per-step 10% increments survive bf16 round-to-nearest. The second
# moment must stay f32: its (1-b2)=1e-3 increments fall below bf16 resolution
# (~2^-9) near steady state, so a bf16 nu freezes and stops tracking
# gradient-scale decay (update absorption). Math stays f32 either way.
_BF16_MU = ("shN",)


def adam_init(params: Params, skip: tuple = ("alive",)) -> AdamState:
    def zeros(v, bf16: bool):
        return jnp.zeros(v.shape, jnp.bfloat16 if bf16 else v.dtype)

    mu = {k: zeros(v, k in _BF16_MU) for k, v in params.items() if k not in skip}
    nu = {k: zeros(v, False) for k, v in params.items() if k not in skip}
    return AdamState(mu=mu, nu=nu, count=jnp.zeros((), jnp.int32))


def adam_update(
    params: Params,
    grads: Params,
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    visible: Optional[jnp.ndarray] = None,
) -> tuple[Params, AdamState]:
    """One Adam step. lrs maps param name -> scalar lr (may be traced values).

    If `visible` (N,) bool is given, only those rows get moment and parameter
    updates; hidden gaussians are left untouched (selective adam).
    """
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - b1**c
    bc2 = 1.0 - b2**c

    new_params = dict(params)
    new_mu, new_nu = {}, {}
    for name in state.mu:
        g = grads[name]
        mu = b1 * state.mu[name].astype(g.dtype) + (1 - b1) * g
        nu = b2 * state.nu[name].astype(g.dtype) + (1 - b2) * (g * g)
        step = lrs[name] * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        if visible is not None:
            vis = visible.reshape((-1,) + (1,) * (g.ndim - 1))
            mu = jnp.where(vis, mu, state.mu[name].astype(g.dtype))
            nu = jnp.where(vis, nu, state.nu[name].astype(g.dtype))
            step = jnp.where(vis, step, 0.0)
        new_mu[name] = mu.astype(state.mu[name].dtype)
        new_nu[name] = nu.astype(state.nu[name].dtype)
        new_params[name] = params[name] - step
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def reset_slots(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero first/second moments for slots where mask is True (new gaussians)."""

    def z(tree):
        return {
            k: jnp.where(mask.reshape((-1,) + (1,) * (v.ndim - 1)), 0.0, v)
            for k, v in tree.items()
        }

    return AdamState(mu=z(state.mu), nu=z(state.nu), count=state.count)
