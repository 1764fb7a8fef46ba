"""Multi-chip training driver.

Wraps the SPMD step from distributed.py into the same host-side loop as the
single-chip Trainer: per-iteration view batches (one view per data-shard),
periodic densification (parameters are gathered to host, refined with the same
jitted refine pass, and resharded — refine runs every ~100 steps so the
transfer amortizes), opacity resets, and checkpointing.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.gs.optim import AdamState, adam_init
from tpu_splat.gs.params import Params, num_alive, params_to_cloud
from tpu_splat.gs.strategy import densify_state_init, refine, reset_opacity
from tpu_splat.gs.trainer import TrainConfig
from tpu_splat.mesh.distributed import (
    make_distributed_train_step,
    make_mesh,
    shard_params,
)


class DistributedTrainer:
    """Data-parallel (x gaussian-sharded) training over a device mesh."""

    def __init__(
        self,
        params: Params,
        images: np.ndarray,
        viewmats: np.ndarray,
        intrinsics: np.ndarray,
        scene_scale: float,
        cfg: TrainConfig,
        mesh=None,
        n_gauss: int = 1,
        seed: int = 0,
        log_fn: Optional[Callable[[str], None]] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(n_gauss=n_gauss)
        self.batch = self.mesh.shape["data"]
        self.cfg = cfg
        self.images = images
        self.viewmats = jnp.asarray(viewmats)
        self.intrinsics = jnp.asarray(intrinsics)
        self.scene_scale = float(scene_scale)
        self.height, self.width = images.shape[1:3]
        self.log = log_fn or (lambda s: None)
        self.key = jax.random.PRNGKey(seed)
        self.step = 0

        self.params = shard_params(params, self.mesh)
        self.adam = adam_init(self.params)
        self.dstate = densify_state_init(params["means"].shape[0])
        self._step_fn = None
        self._sh_deg = -1

    def _get_step_fn(self):
        deg = min(self.step // self.cfg.sh_degree_interval, self.cfg.sh_degree)
        if self._step_fn is None or deg != self._sh_deg:
            self._sh_deg = deg
            self._step_fn = make_distributed_train_step(
                self.mesh, self.cfg, self.width, self.height, deg,
                self.scene_scale,
            )
        return self._step_fn

    def run(self, steps: int):
        cfg = self.cfg
        rng = np.random.default_rng(17)
        n_views = self.images.shape[0]
        t0 = time.time()
        for _ in range(steps):
            views = rng.choice(n_views, size=self.batch, replace=n_views < self.batch)
            batch_imgs = jnp.asarray(self.images[views])
            self.key, sub = jax.random.split(self.key)
            step_fn = self._get_step_fn()
            self.params, self.adam, self.dstate, metrics = step_fn(
                self.params, self.adam, self.dstate, batch_imgs,
                self.viewmats[views], self.intrinsics[views],
                jnp.asarray(self.step), sub,
            )
            self.step += 1
            self._maybe_refine()
            if self.step % cfg.eval_every == 0:
                self.log(
                    f"step {self.step}: loss={float(metrics['loss']):.4f} "
                    f"alive={num_alive(self.params)} "
                    f"({self.step / (time.time() - t0):.1f} it/s x{self.batch} views)"
                )

    def _maybe_refine(self):
        cfg = self.cfg
        d = cfg.densify
        if not (d.refine_start <= self.step < d.refine_stop):
            return
        if self.step % d.refine_every == 0:
            # gather -> refine (same jitted pass as single-chip) -> reshard
            self.key, sub = jax.random.split(self.key)
            host_params = jax.tree.map(lambda a: jax.device_get(a), self.params)
            host_params = {k: jnp.asarray(v) for k, v in host_params.items()}
            host_params, self.adam, self.dstate, _ = refine(
                host_params, self._gather_adam(), self.dstate, sub,
                jnp.asarray(self.scene_scale), d, jnp.asarray(self.step),
            )
            self.params = shard_params(host_params, self.mesh)
            self.adam = self._reshard_adam(self.adam)
        if (self.step % d.reset_opacity_every == 0
                and d.refine_start <= self.step < d.refine_stop):
            host_params = {k: jnp.asarray(jax.device_get(v))
                           for k, v in self.params.items()}
            host_params, self.adam = reset_opacity(
                host_params, self._gather_adam(), d.reset_opacity_value
            )
            self.params = shard_params(host_params, self.mesh)
            self.adam = self._reshard_adam(self.adam)

    def _gather_adam(self) -> AdamState:
        return AdamState(
            mu={k: jnp.asarray(jax.device_get(v)) for k, v in self.adam.mu.items()},
            nu={k: jnp.asarray(jax.device_get(v)) for k, v in self.adam.nu.items()},
            count=self.adam.count,
        )

    def _reshard_adam(self, adam: AdamState) -> AdamState:
        return AdamState(
            mu=shard_params(adam.mu, self.mesh),
            nu=shard_params(adam.nu, self.mesh),
            count=adam.count,
        )

    def cloud(self):
        host = {k: jnp.asarray(jax.device_get(v)) for k, v in self.params.items()}
        return params_to_cloud(host)
