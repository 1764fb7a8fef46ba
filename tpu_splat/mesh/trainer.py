"""Multi-chip training driver.

Wraps the SPMD step from distributed.py into the same host-side loop as the
single-chip Trainer: per-iteration view batches (one view per data-shard),
periodic densification (the same jitted refine pass runs directly on the
sharded arrays — GSPMD partitions its sorts/cumsums, no host round-trip),
opacity resets, masked-capture losses, per-view camera-pose optimization, and
checkpointing.
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
        masks: Optional[np.ndarray] = None,  # (M, H, W) subject masks
        log_fn: Optional[Callable[[str], None]] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(n_gauss=n_gauss)
        self.batch = self.mesh.shape["data"]
        self.cfg = cfg
        self.images = images
        self.masks = masks
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
        self._step_fn = {}
        self.checkpoint_dir: Optional[str] = None
        n_views = images.shape[0]
        self.cam_deltas = jnp.zeros((n_views, 6))
        self._cam_mu = jnp.zeros((n_views, 6))
        self._cam_nu = jnp.zeros((n_views, 6))

    def _get_step_fn(self):
        from tpu_splat.gs.trainer import effective_cfg

        deg = min(self.step // self.cfg.sh_degree_interval, self.cfg.sh_degree)
        cfg = effective_cfg(self.cfg, self.step)  # post-reset capacity boost
        key = (deg, cfg.max_per_tile)
        if key not in self._step_fn:  # cache per phase — the capacity boost
            # alternates every reset cycle and must not recompile each time
            self._step_fn[key] = make_distributed_train_step(
                self.mesh, cfg, self.width, self.height, deg,
                self.scene_scale, use_masks=self.masks is not None,
            )
        return self._step_fn[key]

    def run(self, steps: int):
        cfg = self.cfg
        rng = np.random.default_rng(17)
        n_views = self.images.shape[0]
        t0 = time.time()
        for _ in range(steps):
            views = rng.choice(n_views, size=self.batch, replace=n_views < self.batch)
            batch_imgs = jnp.asarray(self.images[views])
            batch_masks = (jnp.asarray(self.masks[views])
                           if self.masks is not None
                           else jnp.zeros((self.batch, 1, 1)))
            self.key, sub = jax.random.split(self.key)
            step_fn = self._get_step_fn()
            (self.params, self.adam, self.dstate, metrics,
             cam_grads) = step_fn(
                self.params, self.adam, self.dstate, batch_imgs,
                self.viewmats[views], self.intrinsics[views],
                batch_masks, self.cam_deltas[views],
                jnp.asarray(self.step), sub,
            )
            if cfg.optimize_camera_poses:
                self._update_cameras(views, cam_grads)
            self.step += 1
            self._maybe_refine()
            if (self.checkpoint_dir
                    and self.step % cfg.checkpoint_every == 0):
                self.save_checkpoint(self.checkpoint_dir)
            if self.step % cfg.eval_every == 0:
                self.log(
                    f"step {self.step}: loss={float(metrics['loss']):.4f} "
                    f"alive={num_alive(self.params)} "
                    f"({self.step / (time.time() - t0):.1f} it/s x{self.batch} views)"
                )

    def _update_cameras(self, views: np.ndarray, grads: jnp.ndarray):
        """Adam update of the sampled views' se(3) deltas (host-side, tiny)."""
        cfg = self.cfg
        b1, b2, eps = 0.9, 0.999, 1e-8
        t = max(self.step + 1, 1)
        for view, grad in zip(np.asarray(views), grads):
            mu = b1 * self._cam_mu[view] + (1 - b1) * grad
            nu = b2 * self._cam_nu[view] + (1 - b2) * grad * grad
            step_v = (cfg.lr_camera * (mu / (1 - b1**t))
                      / (jnp.sqrt(nu / (1 - b2**t)) + eps))
            self._cam_mu = self._cam_mu.at[view].set(mu)
            self._cam_nu = self._cam_nu.at[view].set(nu)
            self.cam_deltas = self.cam_deltas.at[view].add(-step_v)

    def adjusted_viewmats(self) -> np.ndarray:
        """World-to-camera matrices with the learned pose corrections applied."""
        from tpu_splat.gs.trainer import apply_camera_delta

        return np.stack([
            np.asarray(apply_camera_delta(self.viewmats[i], self.cam_deltas[i]))
            for i in range(self.viewmats.shape[0])
        ])

    def _maybe_refine(self):
        cfg = self.cfg
        d = cfg.densify
        if not (d.refine_start <= self.step < d.refine_stop):
            return
        if self.step % d.refine_every == 0:
            # refine is pure jitted array ops — run it directly on the sharded
            # arrays (GSPMD partitions its sorts/cumsums over the mesh; no
            # host gather/reshard round-trip), then pin the mesh layout back.
            self.key, sub = jax.random.split(self.key)
            new_params, new_adam, new_dstate, _ = refine(
                self.params, self.adam, self.dstate, sub,
                jnp.asarray(self.scene_scale), d, jnp.asarray(self.step),
            )
            self.params = shard_params(new_params, self.mesh)
            self.adam = self._reshard_adam(new_adam)
            self.dstate = self._reshard_dstate(new_dstate)
        if self.step % d.reset_opacity_every == 0:
            new_params, new_adam = reset_opacity(
                self.params, self.adam, d.reset_opacity_value
            )
            self.params = shard_params(new_params, self.mesh)
            self.adam = self._reshard_adam(new_adam)

    def _reshard_adam(self, adam: AdamState) -> AdamState:
        return AdamState(
            mu=shard_params(adam.mu, self.mesh),
            nu=shard_params(adam.nu, self.mesh),
            count=adam.count,
        )

    def _reshard_dstate(self, dstate):
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(self.mesh, P("gauss"))
        from tpu_splat.gs.strategy import DensifyState

        return DensifyState(
            grad_accum=jax.device_put(dstate.grad_accum, sh),
            count_accum=jax.device_put(dstate.count_accum, sh),
        )

    def host_params(self) -> Params:
        return {k: jnp.asarray(jax.device_get(v)) for k, v in self.params.items()}

    def cloud(self):
        return params_to_cloud(self.host_params())

    # ---------- checkpointing (orbax; state gathered to host, resharded on
    # restore — same layout as the single-chip Trainer minus camera deltas) ----

    def _ckpt_state(self):
        return {
            "params": self.host_params(),
            "adam_mu": {k: jnp.asarray(jax.device_get(v))
                        for k, v in self.adam.mu.items()},
            "adam_nu": {k: jnp.asarray(jax.device_get(v))
                        for k, v in self.adam.nu.items()},
            "adam_count": jnp.asarray(jax.device_get(self.adam.count)),
            "dstate_grad": jnp.asarray(jax.device_get(self.dstate.grad_accum)),
            "dstate_count": jnp.asarray(jax.device_get(self.dstate.count_accum)),
            "cam_deltas": self.cam_deltas,
            "cam_mu": self._cam_mu,
            "cam_nu": self._cam_nu,
            "step": jnp.asarray(self.step),
            "key": jnp.asarray(jax.device_get(self.key)),
        }

    def save_checkpoint(self, directory: str):
        import json
        import os

        import orbax.checkpoint as ocp

        from tpu_splat.gs.trainer import Trainer

        path = os.path.abspath(os.path.join(directory, f"step_{self.step:08d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, Trainer._sanitize(self._ckpt_state()), force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(os.path.dirname(path),
                               f"meta_{self.step:08d}.json"), "w") as f:
            json.dump({"capacity": int(self.params["means"].shape[0]),
                       "n_views": int(self.cam_deltas.shape[0]),
                       "step": self.step}, f)
        self.log(f"checkpoint saved: {path}")

    def load_checkpoint(self, directory: str, step: Optional[int] = None):
        import os

        import orbax.checkpoint as ocp

        from tpu_splat.gs.optim import AdamState
        from tpu_splat.gs.strategy import DensifyState
        from tpu_splat.gs.trainer import Trainer

        root = os.path.abspath(directory)
        if step is None:
            steps = sorted(
                int(d.split("_")[1]) for d in os.listdir(root)
                if d.startswith("step_")
            )
            if not steps:
                raise FileNotFoundError(f"no checkpoints under {root}")
            step = steps[-1]
        path = os.path.join(root, f"step_{step:08d}")
        ckptr = ocp.StandardCheckpointer()
        template = self._ckpt_state()
        restored = ckptr.restore(path, Trainer._sanitize(template))
        state = jax.tree.map(
            lambda orig, new: orig if orig.size == 0 else new, template, restored
        )
        # orbax returns committed single-device arrays; detach to host so the
        # resharded state places cleanly on the mesh
        state = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), state)
        self.params = shard_params(state["params"], self.mesh)
        self.adam = AdamState(
            mu=shard_params(state["adam_mu"], self.mesh),
            nu=shard_params(state["adam_nu"], self.mesh),
            count=state["adam_count"],
        )
        self.dstate = self._reshard_dstate(
            DensifyState(grad_accum=state["dstate_grad"],
                         count_accum=state["dstate_count"])
        )
        self.cam_deltas = state["cam_deltas"]
        self._cam_mu = state["cam_mu"]
        self._cam_nu = state["cam_nu"]
        self.step = int(state["step"])
        self.key = state["key"]
        self.log(f"checkpoint restored: {path}")
