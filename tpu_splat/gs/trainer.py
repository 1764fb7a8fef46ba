"""3DGS training loop — the splatfacto/gsplat-trainer analog, TPU-native.

One jitted train step (render -> loss -> selective-Adam update) over fixed-capacity
parameter arrays; densification runs as a separate jitted refine pass on the same
static shapes. Model variants map to configs like the reference's model flag
(main.py:1245-1382): splatfacto, splatfacto-big, splatfacto-mcmc, splatfacto-w-light.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field, replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_splat.gs import mcmc as mcmc_mod
from tpu_splat.gs.losses import image_loss, opacity_entropy_loss, psnr, scale_regularization
from tpu_splat.gs.optim import AdamState, adam_init, adam_update
from tpu_splat.gs.params import Params, grow_capacity, num_alive, params_to_cloud
from tpu_splat.gs.render import render_view
from tpu_splat.gs.strategy import (
    DensifyConfig,
    DensifyState,
    accumulate_gradients,
    densify_state_init,
    refine,
    reset_opacity,
)


@dataclass(frozen=True)
class TrainConfig:
    max_steps: int = 30000
    sh_degree: int = 3
    sh_degree_interval: int = 1000  # raise active SH degree every N steps
    ssim_lambda: float = 0.2
    # learning rates (gsplat/splatfacto defaults)
    lr_means: float = 1.6e-4  # x scene_scale, exponentially decayed
    lr_means_final: float = 1.6e-6
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_sh0: float = 2.5e-3
    lr_shN: float = 2.5e-3 / 20.0
    densify: DensifyConfig = field(default_factory=DensifyConfig)
    strategy: str = "default"  # default | mcmc
    mcmc: "mcmc_mod.MCMCConfig" = field(default_factory=lambda: mcmc_mod.MCMCConfig())
    # Per-tile rasterizer capacity. 256 is bit-exact against an uncapped
    # render in the trained regime — the saturation exit fires before deeper
    # slots can matter (measured: scripts/exp_ksweep.py, 120dB vs K=1024 on a
    # tile-occupancy-~970 workload) — and runs ~1.45x faster than 512. The
    # one regime where deep slots still carry light is the window right after
    # an opacity reset (nothing saturates at op=0.01), so the capacity
    # temporarily rises to post_reset_max_per_tile there (gsplat's CUDA
    # rasterizer is uncapped, main.py:1317-1347; this keeps its fidelity
    # where it matters without paying for it everywhere).
    max_per_tile: int = 256
    post_reset_max_per_tile: int = 512
    post_reset_recover_steps: int = 500
    # Per-tile capacity before the FIRST opacity reset (the init regime:
    # sparse seed cloud, giant knn scales, nothing saturates) — see
    # effective_cfg. 0 = auto (4x max_per_tile, capped at 1024). Must be a
    # multiple of pallas_raster.CHUNK (128).
    warmup_max_per_tile: int = 0
    tile_size: int = 16
    random_background: bool = True
    scale_reg_weight: float = 0.0  # splatfacto use_scale_regularization analog
    opacity_reg_weight: float = 0.0  # -w-light alpha loss analog
    selective_adam: bool = False
    antialiased: bool = False
    grow_threshold: float = 0.95
    eval_every: int = 1000
    # Camera-pose optimization (splatfacto camera-optimizer analog): per-view
    # se(3) deltas trained jointly with the splat — absorbs residual SfM drift.
    optimize_camera_poses: bool = True
    lr_camera: float = 1e-4
    # Orbax checkpoints every N steps when a checkpoint_dir is set on the Trainer.
    checkpoint_every: int = 2000

    @classmethod
    def for_model(cls, model: str, max_steps: int = 30000) -> "TrainConfig":
        """Map the reference job-JSON model names to configs (main.py:1270-1382)."""
        base = cls(max_steps=max_steps)
        if model == "splatfacto":
            return base
        if model == "splatfacto-big":
            return replace(
                base,
                densify=replace(base.densify, grad_threshold=0.0001),
            )
        if model == "splatfacto-mcmc":
            return replace(base, strategy="mcmc")
        if model == "splatfacto-w-light":
            return replace(base, opacity_reg_weight=0.01, random_background=True)
        if model in ("3dgut", "3dgrt"):
            # Gaussian ray tracing models map onto the rasterizer with antialiasing
            # + selective adam (their distinguishing optimizer feature).
            return replace(base, antialiased=True, selective_adam=True)
        if model == "nerfacto":
            # The reference trains a NeRF here only to export a poisson mesh
            # (main.py:1408-1468); the analog trains splats normally and the
            # runner adds the mesh deliverables (export/mesh.py).
            return base
        raise ValueError(f"unknown model {model!r}")


def scale_schedule(cfg: TrainConfig, factor: int) -> TrainConfig:
    """gsplat --steps_scaler semantics (reference main.py:1322-1338): when each
    distributed step consumes `factor` views, shrink the step count AND every
    step-indexed milestone by the same factor so the shortened run traverses
    the identical schedule (SH ramp, densify window, opacity resets)."""
    if factor <= 1:
        return cfg

    def f(v: int) -> int:
        return max(int(v // factor), 1)

    return replace(
        cfg,
        max_steps=f(cfg.max_steps),
        sh_degree_interval=f(cfg.sh_degree_interval),
        eval_every=f(cfg.eval_every),
        checkpoint_every=f(cfg.checkpoint_every),
        post_reset_recover_steps=f(cfg.post_reset_recover_steps),
        densify=replace(
            cfg.densify,
            refine_start=f(cfg.densify.refine_start),
            refine_stop=f(cfg.densify.refine_stop),
            refine_every=f(cfg.densify.refine_every),
            reset_opacity_every=f(cfg.densify.reset_opacity_every),
        ),
    )


def effective_cfg(cfg: TrainConfig, step: int) -> TrainConfig:
    """The config to run `step` with: before the first opacity reset the
    per-tile capacity runs at warmup_max_per_tile, and within
    post_reset_recover_steps of a reset it rises to post_reset_max_per_tile
    (see the TrainConfig.max_per_tile note). Returns cfg itself in the steady
    state so jit sees one static config per phase.

    The warmup tier exists because the K cap's bit-exactness argument
    INVERTS in the init regime: a sparse SfM seed cloud has huge knn-derived
    scales, so a few thousand giant splats overflow every tile — contributors
    beyond K are dropped, the image cannot converge, and (worse) dropped
    gaussians receive zero screen-space gradient, which freezes densification
    entirely (measured on the r4 150x720p run: alive pinned at 4636 for 5000
    steps, PSNR 8.3; and on a 256x144 diag: PSNR declines 24.8 -> 20.8 as
    alive crosses the tile-capacity ceiling)."""
    d = cfg.densify
    warmup_k = cfg.warmup_max_per_tile or min(4 * cfg.max_per_tile, 1024)
    if d.reset_opacity_every > 0 and warmup_k > cfg.max_per_tile \
            and step < min(d.reset_opacity_every, d.refine_stop):
        return replace(cfg, max_per_tile=warmup_k)
    if cfg.post_reset_max_per_tile <= cfg.max_per_tile or \
            d.reset_opacity_every <= 0:
        return cfg
    last_reset = (step // d.reset_opacity_every) * d.reset_opacity_every
    if (d.refine_start <= last_reset < d.refine_stop and last_reset > 0
            and step - last_reset < cfg.post_reset_recover_steps):
        return replace(cfg, max_per_tile=cfg.post_reset_max_per_tile)
    return cfg


def _lr_tree(cfg: TrainConfig, scene_scale: float, step: jnp.ndarray, max_steps: int):
    t = jnp.clip(step.astype(jnp.float32) / max_steps, 0.0, 1.0)
    decay = (cfg.lr_means_final / cfg.lr_means) ** t
    return {
        "means": cfg.lr_means * scene_scale * decay,
        "scales": jnp.asarray(cfg.lr_scales),
        "quats": jnp.asarray(cfg.lr_quats),
        "opacities": jnp.asarray(cfg.lr_opacities),
        "sh0": jnp.asarray(cfg.lr_sh0),
        "shN": jnp.asarray(cfg.lr_shN),
    }


def apply_camera_delta(viewmat: jnp.ndarray, cam_delta: jnp.ndarray) -> jnp.ndarray:
    """Left-apply an se(3) delta (w, dt) to a 4x4 w2c matrix."""
    from tpu_splat.sfm.geometry import exp_so3

    R = exp_so3(cam_delta[:3]) @ viewmat[:3, :3]
    t = viewmat[:3, 3] + cam_delta[3:]
    top = jnp.concatenate([R, t[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], viewmat.dtype)], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "active_sh_degree"),
)
def train_step(
    params: Params,
    adam_state: AdamState,
    dstate: DensifyState,
    image: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrin: jnp.ndarray,  # (4,) fx, fy, cx, cy
    step: jnp.ndarray,
    key: jax.Array,
    scene_scale: float,
    cfg: TrainConfig,
    width: int,
    height: int,
    active_sh_degree: int,
    cam_delta: Optional[jnp.ndarray] = None,  # (6,) se(3) delta for this view
    mask: Optional[jnp.ndarray] = None,  # (H, W) 1 = subject, 0 = removed bg
):
    """One optimization step on one view. Returns (params, adam, dstate, metrics
    [, cam_grad])."""
    alive = params["alive"]
    trainable = {k: v for k, v in params.items() if k != "alive"}
    capacity = alive.shape[0]
    opt_cams = cam_delta is not None
    if cam_delta is None:
        cam_delta = jnp.zeros((6,))

    bg_key, key = jax.random.split(key)
    if cfg.random_background:
        bg = jax.random.uniform(bg_key, (3,))
    else:
        bg = jnp.zeros((3,))

    def loss_fn(p, dummy, cd):
        vm = apply_camera_delta(viewmat, cd)
        out = render_view(
            p["means"], p["scales"], p["quats"], p["opacities"], p["sh0"], p["shN"],
            vm, intrin[0], intrin[1], intrin[2], intrin[3], width, height,
            sh_degree=active_sh_degree, background=bg, antialiased=cfg.antialiased,
            tile_size=cfg.tile_size, max_per_tile=cfg.max_per_tile,
            means2d_dummy=dummy, alive=alive,
        )
        gt = image
        if mask is not None:
            # masked captures: composite the subject over the training background
            # and pull rendered alpha toward the mask (the splatfacto-w alpha/bg
            # loss semantics for background-removed inputs)
            m = mask[..., None]
            gt = gt * m + bg * (1.0 - m)
            alpha_loss = jnp.mean(jnp.abs(out.alpha - mask))
        else:
            alpha_loss = 0.0
        loss = image_loss(out.color, gt, cfg.ssim_lambda) + 0.1 * alpha_loss
        if cfg.scale_reg_weight > 0:
            loss = loss + cfg.scale_reg_weight * scale_regularization(p["scales"], alive)
        if cfg.opacity_reg_weight > 0:
            loss = loss + cfg.opacity_reg_weight * opacity_entropy_loss(
                p["opacities"], alive
            )
        return loss, out

    dummy = jnp.zeros((capacity, 2))
    (loss, out), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(trainable, dummy, cam_delta)
    param_grads, means2d_grad, cam_grad = grads

    # Zero gradients for dead slots.
    param_grads = {
        k: jnp.where(alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
        for k, v in param_grads.items()
    }

    # Recompute radii cheaply for visibility (projection is cheap vs rasterize).
    from tpu_splat.gs.projection import project_gaussians

    proj = project_gaussians(
        trainable["means"], trainable["scales"], trainable["quats"], viewmat,
        intrin[0], intrin[1], intrin[2], intrin[3], width, height,
    )
    radii = jnp.where(alive, proj.radii, 0.0)

    lrs = _lr_tree(cfg, scene_scale, step, cfg.max_steps)
    visible = (radii > 0) if cfg.selective_adam else None
    new_trainable, adam_state = adam_update(
        trainable, param_grads, adam_state, lrs, visible=visible
    )
    new_params = dict(new_trainable)
    new_params["alive"] = alive

    dstate = accumulate_gradients(dstate, means2d_grad, radii, width, height)
    metrics = {"loss": loss, "psnr": psnr(out.color, image)}
    if opt_cams:
        return new_params, adam_state, dstate, metrics, cam_grad
    return new_params, adam_state, dstate, metrics


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "width", "height", "active_sh_degree",
                     "opt_cams", "has_masks"),
)
def train_steps_scan(
    params: Params,
    adam_state: AdamState,
    dstate: DensifyState,
    cam_deltas: jnp.ndarray,   # (M, 6)
    cam_mu: jnp.ndarray,       # (M, 6)
    cam_nu: jnp.ndarray,       # (M, 6)
    key: jax.Array,
    images_flat: jnp.ndarray,  # (M, H*W*3) device-staged training images
    masks_flat: Optional[jnp.ndarray],  # (M, H*W) or a (1, 1) placeholder
    viewmats: jnp.ndarray,     # (M, 4, 4)
    intrinsics: jnp.ndarray,   # (M, 4)
    views: jnp.ndarray,        # (S,) view index per step
    step0: jnp.ndarray,        # scalar int32: global step of views[0]
    scene_scale: float,
    cfg: TrainConfig,
    width: int,
    height: int,
    active_sh_degree: int,
    opt_cams: bool,
    has_masks: bool,
):
    """S chained train steps in ONE dispatch (lax.scan).

    The per-step host loop pays a device round trip (plus a full image
    upload) every iteration — through the remote TPU tunnel that floor is
    ~100 ms/step, which capped the r4 fast-preset run at 5.8 it/s while the
    same kernel benches 14 it/s device-bound. Images are staged in HBM once
    as (M, H*W*3) rows (a flat minor dim — a (M,H,W,3) stack would put the
    3-wide channel axis on the 128-lane dimension, see CLAUDE.md layout
    notes) and gathered per step inside the scan. Host-side scheduling
    (refine passes, opacity resets, SH ramp, eval/checkpoint) happens at
    chunk boundaries — the Trainer sizes each scan so no host event falls
    inside it. RNG: the key chain splits once per step, bit-identical to the
    stepwise loop."""

    def body(carry, xs):
        params, adam, dstate, cam_deltas, cam_mu, cam_nu, key = carry
        view, step = xs
        key, sub = jax.random.split(key)
        image = jax.lax.dynamic_index_in_dim(
            images_flat, view, 0, keepdims=False
        ).reshape(height, width, 3)
        mask = None
        if has_masks:
            mask = jax.lax.dynamic_index_in_dim(
                masks_flat, view, 0, keepdims=False
            ).reshape(height, width)
        if opt_cams:
            params, adam, dstate, metrics, cam_grad = train_step(
                params, adam, dstate, image, viewmats[view],
                intrinsics[view], step, sub, scene_scale, cfg, width, height,
                active_sh_degree, cam_delta=cam_deltas[view], mask=mask,
            )
            # Per-view camera Adam (mirrors Trainer._update_camera).
            b1, b2, eps = 0.9, 0.999, 1e-8
            mu = b1 * cam_mu[view] + (1 - b1) * cam_grad
            nu = b2 * cam_nu[view] + (1 - b2) * cam_grad * cam_grad
            t = jnp.maximum(step, 1).astype(jnp.float32)
            step_v = (cfg.lr_camera * (mu / (1 - b1 ** t))
                      / (jnp.sqrt(nu / (1 - b2 ** t)) + eps))
            cam_mu = cam_mu.at[view].set(mu)
            cam_nu = cam_nu.at[view].set(nu)
            cam_deltas = cam_deltas.at[view].add(-step_v)
        else:
            params, adam, dstate, metrics = train_step(
                params, adam, dstate, image, viewmats[view],
                intrinsics[view], step, sub, scene_scale, cfg, width, height,
                active_sh_degree, mask=mask,
            )
        return ((params, adam, dstate, cam_deltas, cam_mu, cam_nu, key),
                (metrics["loss"], metrics["psnr"]))

    n = views.shape[0]
    steps = step0 + jnp.arange(n, dtype=jnp.int32)
    carry, (losses, psnrs) = jax.lax.scan(
        body,
        (params, adam_state, dstate, cam_deltas, cam_mu, cam_nu, key),
        (views, steps),
    )
    params, adam_state, dstate, cam_deltas, cam_mu, cam_nu, key = carry
    return (params, adam_state, dstate, cam_deltas, cam_mu, cam_nu, key,
            losses[-1], psnrs[-1])


class Trainer:
    """Host-side training driver: camera sampling, refine scheduling, growth."""

    def __init__(
        self,
        params: Params,
        images: np.ndarray,  # (M, H, W, 3) float32 in [0,1] (host memory)
        viewmats: np.ndarray,  # (M, 4, 4) world-to-camera
        intrinsics: np.ndarray,  # (M, 4) fx fy cx cy
        scene_scale: float,
        cfg: TrainConfig,
        seed: int = 0,
        masks: Optional[np.ndarray] = None,  # (M, H, W) subject masks
        log_fn: Optional[Callable[[str], None]] = None,
    ):
        self.params = params
        self.images = images
        self.masks = masks
        self.viewmats = jnp.asarray(viewmats)
        self.intrinsics = jnp.asarray(intrinsics)
        self.scene_scale = float(scene_scale)
        self.cfg = cfg
        self.adam = adam_init(params)
        self.dstate = densify_state_init(params["means"].shape[0])
        self.key = jax.random.PRNGKey(seed)
        self.step = 0
        self.log = log_fn or (lambda s: None)
        self.height, self.width = images.shape[1:3]
        self._mcmc_state = None
        n_views = images.shape[0]
        self.cam_deltas = jnp.zeros((n_views, 6))
        self._cam_mu = jnp.zeros((n_views, 6))
        self._cam_nu = jnp.zeros((n_views, 6))
        self.checkpoint_dir: Optional[str] = None
        # Device-staged training data for the scan path (built lazily in run).
        self._images_flat: Optional[jnp.ndarray] = None
        self._masks_flat: Optional[jnp.ndarray] = None

    def _active_sh_degree(self) -> int:
        return min(self.step // self.cfg.sh_degree_interval, self.cfg.sh_degree)

    def _next_event_boundary(self, end: int) -> int:
        """First step > self.step where the host must intervene: refine pass,
        opacity reset, post-reset K-window edge, SH-degree bump, eval log, or
        checkpoint. Scan chunks never straddle one, so the per-chunk static
        config (effective_cfg, active SH degree) is constant inside a chunk."""
        cfg = self.cfg
        d = cfg.densify
        s = self.step
        periods = [cfg.eval_every, cfg.sh_degree_interval]
        if cfg.strategy == "default":
            periods += [d.refine_every, d.reset_opacity_every]
        if self.checkpoint_dir:
            periods.append(cfg.checkpoint_every)
        nxt = min((s // p + 1) * p for p in periods if p > 0)
        # effective_cfg's post-reset max_per_tile window closes mid-period:
        # its edge is a boundary too (the compiled program changes there).
        if cfg.strategy == "default" and d.reset_opacity_every > 0:
            last_reset = (s // d.reset_opacity_every) * d.reset_opacity_every
            recover_end = last_reset + cfg.post_reset_recover_steps
            if s < recover_end:
                nxt = min(nxt, recover_end)
        return min(nxt, end)

    def run(self, steps: Optional[int] = None) -> Params:
        cfg = self.cfg
        total = steps if steps is not None else cfg.max_steps
        # The stepwise loop stays for the xprof profiling hook (per-step trace
        # annotations) and MCMC (per-step exploration noise lives on the host
        # schedule there).
        if os.environ.get("TPU_SPLAT_PROFILE", "") or cfg.strategy == "mcmc":
            return self._run_stepwise(total)
        n_views = self.images.shape[0]
        rng = np.random.default_rng(42)
        t0 = time.time()
        if self._images_flat is None:
            self._images_flat = jnp.asarray(
                self.images.reshape(n_views, -1))
            if self.masks is not None:
                self._masks_flat = jnp.asarray(
                    self.masks.reshape(n_views, -1).astype(np.float32))
        start_step = self.step
        end = self.step + total
        while self.step < end:
            boundary = self._next_event_boundary(end)
            n = boundary - self.step
            views = jnp.asarray(rng.integers(n_views, size=n), jnp.int32)
            step_cfg = effective_cfg(cfg, self.step)
            self.key = jnp.asarray(self.key)
            (self.params, self.adam, self.dstate, self.cam_deltas,
             self._cam_mu, self._cam_nu, self.key, loss, last_psnr
             ) = train_steps_scan(
                self.params, self.adam, self.dstate, self.cam_deltas,
                self._cam_mu, self._cam_nu, self.key, self._images_flat,
                self._masks_flat, self.viewmats, self.intrinsics, views,
                jnp.asarray(self.step, jnp.int32), self.scene_scale,
                step_cfg, self.width, self.height, self._active_sh_degree(),
                cfg.optimize_camera_poses, self.masks is not None,
            )
            self.step = boundary
            if (self.checkpoint_dir
                    and self.step % cfg.checkpoint_every == 0):
                self.save_checkpoint(self.checkpoint_dir)
            if cfg.strategy == "default":
                self._default_refine()
            if self.step % cfg.eval_every == 0 or self.step == end:
                alive_n = num_alive(self.params)
                rate = (self.step - start_step) / max(time.time() - t0, 1e-9)
                self.log(
                    f"step {self.step}: loss={float(loss):.4f} "
                    f"psnr={float(last_psnr):.2f} alive={alive_n} "
                    f"({rate:.1f} it/s)"
                )
        return self.params

    def _run_stepwise(self, total: int) -> Params:
        cfg = self.cfg
        n_views = self.images.shape[0]
        rng = np.random.default_rng(42)
        t0 = time.time()
        # Debug-flag profiling hook (SURVEY 5.1): TPU_SPLAT_PROFILE=<dir>
        # captures an xplane trace of steps 20-40 viewable in TensorBoard/xprof.
        profile_dir = os.environ.get("TPU_SPLAT_PROFILE", "")
        prof_on = False
        for _ in range(total):
            if profile_dir and self.step == 20 and not prof_on:
                jax.profiler.start_trace(profile_dir)
                prof_on = True
            elif prof_on and self.step >= 40:
                jax.profiler.stop_trace()
                prof_on = False
                self.log(f"profiler trace (steps 20-40) written to {profile_dir}")
            view = int(rng.integers(n_views))
            self.key, sub = jax.random.split(self.key)
            image = jnp.asarray(self.images[view])
            mask = (jnp.asarray(self.masks[view])
                    if self.masks is not None else None)
            step_cfg = effective_cfg(cfg, self.step)
            if cfg.optimize_camera_poses:
                (self.params, self.adam, self.dstate, metrics,
                 cam_grad) = train_step(
                    self.params, self.adam, self.dstate, image,
                    self.viewmats[view], self.intrinsics[view],
                    jnp.asarray(self.step), sub, self.scene_scale, step_cfg,
                    self.width, self.height, self._active_sh_degree(),
                    cam_delta=self.cam_deltas[view], mask=mask,
                )
                self._update_camera(view, cam_grad)
            else:
                self.params, self.adam, self.dstate, metrics = train_step(
                    self.params, self.adam, self.dstate, image,
                    self.viewmats[view], self.intrinsics[view],
                    jnp.asarray(self.step), sub, self.scene_scale, step_cfg,
                    self.width, self.height, self._active_sh_degree(),
                    mask=mask,
                )
            self.step += 1
            if (self.checkpoint_dir
                    and self.step % cfg.checkpoint_every == 0):
                self.save_checkpoint(self.checkpoint_dir)

            if cfg.strategy == "default":
                self._default_refine()
            elif cfg.strategy == "mcmc":
                self._mcmc_refine()

            if self.step % cfg.eval_every == 0 or self.step == total:
                alive_n = num_alive(self.params)
                self.log(
                    f"step {self.step}: loss={float(metrics['loss']):.4f} "
                    f"psnr={float(metrics['psnr']):.2f} alive={alive_n} "
                    f"({(self.step) / (time.time() - t0):.1f} it/s)"
                )
        if prof_on:  # run ended inside the trace window
            jax.profiler.stop_trace()
        return self.params

    def _default_refine(self):
        cfg = self.cfg
        d = cfg.densify
        if (
            d.refine_start <= self.step < d.refine_stop
            and self.step % d.refine_every == 0
        ):
            self.key, sub = jax.random.split(self.key)
            self.params, self.adam, self.dstate, stats = refine(
                self.params, self.adam, self.dstate, sub,
                jnp.asarray(self.scene_scale), d, jnp.asarray(self.step),
            )
            # Surface refine activity at eval boundaries: an at-scale run
            # whose alive count never moves (r4 fast preset froze at 4636 for
            # 5000 steps) is undiagnosable without these numbers in the log.
            if self.step % cfg.eval_every == 0:
                self.log(
                    f"refine @{self.step}: split={int(stats['n_split'])} "
                    f"dup={int(stats['n_dup'])} pruned={int(stats['n_pruned'])} "
                    f"alive={int(stats['n_alive'])}")
            # Grow capacity if nearly full (host-side; one recompile per growth).
            capacity = self.params["means"].shape[0]
            alive_n = num_alive(self.params)
            if alive_n > cfg.grow_threshold * capacity:
                new_cap = capacity * 2
                self.log(f"growing capacity {capacity} -> {new_cap}")
                self.params = grow_capacity(self.params, new_cap)
                from tpu_splat.gs.params import grow_tree

                self.adam = AdamState(
                    mu=grow_tree(self.adam.mu, new_cap),
                    nu=grow_tree(self.adam.nu, new_cap),
                    count=self.adam.count,
                )
                self.dstate = densify_state_init(new_cap)
        if (
            self.step % d.reset_opacity_every == 0
            and d.refine_start <= self.step < d.refine_stop
        ):
            self.params, self.adam = reset_opacity(
                self.params, self.adam, d.reset_opacity_value
            )

    def _mcmc_refine(self):
        cfg = self.cfg
        d = cfg.densify
        if (
            d.refine_start <= self.step < d.refine_stop
            and self.step % d.refine_every == 0
        ):
            self.key, sub = jax.random.split(self.key)
            self.params, self.adam = mcmc_mod.relocate_and_grow(
                self.params, self.adam, sub, cfg.mcmc
            )
        # MCMC adds positional exploration noise every step.
        self.key, sub = jax.random.split(self.key)
        lr_means = float(cfg.lr_means * self.scene_scale)
        self.params = mcmc_mod.add_noise(self.params, sub, lr_means, cfg.mcmc)

    def _update_camera(self, view: int, grad):
        """Adam update for one camera's se(3) delta."""
        cfg = self.cfg
        b1, b2, eps = 0.9, 0.999, 1e-8
        mu = b1 * self._cam_mu[view] + (1 - b1) * grad
        nu = b2 * self._cam_nu[view] + (1 - b2) * grad * grad
        t = max(self.step, 1)
        step_v = cfg.lr_camera * (mu / (1 - b1**t)) / (jnp.sqrt(nu / (1 - b2**t)) + eps)
        self._cam_mu = self._cam_mu.at[view].set(mu)
        self._cam_nu = self._cam_nu.at[view].set(nu)
        self.cam_deltas = self.cam_deltas.at[view].add(-step_v)

    def adjusted_viewmats(self) -> np.ndarray:
        """World-to-camera matrices with the learned pose corrections applied."""
        out = []
        for i in range(self.viewmats.shape[0]):
            out.append(np.asarray(
                apply_camera_delta(self.viewmats[i], self.cam_deltas[i])
            ))
        return np.stack(out)

    # ---------- checkpointing (orbax) ----------

    def _ckpt_state(self):
        return {
            "params": self.params,
            "adam_mu": self.adam.mu,
            "adam_nu": self.adam.nu,
            "adam_count": self.adam.count,
            "dstate_grad": self.dstate.grad_accum,
            "dstate_count": self.dstate.count_accum,
            "cam_deltas": self.cam_deltas,
            "cam_mu": self._cam_mu,
            "cam_nu": self._cam_nu,
            "step": jnp.asarray(self.step),
            "key": self.key,
        }

    @staticmethod
    def _sanitize(tree):
        # orbax cannot store zero-size arrays (e.g. degree-0 shN); swap in a
        # 1-element placeholder and restore the real empty array afterwards
        return jax.tree.map(
            lambda a: jnp.zeros((1,), a.dtype) if a.size == 0 else a, tree
        )

    def save_checkpoint(self, directory: str):
        """Write an orbax checkpoint at the current step (resumable)."""
        import json

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(directory, f"step_{self.step:08d}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, self._sanitize(self._ckpt_state()), force=True)
        ckptr.wait_until_finished()
        # Sidecar metadata: densification grows capacity mid-run, so a restore
        # must know the saved shapes before building the orbax template.
        meta_path = os.path.join(os.path.dirname(path), f"meta_{self.step:08d}.json")
        with open(meta_path, "w") as f:
            json.dump({
                "capacity": int(self.params["means"].shape[0]),
                "n_views": int(self.cam_deltas.shape[0]),
                "step": self.step,
            }, f)
        self.log(f"checkpoint saved: {path}")

    def load_checkpoint(self, directory: str, step: Optional[int] = None):
        """Restore the latest (or given-step) checkpoint and resume from it.

        Handles capacity drift: if the checkpoint was saved after capacity
        growth, the live state is grown to match before restoring; a larger
        live capacity than the checkpoint is rejected (resume from scratch)."""
        import json

        import orbax.checkpoint as ocp

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
        meta_path = os.path.join(root, f"meta_{step:08d}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            saved_cap = int(meta["capacity"])
            if int(meta["n_views"]) != int(self.cam_deltas.shape[0]):
                raise ValueError(
                    f"checkpoint has {meta['n_views']} views, trainer has "
                    f"{self.cam_deltas.shape[0]} — input set changed, cannot resume"
                )
            cap = self.params["means"].shape[0]
            if saved_cap > cap:
                self.params = grow_capacity(self.params, saved_cap)
                from tpu_splat.gs.params import grow_tree

                self.adam = AdamState(
                    mu=grow_tree(self.adam.mu, saved_cap),
                    nu=grow_tree(self.adam.nu, saved_cap),
                    count=self.adam.count,
                )
                self.dstate = densify_state_init(saved_cap)
            elif saved_cap < cap:
                raise ValueError(
                    f"checkpoint capacity {saved_cap} < trainer capacity {cap} "
                    f"— initialization changed, cannot resume"
                )
        ckptr = ocp.StandardCheckpointer()
        template = self._ckpt_state()
        restored = ckptr.restore(path, self._sanitize(template))
        state = jax.tree.map(
            lambda orig, new: orig if orig.size == 0 else new, template, restored
        )
        self.params = state["params"]
        self.adam = AdamState(mu=state["adam_mu"], nu=state["adam_nu"],
                              count=state["adam_count"])
        self.dstate = DensifyState(grad_accum=state["dstate_grad"],
                                   count_accum=state["dstate_count"])
        self.cam_deltas = state["cam_deltas"]
        self._cam_mu = state["cam_mu"]
        self._cam_nu = state["cam_nu"]
        self.step = int(state["step"])
        self.key = state["key"]
        self.log(f"checkpoint restored: {path}")

    def cloud(self):
        return params_to_cloud(self.params)
