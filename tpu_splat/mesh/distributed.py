"""Multi-chip training: device mesh + sharded train step.

The reference's only distributed mode is data-parallel multi-GPU gsplat with
torch-dist env plumbing (main.py:624-655, 1317-1347). Here distribution is a
first-class mesh declaration (SURVEY 2.3 / 5.8):

- axis "data": camera/view batch parallelism. Each device renders different
  views; gradients are averaged with one psum over ICI.
- axis "gauss": the gaussian dimension plays the model-parallel role — parameter
  and optimizer state are sharded along the splat axis (ZeRO-style), all-gathered
  for rendering, and gradient shards are reduced back with psum_scatter. This
  bounds per-chip optimizer memory as splats grow into the tens of millions.

Implemented with shard_map so every collective is explicit and rides ICI.
`steps_scaler` semantics (the reference divides steps by gpu count x batch,
main.py:1322-1338) are handled properly instead: learning rates are kept and the
global batch grows, so a fixed step budget sees batch-x more images.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_splat.gs.optim import AdamState
from tpu_splat.gs.strategy import DensifyState


def make_mesh(n_data: Optional[int] = None, n_gauss: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    total = len(devices)
    if n_data is None:
        n_data = total // n_gauss
    assert n_data * n_gauss == total, f"{n_data}x{n_gauss} != {total} devices"
    arr = np.array(devices).reshape(n_data, n_gauss)
    return Mesh(arr, ("data", "gauss"))


def shard_params(params: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Place parameters sharded along the gaussian axis (axis 0), replicated
    across the data axis."""
    out = {}
    for k, v in params.items():
        spec = P("gauss") if v.ndim >= 1 else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def make_distributed_train_step(
    mesh: Mesh,
    cfg,
    width: int,
    height: int,
    active_sh_degree: int,
    scene_scale: float,
    use_masks: bool = False,
):
    """Build a jitted SPMD train step over the mesh.

    Signature: step_fn(params, adam, dstate, images (B,H,W,3), viewmats (B,4,4),
    intrins (B,4), masks (B,H,W), cam_deltas (B,6), step, key)
    -> (params, adam, dstate, metrics, cam_grads (B,6)).
    B must be a multiple of the data-axis size; params/optimizer state are
    sharded along "gauss", batch along "data". When use_masks is False the
    masks argument is ignored (pass a (B,1,1) dummy); cam_grads are zero unless
    cfg.optimize_camera_poses.
    """
    from tpu_splat.gs.losses import image_loss
    from tpu_splat.gs.projection import project_gaussians
    from tpu_splat.gs.render import render_view
    from tpu_splat.gs.trainer import _lr_tree, apply_camera_delta

    n_gauss = mesh.shape["gauss"]

    def per_view_loss(full_params, alive, image, viewmat, intrin, dummy, bg,
                      mask, cam_delta):
        vm = apply_camera_delta(viewmat, cam_delta)
        out = render_view(
            full_params["means"], full_params["scales"], full_params["quats"],
            full_params["opacities"], full_params["sh0"], full_params["shN"],
            vm, intrin[0], intrin[1], intrin[2], intrin[3], width, height,
            sh_degree=active_sh_degree, background=bg,
            antialiased=cfg.antialiased, tile_size=cfg.tile_size,
            max_per_tile=cfg.max_per_tile, means2d_dummy=dummy, alive=alive,
        )
        gt = image
        alpha_loss = 0.0
        if use_masks:
            # same masked-capture semantics as the single-chip train_step
            m = mask[..., None]
            gt = gt * m + bg * (1.0 - m)
            alpha_loss = jnp.mean(jnp.abs(out.alpha - mask))
        return image_loss(out.color, gt, cfg.ssim_lambda) + 0.1 * alpha_loss, out

    def step_body(params_sh, mu_sh, nu_sh, count, grad_acc_sh, cnt_acc_sh,
                  images, viewmats, intrins, masks, cam_deltas, step, key):
        # params_sh: local gaussian shard (N/n_gauss rows). Gather full params
        # for rendering (the all-gather rides ICI).
        full = {
            k: jax.lax.all_gather(v, "gauss", axis=0, tiled=True)
            for k, v in params_sh.items()
        }
        alive = full.pop("alive")
        capacity = alive.shape[0]

        bg = jax.random.uniform(jax.random.fold_in(key, jax.lax.axis_index("data")),
                                (3,)) if cfg.random_background else jnp.zeros(3)

        def batch_loss(trainable, dummy, cds):
            losses, outs = jax.vmap(
                lambda im, vm, K, mk, cd: per_view_loss(
                    trainable, alive, im, vm, K, dummy, bg, mk, cd)
            )(images, viewmats, intrins, masks, cds)
            return jnp.mean(losses), outs

        dummy = jnp.zeros((capacity, 2))
        if cfg.optimize_camera_poses:
            (loss, outs), grads = jax.value_and_grad(
                batch_loss, argnums=(0, 1, 2), has_aux=True
            )(full, dummy, cam_deltas)
            pgrads, g2d, cam_grads = grads
        else:
            (loss, outs), grads = jax.value_and_grad(
                batch_loss, argnums=(0, 1), has_aux=True
            )(full, dummy, cam_deltas)
            pgrads, g2d = grads
            cam_grads = jnp.zeros_like(cam_deltas)
        # average over the data axis
        loss = jax.lax.pmean(loss, "data")
        pgrads = jax.tree.map(lambda g: jax.lax.pmean(g, "data"), pgrads)
        g2d = jax.lax.pmean(g2d, "data")

        # zero dead slots
        pgrads = {
            k: jnp.where(alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
            for k, v in pgrads.items()
        }

        # visibility for densify accumulation (any view in the local batch)
        proj = jax.vmap(
            lambda vm, K: project_gaussians(
                full["means"], full["scales"], full["quats"], vm,
                K[0], K[1], K[2], K[3], width, height,
            ).radii
        )(viewmats, intrins)
        radii = jnp.max(proj, axis=0)
        radii = jax.lax.pmax(radii, "data")
        radii = jnp.where(alive, radii, 0.0)

        # slice own gaussian shard of the (already pmean'd) gradients
        gi = jax.lax.axis_index("gauss")
        shard_n = capacity // n_gauss

        def my_shard(x):
            return jax.lax.dynamic_slice_in_dim(x, gi * shard_n, shard_n, axis=0)

        pgrads_sh = {k: my_shard(v) for k, v in pgrads.items()}

        # Adam on the local shard
        lrs = _lr_tree(cfg, scene_scale, step, cfg.max_steps)
        new_count = count + 1
        c = new_count.astype(jnp.float32)
        bc1 = 1.0 - 0.9**c
        bc2 = 1.0 - 0.999**c
        new_params_sh = dict(params_sh)
        new_mu, new_nu = {}, {}
        for name in mu_sh:
            g = pgrads_sh[name]
            m = 0.9 * mu_sh[name].astype(g.dtype) + 0.1 * g
            v = 0.999 * nu_sh[name].astype(g.dtype) + 0.001 * (g * g)
            stepv = lrs[name] * (m / bc1) / (jnp.sqrt(v / bc2) + 1e-8)
            new_mu[name] = m.astype(mu_sh[name].dtype)
            new_nu[name] = v.astype(nu_sh[name].dtype)
            new_params_sh[name] = params_sh[name] - stepv

        # densify stats on local shards
        g2d_sh = my_shard(g2d)
        radii_sh = my_shard(radii)
        norm = jnp.linalg.norm(
            g2d_sh * jnp.array([width / 2.0, height / 2.0]), axis=-1
        )
        vis = radii_sh > 0
        grad_acc_sh = grad_acc_sh + jnp.where(vis, norm, 0.0)
        cnt_acc_sh = cnt_acc_sh + vis.astype(jnp.float32)

        metrics = {"loss": loss}
        return (new_params_sh, new_mu, new_nu, new_count, grad_acc_sh,
                cnt_acc_sh, metrics, cam_grads)

    from jax import shard_map

    sharded = shard_map(
        step_body,
        mesh=mesh,
        in_specs=(
            {  # params: gauss-sharded
                "means": P("gauss"), "scales": P("gauss"), "quats": P("gauss"),
                "opacities": P("gauss"), "sh0": P("gauss"), "shN": P("gauss"),
                "alive": P("gauss"),
            },
            {k: P("gauss") for k in ("means", "scales", "quats", "opacities", "sh0", "shN")},
            {k: P("gauss") for k in ("means", "scales", "quats", "opacities", "sh0", "shN")},
            P(),  # adam count
            P("gauss"),  # grad accum
            P("gauss"),  # count accum
            P("data"),  # images
            P("data"),  # viewmats
            P("data"),  # intrins
            P("data"),  # masks (or (B,1,1) dummy)
            P("data"),  # cam deltas
            P(),  # step
            P(),  # key
        ),
        out_specs=(
            {k: P("gauss") for k in ("means", "scales", "quats", "opacities", "sh0", "shN", "alive")},
            {k: P("gauss") for k in ("means", "scales", "quats", "opacities", "sh0", "shN")},
            {k: P("gauss") for k in ("means", "scales", "quats", "opacities", "sh0", "shN")},
            P(),
            P("gauss"),
            P("gauss"),
            P(),
            P("data"),  # cam grads
        ),
        check_vma=False,
    )

    @jax.jit
    def step_fn(params, adam: AdamState, dstate: DensifyState, images, viewmats,
                intrins, masks, cam_deltas, step, key):
        p, mu, nu, count, gacc, cacc, metrics, cam_grads = sharded(
            params, adam.mu, adam.nu, adam.count, dstate.grad_accum,
            dstate.count_accum, images, viewmats, intrins, masks, cam_deltas,
            step, key,
        )
        return (
            p,
            AdamState(mu=mu, nu=nu, count=count),
            DensifyState(grad_accum=gacc, count_accum=cacc),
            metrics,
            cam_grads,
        )

    return step_fn
