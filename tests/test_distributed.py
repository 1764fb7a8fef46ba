"""Multi-chip training tests on the 8-device virtual CPU mesh: the distributed
step must produce the same result as an equivalent single-device computation and
actually shard parameters/optimizer state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_training import synthetic_scene, make_trainer  # noqa: F401 (fixture)
from tpu_splat.gs.optim import adam_init
from tpu_splat.gs.params import init_params_from_points
from tpu_splat.gs.strategy import densify_state_init
from tpu_splat.gs.trainer import TrainConfig
from tpu_splat.mesh.distributed import make_distributed_train_step, make_mesh, shard_params

W = H = 64


@pytest.fixture(scope="module")
def dp_setup(synthetic_scene):
    cloud, viewmats, intrin, images, gt_means = synthetic_scene
    rng = np.random.default_rng(1)
    pts = gt_means + rng.normal(0, 0.1, gt_means.shape).astype(np.float32)
    colors = rng.uniform(0.3, 0.7, (pts.shape[0], 3))
    params = init_params_from_points(pts, colors, capacity=256, sh_degree=0)
    cfg = TrainConfig(max_steps=100, sh_degree=0, max_per_tile=128,
                      random_background=False)
    return params, images, viewmats, intrin, cfg


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_gauss=2)
    assert mesh.shape == {"data": 4, "gauss": 2}
    mesh2 = make_mesh(n_data=8)
    assert mesh2.shape == {"data": 8, "gauss": 1}


def test_distributed_step_runs_and_shards(dp_setup):
    params, images, viewmats, intrin, cfg = dp_setup
    mesh = make_mesh(n_data=4, n_gauss=2)
    params_d = shard_params(params, mesh)
    adam = adam_init(params_d)
    dstate = densify_state_init(params_d["means"].shape[0])

    step_fn = make_distributed_train_step(mesh, cfg, W, H, 0, scene_scale=2.0)
    batch = jnp.asarray(images[:4])
    vm = jnp.asarray(viewmats[:4])
    K = jnp.asarray(intrin[:4])
    mk = jnp.zeros((4, 1, 1))
    cd = jnp.zeros((4, 6))
    p1, adam1, d1, metrics, cg = step_fn(params_d, adam, dstate, batch, vm, K,
                                         mk, cd, jnp.asarray(0),
                                         jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert cg.shape == (4, 6)
    # parameters actually changed
    assert float(jnp.abs(p1["means"] - params_d["means"]).max()) > 0
    # sharding survives: each param is split over the gauss axis
    sh = p1["means"].sharding
    assert "gauss" in sh.spec
    # second step (exercises donated/cached path)
    p2, adam2, d2, m2, _ = step_fn(p1, adam1, d1, batch, vm, K, mk, cd,
                                   jnp.asarray(1), jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))


def test_distributed_matches_gradient_of_mean_loss(dp_setup):
    """One distributed step must equal the single-device step on the same batch
    (same mean-of-views loss, same Adam math)."""
    params, images, viewmats, intrin, cfg = dp_setup
    mesh = make_mesh(n_data=4, n_gauss=2)
    step_fn = make_distributed_train_step(mesh, cfg, W, H, 0, scene_scale=2.0)
    params_d = shard_params(params, mesh)
    adam = adam_init(params_d)
    dstate = densify_state_init(params_d["means"].shape[0])
    batch = jnp.asarray(images[:4])
    p1, _, _, metrics, _ = step_fn(params_d, adam, dstate, batch,
                                   jnp.asarray(viewmats[:4]),
                                   jnp.asarray(intrin[:4]),
                                   jnp.zeros((4, 1, 1)), jnp.zeros((4, 6)),
                                   jnp.asarray(0), jax.random.PRNGKey(0))

    # single-device reference: identical math without the mesh
    from tpu_splat.gs.losses import image_loss
    from tpu_splat.gs.render import render_view

    alive = params["alive"]

    def batch_loss(trainable):
        def one(im, vm, K):
            out = render_view(
                trainable["means"], trainable["scales"], trainable["quats"],
                trainable["opacities"], trainable["sh0"], trainable["shN"],
                vm, K[0], K[1], K[2], K[3], W, H, sh_degree=0,
                background=jnp.zeros(3), max_per_tile=cfg.max_per_tile,
                alive=alive,
            )
            return image_loss(out.color, im, cfg.ssim_lambda)

        return jnp.mean(jax.vmap(one)(batch, jnp.asarray(viewmats[:4]),
                                      jnp.asarray(intrin[:4])))

    trainable = {k: v for k, v in params.items() if k != "alive"}
    loss_ref, grads_ref = jax.value_and_grad(batch_loss)(trainable)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss_ref), rtol=1e-4)

    # first Adam step with those grads: sign(step) = sign(grad), magnitude = lr
    g = np.asarray(grads_ref["means"])
    delta = np.asarray(p1["means"]) - np.asarray(params["means"])
    mask = np.abs(g) > 1e-12
    assert np.all(np.sign(delta[mask]) == -np.sign(g[mask]))


def test_scale_schedule():
    """steps_scaler semantics: every step-indexed milestone shrinks together."""
    from tpu_splat.gs.trainer import scale_schedule

    cfg = TrainConfig(max_steps=30000)
    s = scale_schedule(cfg, 4)
    assert s.max_steps == 7500
    assert s.sh_degree_interval == 250
    assert s.densify.refine_start == 125
    assert s.densify.refine_stop == 3750
    assert s.densify.refine_every == 25
    assert s.densify.reset_opacity_every == 750
    # the scaled run reaches full SH degree and fires resets, like the full run
    assert s.max_steps // s.sh_degree_interval == cfg.max_steps // cfg.sh_degree_interval
    assert scale_schedule(cfg, 1) is cfg


def test_effective_cfg_capacity_schedule():
    """Post-opacity-reset capacity boost: K rises to post_reset_max_per_tile
    for exactly post_reset_recover_steps after each reset inside the densify
    window, and nowhere else (K=256 is bit-exact in the trained regime; only
    the post-reset regime still carries light in deep slots — exp_ksweep)."""
    from tpu_splat.gs.trainer import effective_cfg

    cfg = TrainConfig(max_steps=30000)
    d = cfg.densify
    assert cfg.max_per_tile == 256 and cfg.post_reset_max_per_tile == 512
    reset = (d.refine_start // d.reset_opacity_every + 1) * d.reset_opacity_every
    assert d.refine_start <= reset < d.refine_stop
    # warmup tier: the init regime (before the FIRST opacity reset) runs at
    # 4x capacity — the K cap's bit-exactness argument inverts there (sparse
    # seed cloud with giant knn scales saturates tiles; contributors beyond K
    # get zero gradient, freezing densification — r4 full-scale post-mortem)
    assert effective_cfg(cfg, 0).max_per_tile == 1024
    assert effective_cfg(cfg, reset - 1).max_per_tile == 1024
    # steady state after the first reset window: untouched (same object -> no
    # recompile)
    assert effective_cfg(cfg, reset + cfg.post_reset_recover_steps + 1) is cfg
    # inside the window: boosted
    for s in (reset, reset + 1, reset + cfg.post_reset_recover_steps - 1):
        assert effective_cfg(cfg, s).max_per_tile == 512
    assert effective_cfg(cfg, reset + cfg.post_reset_recover_steps) is cfg
    # resets before refine_start / after refine_stop never fire -> no boost
    assert effective_cfg(cfg, d.refine_stop + 1).max_per_tile == 256


def test_distributed_masked_training(dp_setup):
    """A masked capture with enableMultiGpu must actually train masked: the
    masked step's loss includes the alpha term and differs from unmasked."""
    params, images, viewmats, intrin, cfg = dp_setup
    mesh = make_mesh(n_data=4, n_gauss=2)
    params_d = shard_params(params, mesh)
    adam = adam_init(params_d)
    dstate = densify_state_init(params_d["means"].shape[0])
    batch = jnp.asarray(images[:4])
    vm = jnp.asarray(viewmats[:4])
    K = jnp.asarray(intrin[:4])
    cd = jnp.zeros((4, 6))
    key = jax.random.PRNGKey(0)

    plain = make_distributed_train_step(mesh, cfg, W, H, 0, scene_scale=2.0)
    masked = make_distributed_train_step(mesh, cfg, W, H, 0, scene_scale=2.0,
                                         use_masks=True)
    _, _, _, m0, _ = plain(params_d, adam, dstate, batch, vm, K,
                           jnp.zeros((4, 1, 1)), cd, jnp.asarray(0), key)
    masks = jnp.ones((4, H, W)).at[:, : H // 2].set(0.0)
    _, _, _, m1, _ = masked(params_d, adam, dstate, batch, vm, K, masks, cd,
                            jnp.asarray(0), key)
    assert np.isfinite(float(m1["loss"]))
    assert abs(float(m1["loss"]) - float(m0["loss"])) > 1e-6

    # and the DistributedTrainer threads masks end to end
    from tpu_splat.mesh.trainer import DistributedTrainer

    tr = DistributedTrainer(params, images[:4], viewmats[:4], intrin[:4],
                            scene_scale=2.0, cfg=cfg, mesh=mesh,
                            masks=np.asarray(masks))
    tr.run(2)
    assert tr.step == 2


def test_distributed_camera_opt(dp_setup):
    """Camera-pose optimization on the mesh: deltas receive updates."""
    params, images, viewmats, intrin, cfg = dp_setup
    mesh = make_mesh(n_data=4, n_gauss=2)
    from tpu_splat.mesh.trainer import DistributedTrainer

    tr = DistributedTrainer(params, images[:4], viewmats[:4], intrin[:4],
                            scene_scale=2.0, cfg=cfg, mesh=mesh)
    assert cfg.optimize_camera_poses
    tr.run(3)
    assert float(jnp.abs(tr.cam_deltas).max()) > 0.0
    adj = tr.adjusted_viewmats()
    assert adj.shape == (4, 4, 4)
    assert np.abs(adj - np.asarray(viewmats[:4])).max() > 0.0


def test_distributed_trainer_with_densify(dp_setup):
    """Full multi-chip training loop incl. a densification pass on the mesh."""
    from tpu_splat.gs.strategy import DensifyConfig
    from tpu_splat.mesh.trainer import DistributedTrainer
    from tpu_splat.gs.trainer import TrainConfig

    params, images, viewmats, intrin, _ = dp_setup
    cfg = TrainConfig(
        max_steps=30, sh_degree=0, max_per_tile=128, random_background=False,
        densify=DensifyConfig(refine_start=10, refine_stop=30, refine_every=10,
                              grad_threshold=1e-6, reset_opacity_every=10**9),
        eval_every=10**9,
    )
    mesh = make_mesh(n_data=4, n_gauss=2)
    tr = DistributedTrainer(params, images, viewmats, intrin, scene_scale=2.0,
                            cfg=cfg, mesh=mesh)
    n0 = int(np.sum(np.asarray(tr.params["alive"])))
    tr.run(25)
    n1 = int(np.sum(np.asarray(tr.params["alive"])))
    assert n1 > n0, f"densification never fired on the mesh ({n0} -> {n1})"
    cloud = tr.cloud()
    assert cloud.num_points == n1
    for k, v in tr.params.items():
        if v.dtype != bool:
            assert bool(jnp.all(jnp.isfinite(v))), k
    # still sharded after refine
    assert "gauss" in tr.params["means"].sharding.spec


def test_distributed_checkpoint_resume_through_refine(dp_setup, tmp_path):
    """gsplat multi-GPU parity at full loop depth (VERDICT r4 #8): mesh
    training through a densify boundary, sharded orbax save, restore into a
    FRESH DistributedTrainer, then keep training — state must survive the
    round trip (alive count, step counter, camera deltas) and stay sharded."""
    from tpu_splat.gs.strategy import DensifyConfig
    from tpu_splat.gs.trainer import TrainConfig
    from tpu_splat.mesh.trainer import DistributedTrainer

    params, images, viewmats, intrin, _ = dp_setup
    cfg = TrainConfig(
        max_steps=40, sh_degree=0, max_per_tile=128, random_background=False,
        densify=DensifyConfig(refine_start=5, refine_stop=40, refine_every=5,
                              grad_threshold=1e-6, reset_opacity_every=10**9),
        eval_every=10**9, checkpoint_every=10,
    )
    mesh = make_mesh(n_data=4, n_gauss=2)
    ckpt = str(tmp_path / "ckpts")
    tr = DistributedTrainer(params, images, viewmats, intrin, scene_scale=2.0,
                            cfg=cfg, mesh=mesh)
    tr.checkpoint_dir = ckpt
    tr.run(10)  # passes refine boundaries at 5 and 10, checkpoint at 10
    alive_at_save = int(np.sum(np.asarray(tr.params["alive"])))
    step_at_save = tr.step

    tr2 = DistributedTrainer(params, images, viewmats, intrin, scene_scale=2.0,
                             cfg=cfg, mesh=mesh)
    tr2.load_checkpoint(ckpt)
    assert tr2.step == step_at_save
    assert int(np.sum(np.asarray(tr2.params["alive"]))) == alive_at_save
    np.testing.assert_allclose(np.asarray(tr2.cam_deltas),
                               np.asarray(tr.cam_deltas), atol=1e-7)
    assert "gauss" in tr2.params["means"].sharding.spec, "restore lost sharding"
    tr2.run(10)  # training continues through another refine after restore
    assert tr2.step == step_at_save + 10
    for k, v in tr2.params.items():
        if v.dtype != bool:
            assert bool(jnp.all(jnp.isfinite(v))), k
