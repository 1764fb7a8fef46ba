"""End-to-end 3DGS training tests on synthetic scenes (CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splat.core.types import Cameras, GaussianCloud
from tpu_splat.gs.params import init_params_from_points, num_alive, params_to_cloud
from tpu_splat.gs.render import render_cloud, render_view
from tpu_splat.gs.strategy import DensifyConfig
from tpu_splat.gs.trainer import TrainConfig, Trainer


W, H = 64, 64
FX = 80.0


def look_at(eye, target=np.zeros(3), up=np.array([0.0, -1.0, 0.0])):
    """OpenCV-convention world-to-camera matrix looking at target."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)  # rows = camera axes in world
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    return w2c


@pytest.fixture(scope="module")
def synthetic_scene():
    """A fixed ground-truth cloud rendered from a ring of cameras."""
    rng = np.random.default_rng(7)
    n = 60
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cloud = GaussianCloud(
        means=jnp.asarray(means),
        scales=jnp.asarray(np.full((n, 3), np.log(0.12), np.float32)),
        quats=jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1).astype(np.float32)
        ),
        opacities=jnp.full((n,), 2.0),
        sh0=jnp.asarray(((rng.uniform(0, 1, (n, 3)) - 0.5) / 0.2820948).astype(np.float32)),
        shN=jnp.zeros((n, 0, 3), jnp.float32),
    )
    views = []
    viewmats = []
    for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = np.array([3.5 * np.cos(ang), 0.8, 3.5 * np.sin(ang)])
        viewmats.append(look_at(eye))
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(np.stack(viewmats)), jnp.float32),
        fx=jnp.full((8,), FX),
        fy=jnp.full((8,), FX),
        cx=jnp.full((8,), W / 2),
        cy=jnp.full((8,), H / 2),
        distortion=jnp.zeros((8, 4)),
        width=W,
        height=H,
    )
    bg = jnp.zeros(3)
    for i in range(8):
        out = render_cloud(cloud, cams, i, background=bg, max_per_tile=128)
        views.append(np.asarray(out.color))
    images = np.stack(views)
    intrin = np.stack(
        [np.array([FX, FX, W / 2, H / 2], np.float32) for _ in range(8)]
    )
    return cloud, np.stack(viewmats).astype(np.float32), intrin, images, means


def make_trainer(synthetic_scene, cfg, capacity=256, init_noise=0.1, seed=3):
    cloud, viewmats, intrin, images, gt_means = synthetic_scene
    rng = np.random.default_rng(seed)
    pts = gt_means + rng.normal(0, init_noise, gt_means.shape).astype(np.float32)
    colors = rng.uniform(0.3, 0.7, (pts.shape[0], 3))
    params = init_params_from_points(pts, colors, capacity=capacity, sh_degree=0)
    return Trainer(params, images, viewmats, intrin, scene_scale=2.0, cfg=cfg)


class TestTraining:
    def test_loss_decreases_and_psnr_improves(self, synthetic_scene):
        cfg = TrainConfig(
            max_steps=600,
            sh_degree=0,
            max_per_tile=128,
            random_background=False,
            lr_means=1.6e-3,
            lr_means_final=1.6e-5,
            densify=DensifyConfig(
                refine_start=150, refine_stop=400, refine_every=100,
                reset_opacity_every=10**9,
            ),
            eval_every=10**9,
        )
        tr = make_trainer(synthetic_scene, cfg)
        _, viewmats, intrin, images, _ = synthetic_scene

        def eval_psnr(params):
            out = render_view(
                params["means"], params["scales"], params["quats"],
                params["opacities"], params["sh0"], params["shN"],
                jnp.asarray(viewmats[0]), *intrin[0], W, H,
                sh_degree=0, background=jnp.zeros(3), max_per_tile=128,
                alive=params["alive"],
            )
            mse = float(jnp.mean((out.color - images[0]) ** 2))
            return -10 * np.log10(max(mse, 1e-12))

        before = eval_psnr(tr.params)
        tr.run(600)
        after = eval_psnr(tr.params)
        assert after > before + 4.0, f"PSNR {before:.2f} -> {after:.2f}"
        assert after > 20.0, f"final PSNR too low: {after:.2f}"

    def test_densification_changes_population(self, synthetic_scene):
        cfg = TrainConfig(
            max_steps=200,
            sh_degree=0,
            max_per_tile=128,
            random_background=False,
            densify=DensifyConfig(
                refine_start=50, refine_stop=200, refine_every=50,
                grad_threshold=1e-5,  # aggressive so splits certainly trigger
            ),
            eval_every=10**9,
        )
        tr = make_trainer(synthetic_scene, cfg)
        n0 = num_alive(tr.params)
        tr.run(160)
        n1 = num_alive(tr.params)
        assert n1 != n0
        # all params finite
        for k, v in tr.params.items():
            if v.dtype != bool:
                assert bool(jnp.all(jnp.isfinite(v))), k

    def test_mcmc_strategy_runs(self, synthetic_scene):
        cfg = TrainConfig(
            max_steps=120,
            sh_degree=0,
            strategy="mcmc",
            max_per_tile=128,
            random_background=False,
            densify=DensifyConfig(refine_start=40, refine_stop=120, refine_every=40),
            eval_every=10**9,
        )
        tr = make_trainer(synthetic_scene, cfg)
        tr.run(120)
        for k, v in tr.params.items():
            if v.dtype != bool:
                assert bool(jnp.all(jnp.isfinite(v))), k
        assert num_alive(tr.params) > 0

    def test_export_cloud_roundtrip(self, synthetic_scene, tmp_path):
        cfg = TrainConfig(max_steps=10, sh_degree=0, max_per_tile=128, eval_every=10**9)
        tr = make_trainer(synthetic_scene, cfg)
        tr.run(10)
        cloud = tr.cloud()
        from tpu_splat.core.ply import load_ply, save_ply

        p = str(tmp_path / "out.ply")
        save_ply(cloud, p)
        back = load_ply(p)
        assert back.num_points == cloud.num_points
