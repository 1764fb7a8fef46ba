"""Checkpoint/resume and camera-pose-optimization tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_training import make_trainer, synthetic_scene  # noqa: F401
from tpu_splat.gs.strategy import DensifyConfig
from tpu_splat.gs.trainer import TrainConfig, apply_camera_delta


def small_cfg(**kw):
    base = dict(
        max_steps=40, sh_degree=0, max_per_tile=128, random_background=False,
        densify=DensifyConfig(refine_start=10**9), eval_every=10**9,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_checkpoint_roundtrip(synthetic_scene, tmp_path):
    tr = make_trainer(synthetic_scene, small_cfg())
    tr.run(20)
    tr.save_checkpoint(str(tmp_path))
    params_at_save = {k: np.asarray(v) for k, v in tr.params.items()}
    step_at_save = tr.step
    tr.run(10)  # diverge

    tr2 = make_trainer(synthetic_scene, small_cfg())
    tr2.load_checkpoint(str(tmp_path))
    assert tr2.step == step_at_save
    for k in params_at_save:
        np.testing.assert_array_equal(np.asarray(tr2.params[k]), params_at_save[k])
    # resumed training continues fine
    tr2.run(5)
    assert tr2.step == step_at_save + 5


def test_resume_across_capacity_growth(synthetic_scene, tmp_path):
    """A checkpoint saved after grow_capacity restores into a fresh trainer
    initialized at the original (smaller) capacity."""
    from tpu_splat.gs.params import grow_capacity, grow_tree
    from tpu_splat.gs.optim import AdamState
    from tpu_splat.gs.strategy import densify_state_init

    tr = make_trainer(synthetic_scene, small_cfg())
    tr.run(10)
    tr.params = grow_capacity(tr.params, 512)
    tr.adam = AdamState(mu=grow_tree(tr.adam.mu, 512),
                        nu=grow_tree(tr.adam.nu, 512), count=tr.adam.count)
    tr.dstate = densify_state_init(512)
    tr.run(5)
    tr.save_checkpoint(str(tmp_path))

    tr2 = make_trainer(synthetic_scene, small_cfg())  # capacity 256 again
    tr2.load_checkpoint(str(tmp_path))
    assert tr2.params["means"].shape[0] == 512
    assert tr2.step == 15
    np.testing.assert_array_equal(np.asarray(tr2.params["means"]),
                                  np.asarray(tr.params["means"]))
    tr2.run(5)
    assert tr2.step == 20


def test_periodic_checkpointing(synthetic_scene, tmp_path):
    tr = make_trainer(synthetic_scene, small_cfg(checkpoint_every=10))
    tr.checkpoint_dir = str(tmp_path)
    tr.run(25)
    import os

    steps = sorted(d for d in os.listdir(tmp_path) if d.startswith("step_"))
    assert steps == ["step_00000010", "step_00000020"]


def test_camera_optimization_moves_poses(synthetic_scene):
    cloud, viewmats, intrin, images, gt_means = synthetic_scene
    # perturb the view matrices so the optimizer has something to correct
    bad = viewmats.copy()
    bad[:, :3, 3] += 0.02
    tr = make_trainer(synthetic_scene, small_cfg(optimize_camera_poses=True,
                                                 lr_camera=1e-3))
    tr.viewmats = jnp.asarray(bad)
    tr.run(40)
    deltas = np.asarray(tr.cam_deltas)
    assert np.abs(deltas).max() > 1e-5, "camera deltas never moved"
    adj = tr.adjusted_viewmats()
    assert adj.shape == bad.shape
    assert not np.allclose(adj, bad)


def test_apply_camera_delta_identity():
    vm = np.eye(4, dtype=np.float32)
    out = np.asarray(apply_camera_delta(jnp.asarray(vm), jnp.zeros(6)))
    np.testing.assert_allclose(out, vm, atol=1e-6)
