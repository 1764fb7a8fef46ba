"""Phase-level profiling of the training step on the real TPU.

Times each pipeline phase with the scan-chained-in-one-jit method (the only
reliable timing on the axon tunnel — see CLAUDE.md). Run on TPU:
    python scripts/profile_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scan(fn, args, n=20, name=""):
    """Time fn chained n times inside one jit; returns ms per call."""
    import jax
    import jax.numpy as jnp

    only = os.environ.get("PROFILE_ONLY", "")
    if only and not any(tok in name for tok in only.split(",")):
        return 0.0

    @jax.jit
    def run(args):
        def body(carry, i):
            out = fn(*args, i)
            return carry + out, None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    _ = float(run(args))  # compile + warm
    t0 = time.time()
    _ = float(run(args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import scripts._jaxcache  # noqa: F401  (persistent compile cache)
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.optim import adam_init
    from tpu_splat.gs.projection import project_gaussians
    from tpu_splat.gs.rasterize import _pack_gather, rasterize, tile_gaussians
    from tpu_splat.gs.render import render_view
    from tpu_splat.gs.sh import sh_to_color
    from tpu_splat.gs.strategy import densify_state_init
    from tpu_splat.gs.trainer import TrainConfig, train_step

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    capacity = 1 << 19
    n_alive = 400_000
    width, height = 1280, 720
    K = 512

    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    params = {
        "means": jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32),
        "scales": jnp.asarray(np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32),
        "quats": jnp.asarray(
            np.concatenate([np.ones((capacity, 1)), 0.1 * rng.normal(size=(capacity, 3))], 1),
            jnp.float32),
        "opacities": jnp.asarray(rng.normal(0.0, 1.0, (capacity,)), jnp.float32),
        "sh0": jnp.asarray(rng.normal(0, 0.5, (capacity, 3)), jnp.float32),
        "shN": jnp.asarray(rng.normal(0, 0.05, (capacity, 15, 3)), jnp.float32),
        "alive": jnp.asarray(alive),
    }
    eye = np.array([4.5, 0.8, 0.0])
    z = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.stack([x, y, z]); w2c[:3, 3] = -w2c[:3, :3] @ eye
    viewmat = jnp.asarray(w2c)
    fx = fy = width * 0.85
    cx, cy = width / 2, height / 2
    image = jnp.asarray(rng.uniform(0, 1, (height, width, 3)), jnp.float32)
    intrin = jnp.asarray([fx, fy, cx, cy], jnp.float32)

    # phase 1: projection
    def f_proj(means, scales, quats, i):
        p = project_gaussians(means + 0.0 * i, scales, quats, viewmat,
                              fx, fy, cx, cy, width, height)
        return jnp.sum(p.means2d) + jnp.sum(p.radii)

    bench_scan(f_proj, (params["means"], params["scales"], params["quats"]),
               name="projection")

    proj = project_gaussians(params["means"], params["scales"], params["quats"],
                             viewmat, fx, fy, cx, cy, width, height)
    radii = jnp.where(params["alive"], proj.radii, 0.0)

    # phase 2: binning
    def f_bin(m2d, depths, r, i):
        b = tile_gaussians(m2d + 0.0 * i, depths, r, width, height, 16, K)
        return (jnp.sum(b.gidx.astype(jnp.float32))
                + jnp.sum(b.slots_prim.astype(jnp.float32))
                + jnp.sum(b.slots_mid.astype(jnp.float32))
                + jnp.sum(b.slots_big4.astype(jnp.float32))
                + jnp.sum(b.slots_big8.astype(jnp.float32)))

    bench_scan(f_bin, (proj.means2d, proj.depths, radii), name="binning (sorts)")

    b = tile_gaussians(
        proj.means2d, proj.depths, radii, width, height, 16, K)
    t_total = b.gidx.shape[0]
    feat = jnp.concatenate(
        [proj.means2d, proj.conics, params["sh0"], params["opacities"][:, None],
         proj.depths[:, None], jnp.zeros((capacity, pr.C_PACK - 10))], axis=-1)
    sent = capacity + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sent)

    # phase 3: pack gather fwd
    def f_pack(feat, i):
        packed = _pack_gather(feat + 0.0 * i, gidx_ext, b.slots_prim,
                             b.slots_mid, b.slots_big4, b.slots_big8, b.mid_order,
                             b.big4_order, b.big8_order, t_total * K)
        return jnp.sum(packed)

    bench_scan(f_pack, (feat,), name="pack gather (fwd)")

    # phase 3b: pack gather fwd+bwd
    def f_pack_grad(feat, i):
        def loss(f):
            return jnp.sum(_pack_gather(f, gidx_ext, b.slots_prim, b.slots_mid,
                                 b.slots_big4, b.slots_big8, b.mid_order, b.big4_order, b.big8_order,
                                 t_total * K))
        return jax.grad(loss)(feat + 0.0 * i).sum()

    bench_scan(f_pack_grad, (feat,), name="pack gather (fwd+bwd)")

    packed = _pack_gather(feat, gidx_ext, b.slots_prim, b.slots_mid,
                          b.slots_big4, b.slots_big8, b.mid_order, b.big4_order, b.big8_order, t_total * K)
    counts = jnp.sum(b.gvalid, axis=1, dtype=jnp.int32)

    # phase 4: composite kernel fwd (counts-bounded — the production path)
    def f_comp(packed, i):
        out = pr.composite_tiles(packed + 0.0 * i, 80, 45, 16, counts=counts)
        return jnp.sum(out)

    bench_scan(f_comp, (packed,), name="composite kernel (fwd)")

    def f_comp_grad(packed, i):
        def loss(p):
            return jnp.sum(pr.composite_tiles(p, 80, 45, 16, counts=counts))
        return jax.grad(loss)(packed + 0.0 * i).sum()

    bench_scan(f_comp_grad, (packed,), name="composite kernel (fwd+bwd)")

    # phase 5: SH eval
    def f_sh(sh0, shN, means, i):
        cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
        dirs = means - cam_pos
        dirs = dirs / jnp.linalg.norm(dirs + 0.0 * i, axis=-1, keepdims=True)
        cols = sh_to_color(sh0, shN, dirs, 3)
        return jnp.sum(cols)

    bench_scan(f_sh, (params["sh0"], params["shN"], params["means"]),
               name="SH3 eval (fwd)")

    # phase 6: full render fwd
    def f_render(means, scales, quats, opac, sh0, shN, i):
        out = render_view(means + 0.0 * i, scales, quats, opac, sh0, shN,
                          viewmat, fx, fy, cx, cy, width, height,
                          sh_degree=3, max_per_tile=K, alive=params["alive"])
        return jnp.sum(out.color)

    bench_scan(f_render, (params["means"], params["scales"], params["quats"],
                          params["opacities"], params["sh0"], params["shN"]),
               name="full render (fwd)")

    # phase 7: full render fwd+bwd
    def f_render_grad(means, scales, quats, opac, sh0, shN, i):
        def loss(args):
            out = render_view(*args, viewmat, fx, fy, cx, cy, width, height,
                              sh_degree=3, max_per_tile=K, alive=params["alive"])
            return jnp.mean(jnp.abs(out.color - image))
        g = jax.grad(loss)((means + 0.0 * i, scales, quats, opac, sh0, shN))
        return sum(jnp.sum(x) for x in g)

    bench_scan(f_render_grad, (params["means"], params["scales"], params["quats"],
                               params["opacities"], params["sh0"], params["shN"]),
               name="full render (fwd+bwd)")

    # phase 8: full train step
    cfg = TrainConfig(max_steps=30000, sh_degree=3, random_background=False)
    adam = adam_init(params)
    dstate = densify_state_init(capacity)
    key = jax.random.PRNGKey(0)

    def f_step(params, adam, dstate, i):
        p, a, d, m = train_step(params, adam, dstate, image, viewmat, intrin,
                                i, jax.random.fold_in(key, i), 2.0, cfg,
                                width, height, 3)
        return m["loss"] + jnp.sum(p["means"][0])

    if os.environ.get("PROFILE_ONLY", "") and \
            "FULL" not in os.environ.get("PROFILE_ONLY", ""):
        return

    import jax as _jax

    @_jax.jit
    def run_steps(params, adam, dstate):
        def body(carry, i):
            p, a, d = carry
            p, a, d, m = train_step(p, a, d, image, viewmat, intrin, i,
                                    jax.random.fold_in(key, i), 2.0, cfg,
                                    width, height, 3)
            return (p, a, d), m["loss"]
        (p, a, d), losses = jax.lax.scan(body, (params, adam, dstate),
                                         jnp.arange(20))
        return losses[-1]

    _ = float(run_steps(params, adam, dstate))
    t0 = time.time()
    _ = float(run_steps(params, adam, dstate))
    dt = (time.time() - t0) / 20 * 1000
    print(f"{'FULL train step':42s} {dt:8.2f} ms   ({1000/dt:.2f} it/s)")


if __name__ == "__main__":
    main()
