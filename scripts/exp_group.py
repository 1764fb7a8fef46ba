"""Experiment: GS-TG-style tile grouping for the rasterizer hot path.

Static analysis (measured on CPU, bench workload distribution, 512K splats,
720p, 400K alive / 304K visible):
  - valid tile pairs (16px): 2.88M;  valid group pairs (32px, deduped): 1.25M
  - per-tile occupancy p50/p90/p99/max = 968/1130/1199/1262 -> K=512 cap
    truncates 41.8% of pairs
  - per-group occupancy p50/p90/p99/max = 1680/1998/2109/2164 -> K=1024 cap
    truncates 35.0% (LESS truncation than today at HALF the packed bytes)

This script times binning + packing at both granularities on the TPU.
All setup calls are jit-wrapped: eager tile_gaussians through the axon tunnel
dispatches hundreds of ops individually and appears to hang.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scan(fn, args, n=20, name=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, i):
            out = fn(*args, i)
            return carry + out, None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    _ = float(run(args))
    t0 = time.time()
    _ = float(run(args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import scripts._jaxcache  # noqa: F401  (persistent compile cache)
    import functools

    import jax
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.projection import project_gaussians
    from tpu_splat.gs.rasterize import _pack_gather, tile_gaussians

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    capacity = 1 << 19
    n_alive = 400_000
    width, height = 1280, 720
    K = 512

    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    means = jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32)
    scales = jnp.asarray(np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32)
    quats = jnp.asarray(
        np.concatenate([np.ones((capacity, 1)), 0.1 * rng.normal(size=(capacity, 3))], 1),
        jnp.float32)
    eye = np.array([4.5, 0.8, 0.0])
    z = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.stack([x, y, z]); w2c[:3, 3] = -w2c[:3, :3] @ eye
    viewmat = jnp.asarray(w2c)
    fx = fy = width * 0.85

    @jax.jit
    def setup():
        proj = project_gaussians(means, scales, quats, viewmat, fx, fy,
                                 width / 2, height / 2, width, height)
        radii = jnp.where(jnp.asarray(alive), proj.radii, 0.0)
        feat = jnp.concatenate(
            [proj.means2d, proj.conics, means[:, :3], proj.depths[:, None],
             proj.depths[:, None], jnp.zeros((capacity, pr.C_PACK - 9))], axis=-1)
        return proj.means2d, proj.depths, radii, feat

    m2d, depths, radii, feat = setup()
    _ = float(jnp.sum(radii))
    print("setup done", flush=True)

    tg16 = jax.jit(functools.partial(
        tile_gaussians, width=width, height=height, tile_size=16,
        max_per_tile=K))
    tg32 = jax.jit(functools.partial(
        tile_gaussians, width=width, height=height, tile_size=32,
        max_per_tile=2 * K))

    def f_bin16(m2d_, depths_, r_, i):
        b = tile_gaussians(m2d_ + 0.0 * i, depths_, r_, width, height, 16, K)
        return (jnp.sum(b.gidx.astype(jnp.float32))
                + jnp.sum(b.slots_prim.astype(jnp.float32))
                + jnp.sum(b.slots_big4.astype(jnp.float32))
                + jnp.sum(b.slots_big8.astype(jnp.float32)))

    bench_scan(f_bin16, (m2d, depths, radii), name="binning tile16 K512")

    def f_bin32(m2d_, depths_, r_, i):
        out = tile_gaussians(m2d_ + 0.0 * i, depths_, r_, width, height, 32, 2 * K)
        return (jnp.sum(out[0].astype(jnp.float32))
                + jnp.sum(out[2].astype(jnp.float32))
                + jnp.sum(out[3].astype(jnp.float32)))

    bench_scan(f_bin32, (m2d, depths, radii), name="binning group32 K1024")

    b16 = tg16(m2d, depths, radii)
    t_total = b16.gidx.shape[0]
    gidx_ext = jnp.where(
        b16.gvalid, b16.gidx,
        capacity + b16.big4_order.shape[0] + b16.big8_order.shape[0] + b16.mid_order.shape[0])

    def f_pack16(feat_, i):
        packed = _pack_gather(feat_ + 0.0 * i, gidx_ext, b16.slots_prim,
                              b16.slots_mid, b16.slots_big4, b16.slots_big8, b16.mid_order,
                              b16.big4_order, b16.big8_order, t_total * K)
        return jnp.sum(packed)

    bench_scan(f_pack16, (feat,), name="pack fwd tile16 K512")

    b32 = tg32(m2d, depths, radii)
    g_total = b32.gidx.shape[0]
    gidx_ext2 = jnp.where(
        b32.gvalid, b32.gidx,
        capacity + b32.big4_order.shape[0] + b32.big8_order.shape[0] + b32.mid_order.shape[0])

    def f_pack32(feat_, i):
        packed = _pack_gather(feat_ + 0.0 * i, gidx_ext2, b32.slots_prim,
                              b32.slots_mid, b32.slots_big4, b32.slots_big8, b32.mid_order,
                              b32.big4_order, b32.big8_order, g_total * 2 * K)
        return jnp.sum(packed)

    bench_scan(f_pack32, (feat,), name=f"pack fwd group32 K1024 ({g_total} groups)")

    def f_pack32_grad(feat_, i):
        def loss(f_):
            return jnp.sum(_pack_gather(f_, gidx_ext2, b32.slots_prim,
                                        b32.slots_mid, b32.slots_big4, b32.slots_big8,
                                        b32.mid_order, b32.big4_order, b32.big8_order,
                                        g_total * 2 * K))
        return jax.grad(loss)(feat_ + 0.0 * i).sum()

    bench_scan(f_pack32_grad, (feat,), name="pack fwd+bwd group32 K1024")


if __name__ == "__main__":
    main()
