"""Pallas-kernel parity harness — run on the real TPU.

Compares the Pallas composite kernels (forward AND backward) against the pure-
XLA reference `composite_tiles_reference` on a small packed tensor that
exercises the interesting regimes: a saturated tile that early-terminates, a
near-empty tile, invalid (sentinel) slots, and plain mid-opacity content. Also
checks the `_pack_gather` custom VJP against a plain-gather autodiff reference.

The CPU pytest suite can never run the Pallas path (conftest pins the cpu
backend), so this is the kernel-correctness gate while optimizing: run after
every kernel change.

    python scripts/check_kernel_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_packed(rng, t_total, k, width_tiles, tile_size=16):
    """Packed (16, T, K) feature tensor with mixed regimes per tile."""
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr

    feat = np.zeros((pr.C_PACK, t_total, k), np.float32)
    counts = []
    for t in range(t_total):
        tx0 = (t % width_tiles) * tile_size
        ty0 = (t // width_tiles) * tile_size
        if t == 1:
            n_g = 4  # near-empty tile
        else:
            n_g = k
        mx = tx0 + rng.uniform(-2, tile_size + 2, n_g)
        my = ty0 + rng.uniform(-2, tile_size + 2, n_g)
        # tile 2: giant opacities + tight conics -> saturates in the first
        # chunk and early-terminates; tile 3: tiny alphas -> never saturates
        if t == 2:
            op = rng.uniform(0.9, 0.999, n_g)
            scale = rng.uniform(1.5, 2.5, n_g)
        elif t == 3:
            op = rng.uniform(0.002, 0.01, n_g)
            scale = rng.uniform(2.0, 6.0, n_g)
        else:
            op = rng.uniform(0.05, 0.9, n_g)
            scale = rng.uniform(1.0, 6.0, n_g)
        ca = 1.0 / scale**2
        cc = 1.0 / (scale * rng.uniform(0.5, 1.5, n_g)) ** 2
        cb = rng.uniform(-0.2, 0.2, n_g) * np.sqrt(ca * cc)
        feat[0, t, :n_g] = mx
        feat[1, t, :n_g] = my
        feat[2, t, :n_g] = ca
        feat[3, t, :n_g] = cb
        feat[4, t, :n_g] = cc
        feat[5:8, t, :n_g] = rng.uniform(0, 1, (3, n_g))
        feat[8, t, :n_g] = op
        feat[9, t, :n_g] = rng.uniform(0.5, 8.0, n_g)
        counts.append(n_g)
    return jnp.asarray(feat), jnp.asarray(counts, jnp.int32)


def check_composite(rng):
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr

    tx, ty, tile_size = 4, 3, 16
    t_total, k = tx * ty, 2 * pr.CHUNK
    packed, counts = build_packed(rng, t_total, k, tx, tile_size)

    out_p = jax.jit(lambda p: pr.composite_tiles(p, tx, ty, tile_size))(packed)
    out_r = jax.jit(
        lambda p: pr.composite_tiles_reference(p, tx, ty, tile_size)
    )(packed)
    fwd_err = float(jnp.max(jnp.abs(out_p[:, :5] - out_r[:, :5])))
    print(f"composite fwd  max|pallas-ref| = {fwd_err:.3e}")
    assert fwd_err < 2e-5, "forward parity failed"

    # counts-bounded sweep (the production rasterize() path) must be
    # BIT-identical: skipped chunks are all-sentinel (alpha exactly 0)
    out_c = jax.jit(
        lambda p: pr.composite_tiles(p, tx, ty, tile_size, counts=counts)
    )(packed)
    cnt_err = float(jnp.max(jnp.abs(out_c[:, :5] - out_p[:, :5])))
    print(f"composite fwd counts-bounded  = {cnt_err:.3e} (must be 0)")
    assert cnt_err == 0.0, "counts-bounded forward changed the output"

    cot = jnp.asarray(rng.standard_normal(out_p.shape), jnp.float32)

    def loss_p(p):
        return jnp.sum(pr.composite_tiles(p, tx, ty, tile_size) * cot)

    def loss_c(p):
        return jnp.sum(
            pr.composite_tiles(p, tx, ty, tile_size, counts=counts) * cot)

    def loss_r(p):
        return jnp.sum(pr.composite_tiles_reference(p, tx, ty, tile_size) * cot)

    g_p = jax.jit(jax.grad(loss_p))(packed)
    g_r = jax.jit(jax.grad(loss_r))(packed)
    # relative on the gradient scale: conic grads reach 1e3 on tight splats
    scale = float(jnp.max(jnp.abs(g_r))) + 1e-12
    bwd_err = float(jnp.max(jnp.abs(g_p - g_r))) / scale
    print(f"composite bwd  max rel err    = {bwd_err:.3e} (scale {scale:.2e})")
    assert bwd_err < 5e-5, "backward parity failed"

    g_c = jax.jit(jax.grad(loss_c))(packed)
    cnt_bwd = float(jnp.max(jnp.abs(g_c - g_p)))
    print(f"composite bwd counts-bounded  = {cnt_bwd:.3e} (must be 0)")
    assert cnt_bwd == 0.0, "counts-bounded backward changed the gradient"


def check_pack_gather(rng):
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.rasterize import _pack_gather, tile_gaussians

    n, width, height, k = 4096, 128, 64, 256
    means2d = jnp.asarray(
        np.stack([rng.uniform(-10, width + 10, n), rng.uniform(-10, height + 10, n)], 1),
        jnp.float32)
    depths = jnp.asarray(rng.uniform(0.1, 10, n), jnp.float32)
    radii = jnp.asarray(np.where(rng.uniform(size=n) < 0.9,
                                 rng.uniform(1, 40, n), 0.0), jnp.float32)
    b = jax.jit(
        lambda m, d, r: tile_gaussians(m, d, r, width, height, 16, k)
    )(means2d, depths, radii)
    t_total = b.gidx.shape[0]
    feat = jnp.asarray(rng.standard_normal((n, pr.C_PACK)), jnp.float32)
    sent = n + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sent)
    cot = jnp.asarray(
        rng.standard_normal((pr.C_PACK, t_total, k)), jnp.float32)

    def loss_custom(f):
        return jnp.sum(
            _pack_gather(f, gidx_ext, b.slots_prim, b.slots_mid, b.slots_big4, b.slots_big8,
                         b.mid_order, b.big4_order, b.big8_order, t_total * k) * cot)

    def loss_ref(f):
        f_ext = jnp.concatenate(
            [f, f[b.big4_order], f[b.big8_order], f[b.mid_order], jnp.zeros_like(f[:1])], 0)
        packed = f_ext[gidx_ext.reshape(-1)].T.reshape(pr.C_PACK, t_total, k)
        return jnp.sum(packed * cot)

    g_c = jax.jit(jax.grad(loss_custom))(feat)
    g_r = jax.jit(jax.grad(loss_ref))(feat)
    scale = float(jnp.max(jnp.abs(g_r))) + 1e-12
    err = float(jnp.max(jnp.abs(g_c - g_r))) / scale
    # the custom bwd routes through bf16 (intentional; see _pack_gather_bwd)
    print(f"pack-gather bwd max rel err   = {err:.3e} (scale {scale:.2e})")
    assert err < 2e-2, "pack-gather VJP parity failed"


def main():
    import scripts._jaxcache  # noqa: F401
    import jax

    print(f"backend: {jax.default_backend()}")
    if jax.default_backend() == "cpu":
        print("WARNING: cpu backend — composite_tiles falls back to the "
              "reference; this run only checks the pack-gather VJP.")
        check_pack_gather(np.random.default_rng(1))
        return
    rng = np.random.default_rng(1)
    check_composite(rng)
    check_pack_gather(rng)
    print("kernel parity OK")


if __name__ == "__main__":
    main()
