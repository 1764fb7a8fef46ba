"""Localize the composite-backward parity gap: which tile/channel, and does it
vanish when the saturating / clamped-alpha regimes are removed?"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scripts._jaxcache  # noqa: F401

from scripts.check_kernel_parity import build_packed


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs import pallas_raster as pr

    rng = np.random.default_rng(0)
    tx, ty, tile_size = 4, 3, 16
    t_total, k = tx * ty, 2 * pr.CHUNK
    packed = build_packed(rng, t_total, k, tx, tile_size)

    cot_np = rng.standard_normal((t_total, 8, pr.P)).astype(np.float32)
    cot = jnp.asarray(cot_np)

    def loss_p(p):
        return jnp.sum(pr.composite_tiles(p, tx, ty, tile_size) * cot)

    def loss_r(p):
        return jnp.sum(pr.composite_tiles_reference(p, tx, ty, tile_size) * cot)

    g_p = np.asarray(jax.jit(jax.grad(loss_p))(packed))
    g_r = np.asarray(jax.jit(jax.grad(loss_r))(packed))
    scale = np.abs(g_r).max() + 1e-12
    err = np.abs(g_p - g_r) / scale
    print(f"scale {scale:.3e}  max rel {err.max():.3e}", flush=True)
    # per-tile, per-channel max
    per_tile = err.max(axis=(0, 2))
    per_chan = err.max(axis=(1, 2))
    print("per-tile  max rel:", np.array2string(per_tile, precision=2), flush=True)
    print("per-chan  max rel:", np.array2string(per_chan, precision=2), flush=True)
    # where exactly
    c, t, kk = np.unravel_index(err.argmax(), err.shape)
    print(f"worst at chan={c} tile={t} slot={kk}: pallas={g_p[c,t,kk]:.6e} "
          f"ref={g_r[c,t,kk]:.6e}", flush=True)
    a_raw = packed[8, t, kk] * 1.0
    print(f"  op={packed[8,t,kk]:.4f} ca={packed[2,t,kk]:.4f} "
          f"mx={packed[0,t,kk]:.2f} my={packed[1,t,kk]:.2f}", flush=True)


if __name__ == "__main__":
    main()
