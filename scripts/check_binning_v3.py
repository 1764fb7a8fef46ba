"""CPU equivalence check: tile_gaussians V3 vs current, via full renders.

Renders the same random splat set through rasterize() with each binning and
compares images. Run: python scripts/check_binning_v3.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tpu_splat.gs import pallas_raster as pr  # noqa: E402
from tpu_splat.gs import rasterize as rz  # noqa: E402
from scripts._binning_v3 import tile_gaussians_v3  # noqa: E402


def render_with(tile_fn, means2d, conics, colors, opac, depths, radii, w, h, k):
    tx = rz._ceil_div(w, 16)
    ty = rz._ceil_div(h, 16)
    b = tile_fn(means2d, depths, radii, w, h, 16, k, opacities=opac)
    feat = jnp.concatenate(
        [means2d, conics, colors, opac[:, None], depths[:, None],
         jnp.zeros((means2d.shape[0], pr.C_PACK - 10), means2d.dtype)], axis=-1)
    sentinel_row = feat.shape[0] + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sentinel_row)
    packed = rz._pack_gather(feat, gidx_ext, b.slots_prim, b.slots_mid,
                             b.slots_big4, b.slots_big8, b.mid_order, b.big4_order, b.big8_order,
                             tx * ty * k)
    out8 = pr.composite_tiles_reference(packed, tx, ty, 16)
    return out8, b


def grad_with(tile_fn, means2d, conics, colors, opac, depths, radii, w, h, k):
    tx = rz._ceil_div(w, 16)
    ty = rz._ceil_div(h, 16)
    b = tile_fn(means2d, depths, radii, w, h, 16, k, opacities=opac)

    def loss(means2d, conics, colors, opac):
        feat = jnp.concatenate(
            [means2d, conics, colors, opac[:, None], depths[:, None],
             jnp.zeros((means2d.shape[0], pr.C_PACK - 10), means2d.dtype)],
            axis=-1)
        sentinel_row = (feat.shape[0] + b.big4_order.shape[0] + b.big8_order.shape[0]
                        + b.mid_order.shape[0])
        gidx_ext = jnp.where(b.gvalid, b.gidx, sentinel_row)
        packed = rz._pack_gather(feat, gidx_ext, b.slots_prim, b.slots_mid,
                                 b.slots_big4, b.slots_big8, b.mid_order, b.big4_order, b.big8_order,
                                 tx * ty * k)
        out8 = pr.composite_tiles_reference(packed, tx, ty, 16)
        return jnp.sum(out8[:, 0:4, :] ** 2)

    return jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)


def main():
    rng = np.random.default_rng(7)
    w, h, k = 320, 192, 256
    for n, mix in ((4096, "normal"), (16384, "bigheavy")):
        means2d = jnp.asarray(
            rng.uniform([-30, -30], [w + 30, h + 30], (n, 2)), jnp.float32)
        depths = jnp.asarray(rng.uniform(0.5, 8.0, n), jnp.float32)
        # Exact-image equivalence only holds when no tier overflows on
        # EITHER side (v3's big cap is a fixed 512 at these n; overflow
        # degradation is capacity-dependent by design). Body radii <= 8 can
        # never be "big" (diameter <= one tile crosses at most one boundary
        # per axis); exactly 400 tail gaussians carry the big load, under
        # v3's 512 cap and spread over both v4 size classes.
        r = rng.uniform(1.0, 8.0, n)
        hi = 80.0 if mix == "bigheavy" else 26.0
        r[:400] = rng.uniform(10.0, hi, 400)
        radii = jnp.asarray(r, jnp.float32)
        radii = jnp.where(jnp.asarray(rng.random(n) < 0.05), 0.0, radii)
        sig = radii / 3.0
        conics = jnp.stack(
            [1.0 / (sig ** 2 + 1e-6), jnp.zeros(n), 1.0 / (sig ** 2 + 1e-6)],
            axis=1).astype(jnp.float32)
        colors = jnp.asarray(rng.random((n, 3)), jnp.float32)
        opac = jnp.asarray(rng.uniform(0.05, 0.99, n), jnp.float32)

        out_cur, b_cur = render_with(rz.tile_gaussians, means2d, conics,
                                     colors, opac, depths, radii, w, h, k)
        out_v3, b_v3 = render_with(tile_gaussians_v3, means2d, conics,
                                   colors, opac, depths, radii, w, h, k)
        img_diff = float(jnp.max(jnp.abs(out_cur[:, 0:5] - out_v3[:, 0:5])))
        occ_cur = int(jnp.sum(b_cur.gvalid))
        occ_v3 = int(jnp.sum(b_v3.gvalid))
        print(f"n={n} {mix}: max|img diff|={img_diff:.3e} "
              f"pairs cur={occ_cur} v3={occ_v3} "
              f"ovf cur={int(b_cur.mid_overflow)}/{int(b_cur.big_overflow)} "
              f"v3={int(b_v3.mid_overflow)}")
        assert int(b_cur.big_overflow) == 0, "scene overflows a big class"
        assert occ_cur == occ_v3, "pair counts differ without overflow"

        g_cur = grad_with(rz.tile_gaussians, means2d, conics, colors, opac,
                          depths, radii, w, h, k)
        g_v3 = grad_with(tile_gaussians_v3, means2d, conics, colors, opac,
                         depths, radii, w, h, k)
        for name, a, c in zip(("means2d", "conics", "colors", "opac"),
                              g_cur, g_v3):
            d = float(jnp.max(jnp.abs(a - c)))
            s = float(jnp.max(jnp.abs(a)) + 1e-12)
            print(f"    grad {name}: max|diff|={d:.3e} (rel {d / s:.2e})")
        assert img_diff < 1e-5, "render mismatch"
    print("binning v3 equivalence OK")


if __name__ == "__main__":
    main()
