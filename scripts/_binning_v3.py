"""Candidate redesign of tile_gaussians: no top_k, no big selection sort.

Tier layout (vs rasterize.tile_gaussians's 0/1a/1b/2):
  tier 0 : one key per gaussian — primary live cell (smalls), center tile
           (overflow bigs), sentinel otherwise.                       [n keys]
  tier 1a: one key per gaussian, unconditional — the SECOND live cell if the
           gaussian straddles 2+ cells, sentinel otherwise. gid is the
           ORIGINAL id (pure arithmetic pid - n), so no selection, no order
           table, no appended pack rows.                              [n keys]
  tier 1b: corner-crossers (3-4 live cells) compacted by cumsum+scatter into
           k_mid slots; 2 extra keys each (3rd + 4th live cell).  [2*k_mid]
  tier 2 : bigs compacted by cumsum+scatter into k_big slots, full
           MAX_COVER grid.                                        [m2*k_big]

Selection overhead drops from 3x top_k over N (each a full sort) + 1 scatter
to 2 cumsums + 2 tiny scatters. Sort grows ~1.3M -> ~1.64M u32 keys.
Interface-compatible with rasterize.Binning / _pack_gather: slots_prim is
(N, 2) (tiers 0+1a share the route), mid_order/slots_mid cover tier 1b.
"""

import math

import jax
import jax.numpy as jnp

from tpu_splat.gs.rasterize import (
    MAX_COVER_X,
    MAX_COVER_Y,
    Binning,
    _ceil_div,
)


def tile_gaussians_v3(means2d, depths, radii, width, height, tile_size,
                      max_per_tile, opacities=None):
    n = means2d.shape[0]
    tx = _ceil_div(width, tile_size)
    ty = _ceil_div(height, tile_size)
    t_total = tx * ty
    tile_bits = max(1, t_total.bit_length())
    shift = 32 - tile_bits

    valid = radii > 0
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 1e-20).astype(jnp.float32), jnp.uint32
    )
    rank_u = depth_bits >> tile_bits

    x0 = jnp.clip(jnp.floor((means2d[:, 0] - radii) / tile_size), 0, tx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + radii) / tile_size), 0, tx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - radii) / tile_size), 0, ty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + radii) / tile_size), 0, ty - 1).astype(jnp.int32)
    big = valid & ((x1 - x0 > 1) | (y1 - y0 > 1))
    small = valid & ~big

    sentinel = jnp.uint32(t_total) << shift

    def tile_miss(mx, my, r, ptx, pty):
        lo_x = ptx.astype(jnp.float32) * tile_size - 0.5
        lo_y = pty.astype(jnp.float32) * tile_size - 0.5
        ddx = jnp.maximum(jnp.maximum(lo_x - mx, mx - (lo_x + tile_size)), 0.0)
        ddy = jnp.maximum(jnp.maximum(lo_y - my, my - (lo_y + tile_size)), 0.0)
        return ddx * ddx + ddy * ddy > r * r

    if opacities is not None:
        k_exact = jnp.sqrt(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(opacities * 255.0, 1e-6)), 0.0))
        radii_cull = radii * jnp.maximum(k_exact / 3.0, 1.0)
    else:
        radii_cull = radii * (math.sqrt(2.0 * math.log(255.0)) / 3.0)

    dx1 = jnp.arange(4, dtype=jnp.int32) % 2
    dy1 = jnp.arange(4, dtype=jnp.int32) // 2
    px1 = x0[:, None] + dx1[None, :]
    py1 = y0[:, None] + dy1[None, :]
    live1 = small[:, None] & (px1 <= x1[:, None]) & (py1 <= y1[:, None])
    live1 &= ~tile_miss(means2d[:, None, 0], means2d[:, None, 1],
                        radii_cull[:, None], px1, py1)

    ranks = jnp.cumsum(live1.astype(jnp.int32), axis=1)  # rank among live cells
    n_live = ranks[:, 3]

    def rth_cell(r):
        """Index (0..3) of the r-th live cell; 0 if none."""
        return jnp.argmax(live1 & (ranks == r), axis=-1).astype(jnp.int32)

    def cell_tile(c):
        return ((y0 + c // 2) * tx + (x0 + c % 2)).astype(jnp.uint32)

    # --- big compaction: cumsum + tiny scatter (replaces top_k) ---
    k_big = min(max(n // 64, 512), n)
    pos_b = jnp.cumsum(big.astype(jnp.int32)) - 1
    big_count = pos_b[-1] + 1
    slot_b = jnp.where(big & (pos_b < k_big), pos_b, k_big)
    big_order = jnp.zeros((k_big + 1,), jnp.int32).at[slot_b].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k_big]
    is_big_slot = jnp.arange(k_big) < big_count
    big_unsel = big & (pos_b >= k_big)

    # --- tier 0 ---
    prim = rth_cell(1)
    ok0 = n_live >= 1
    tile0 = cell_tile(prim)
    cxt = jnp.clip((means2d[:, 0] // tile_size).astype(jnp.int32), 0, tx - 1)
    cyt = jnp.clip((means2d[:, 1] // tile_size).astype(jnp.int32), 0, ty - 1)
    tile0 = jnp.where(big_unsel, (cyt * tx + cxt).astype(jnp.uint32), tile0)
    keys0 = jnp.where(ok0 | big_unsel, (tile0 << shift) | rank_u,
                      sentinel | rank_u)

    # --- tier 1a: unconditional second cell ---
    sec = rth_cell(2)
    keys1a = jnp.where(n_live >= 2, (cell_tile(sec) << shift) | rank_u,
                       sentinel | rank_u)

    # --- tier 1b: corner crossers, compacted ---
    k_mid = min(max(n // 16, 8192), n)
    corner = n_live >= 3
    pos_m = jnp.cumsum(corner.astype(jnp.int32)) - 1
    mid_count = pos_m[-1] + 1
    slot_m = jnp.where(corner & (pos_m < k_mid), pos_m, k_mid)
    mid_order = jnp.zeros((k_mid + 1,), jnp.int32).at[slot_m].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k_mid]
    is_mid = jnp.arange(k_mid) < mid_count
    # unselected bigs degrade to a tier-0 center-tile key (not an overflow,
    # matching tile_gaussians semantics); only corner-crossers past k_mid are.
    mid_overflow = jnp.maximum(mid_count - k_mid, 0)

    c3 = rth_cell(3)[mid_order]
    c4 = rth_cell(4)[mid_order]
    rank_mid = rank_u[mid_order]
    t3 = ((y0[mid_order] + c3 // 2) * tx + (x0[mid_order] + c3 % 2)).astype(jnp.uint32)
    t4 = ((y0[mid_order] + c4 // 2) * tx + (x0[mid_order] + c4 % 2)).astype(jnp.uint32)
    keys1b = jnp.stack([
        jnp.where(is_mid, (t3 << shift) | rank_mid, sentinel | rank_mid),
        jnp.where(is_mid & (n_live[mid_order] >= 4),
                  (t4 << shift) | rank_mid, sentinel | rank_mid),
    ], axis=1).reshape(-1)

    # --- tier 2 ---
    m2 = MAX_COVER_X * MAX_COVER_Y
    dx2 = jnp.arange(m2, dtype=jnp.int32) % MAX_COVER_X
    dy2 = jnp.arange(m2, dtype=jnp.int32) // MAX_COVER_X
    px2 = x0[big_order][:, None] + dx2[None, :]
    py2 = y0[big_order][:, None] + dy2[None, :]
    ok2 = (is_big_slot[:, None]
           & (px2 <= x1[big_order][:, None])
           & (py2 <= y1[big_order][:, None]))
    ok2 &= ~tile_miss(means2d[big_order][:, None, 0],
                      means2d[big_order][:, None, 1],
                      radii_cull[big_order][:, None], px2, py2)
    rank_big = rank_u[big_order]
    tile2 = (py2 * tx + px2).astype(jnp.uint32)
    keys2 = jnp.where(ok2, (tile2 << shift) | rank_big[:, None],
                      sentinel | rank_big[:, None]).reshape(-1)

    keys = jnp.concatenate([keys0, keys1a, keys1b, keys2])
    np_total = keys.shape[0]
    pair_ids = jnp.arange(np_total, dtype=jnp.int32)
    sorted_keys, sorted_pid = jax.lax.sort_key_val(keys, pair_ids)
    sorted_tile = (sorted_keys >> shift).astype(jnp.int32)

    n1a = 2 * n
    n1b = n1a + 2 * k_mid
    sorted_gid = jnp.where(
        sorted_pid < n,
        sorted_pid,
        jnp.where(
            sorted_pid < n1a,
            sorted_pid - n,
            jnp.where(
                sorted_pid < n1b,
                n + k_big + (sorted_pid - n1a) // 2,
                n + (sorted_pid - n1b) // m2,
            ),
        ),
    ).astype(jnp.int32)

    starts = jnp.searchsorted(sorted_tile, jnp.arange(t_total + 1, dtype=jnp.int32))
    tile_start = starts[:-1]
    tile_end = starts[1:]

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    pos = tile_start[:, None] + k[None, :]
    gvalid = pos < tile_end[:, None]
    sorted_gid_pad = jnp.concatenate(
        [sorted_gid, jnp.zeros((max_per_tile,), jnp.int32)])
    gidx = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted_gid_pad, (s,), (max_per_tile,))
    )(tile_start)

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]])
    run_start = jax.lax.cummax(jnp.where(is_start, pair_ids, 0))
    k_in_tile = pair_ids - run_start
    slot_sorted = jnp.where(
        (sorted_tile < t_total) & (k_in_tile < max_per_tile),
        sorted_tile * max_per_tile + k_in_tile,
        t_total * max_per_tile,
    )
    _, slot = jax.lax.sort_key_val(sorted_pid, slot_sorted)
    slots_prim = slot[:n1a].reshape(2, n).T  # (N, 2): tier0 + tier1a
    slots_mid = slot[n1a:n1b].reshape(k_mid, 2)
    slots_big = slot[n1b:].reshape(k_big, m2)
    # Adapt to the v4 Binning (split big4/big8 classes): present v3's single
    # big class as big8 with an EMPTY big4 — the extended-row layouts then
    # coincide (big rows at n.., mid rows at n+k_big..), so v3 binnings keep
    # flowing through the v4 _pack_gather unchanged for A/B comparisons.
    empty_i = jnp.zeros((0,), jnp.int32)
    return Binning(gidx, gvalid, slots_prim, slots_mid,
                   jnp.zeros((0, 16), jnp.int32), slots_big,
                   mid_order, empty_i, big_order, mid_overflow,
                   jnp.int32(0))
