"""Differentiable tile rasterizer for 3D gaussian splats — XLA implementation.

TPU-native replacement for the CUDA tile rasterizer (INRIA diff-gaussian-rasterization
/ gsplat). The CUDA design (dynamic per-tile lists, atomic counters, radix sort of
gaussian-tile pairs) is rebuilt with static shapes for XLA:

1. Gaussians are depth-sorted once per frame (XLA sort, O(N log N)).
2. Each gaussian emits up to MAX_COVER candidate (tile, gaussian) pairs from a fixed
   coverage grid over its screen bbox; a stable sort by tile id yields per-tile lists
   that inherit depth order.
3. Each tile takes its first `max_per_tile` pairs (static capacity K); compositing
   is a lax.scan over K in chunks with a running transmittance, rematerialized in
   the backward pass (jax.checkpoint) so memory stays bounded.

All shapes are static: image is padded to tile multiples, per-tile capacity and
coverage are fixed, and validity is carried in masks. This keeps one compiled
program for the whole training run.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Coverage grid: a gaussian may emit pairs to at most MAX_COVER_X x MAX_COVER_Y tiles.
# With 16px tiles this caps the rasterized extent at ~128px radius; gaussians larger
# than that lose tail coverage (they are rare and radii this large are clamped by
# the projection's 3-sigma bound in practice).
MAX_COVER_X = 8
MAX_COVER_Y = 8
ALPHA_THRESHOLD = 1.0 / 255.0
MAX_ALPHA = 0.999


class RasterOutput(NamedTuple):
    color: jnp.ndarray  # (H, W, 3)
    alpha: jnp.ndarray  # (H, W) accumulated opacity
    depth: jnp.ndarray  # (H, W) expected depth (alpha-weighted)


class Binning(NamedTuple):
    """tile_gaussians output (see its docstring for field semantics)."""

    gidx: jnp.ndarray         # (T, K) int32 extended gaussian ids
    gvalid: jnp.ndarray       # (T, K) bool
    slots_prim: jnp.ndarray   # (N, 2) int32 tier-0 + tier-1a inverse slots
    slots_mid: jnp.ndarray    # (K_mid, 2) int32 tier-1b inverse slots
    slots_big4: jnp.ndarray   # (K_big4, 16) int32 tier-2a inverse slots
    slots_big8: jnp.ndarray   # (K_big8, 64) int32 tier-2b inverse slots
    mid_order: jnp.ndarray    # (K_mid,) int32 original ids of tier 1b
    big4_order: jnp.ndarray   # (K_big4,) int32 original ids of tier 2a
    big8_order: jnp.ndarray   # (K_big8,) int32 original ids of tier 2b
    mid_overflow: jnp.ndarray  # () int32 diagnostic
    big_overflow: jnp.ndarray  # () int32 diagnostic (tier-2a + 2b overflow)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def tile_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    max_per_tile: int,
    opacities: Optional[jnp.ndarray] = None,
):
    """Bin gaussians into per-tile depth-ordered index lists.

    Returns a `Binning`:
      gidx:       (T, K) int32 EXTENDED gaussian indices, depth-ordered per
                  tile (tier-1/2 entries address rows appended after the
                  originals — see _pack_gather).
      gvalid:     (T, K) bool.
      slots_*:    inverse maps pair -> flat packed slot (T*K sentinel when
                  dropped), used for the gather-based gradient of packing.
      mid_order:  (K_mid,) original indices of the 2x2 multi-cell tier.
      big4_order/big8_order: original indices of the two large-coverage
                  size classes (spans 3-4 tiles / 5-8 tiles).
      mid_overflow: scalar int32, gaussians that needed tier 1 but were
                  beyond its capacity (diagnostic; 0 on healthy workloads).

    Everything stays in ORIGINAL gaussian index space — no permutation of the
    differentiable feature arrays ever happens, so no gradient ever needs a
    scatter. Tier layout (selection is the binning bottleneck on TPU — a
    top_k over N costs a full sort, so the design uses none on the hot
    per-gaussian paths):
      tier 0 : one key per gaussian — first live cell of its 2x2 grid
               (smalls), center tile (overflow bigs), sentinel otherwise.
      tier 1a: one UNCONDITIONAL key per gaussian — the second live cell when
               the gaussian straddles 2+ cells, sentinel otherwise. The
               gaussian id stays ORIGINAL (pure arithmetic on the pair id),
               so there is no selection pass and no appended pack rows.
      tier 1b: corner-crossers (3-4 live cells) compacted by cumsum+scatter
               into K_mid slots; 2 extra keys each (3rd + 4th cell).
      tier 2a: large gaussians spanning <= 4x4 tiles (the common big case)
               compacted into K_big4 slots; 4x4 grid each.
      tier 2b: the rest (spans 5-8 tiles) compacted into K_big8 slots; full
               MAX_COVER 8x8 grid each. Splitting 2a off 2b quarters the
               tier-2 sort keys — a 3x3 gaussian on the 8x8 grid was 55
               sentinels riding the sort for 9 live cells.
    Sentinel keys ride the sort (~2N of them), but one u32 sort scales far
    better than the three top_k selections it replaces (measured 26 -> 18 ms
    at 512K/720p). Keys pack (tile_id << shift | depth_rank) into one uint32
    so a single u32 sort yields per-tile depth order directly.
    """
    n = means2d.shape[0]
    tx = _ceil_div(width, tile_size)
    ty = _ceil_div(height, tile_size)
    t_total = tx * ty
    if t_total >= (1 << 16):
        from tpu_splat.core.errors import PipelineError

        raise PipelineError(
            765,
            f"render {width}x{height} has {t_total} tiles (max 65535); "
            f"increase the training downscale factor",
        )
    # Adaptive key split: tile id takes exactly the bits it needs (sentinel
    # value t_total included), depth rank gets the rest of the u32. A 720p
    # render keeps 20 depth bits; 4K still fits with 17.
    tile_bits = max(1, t_total.bit_length())
    shift = 32 - tile_bits

    valid = radii > 0
    # Monotonic depth key: for positive floats the IEEE bit pattern is
    # order-preserving, so the top bits of the depth ARE its sort rank — no
    # depth sort needed at all (ties below the rank granularity keep pair
    # order via the stable sort; order at near-equal depth is arbitrary).
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 1e-20).astype(jnp.float32), jnp.uint32
    )
    rank_u = depth_bits >> tile_bits

    # Tile-space bbox (inclusive), original index space.
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - radii) / tile_size), 0, tx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + radii) / tile_size), 0, tx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - radii) / tile_size), 0, ty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + radii) / tile_size), 0, ty - 1).astype(jnp.int32)
    big = valid & ((x1 - x0 > 1) | (y1 - y0 > 1))
    small = valid & ~big

    sentinel = jnp.uint32(t_total) << shift

    def tile_miss(mx, my, r, ptx, pty):
        """Exact-preserving circle-vs-tile cull for candidate pairs.

        The compositors zero any contribution with alpha < 1/255 (`live` in
        pallas_raster._chunk_alpha and composite_tiles_reference), and `radii`
        is already the alpha >= 1/255 iso-contour bound (projection.py:150),
        so a pair whose mean-to-tile-rect distance exceeds the radius is
        EXACTLY inert — culling it only removes dead packing slots (and frees
        K capacity in overflowing tiles, strictly improving those). The bbox
        grid alone keeps ~21% dead corner-tiles on large-coverage gaussians.
        The rect is padded 0.5px so every pixel-center sample stays inside."""
        lo_x = ptx.astype(jnp.float32) * tile_size - 0.5
        lo_y = pty.astype(jnp.float32) * tile_size - 0.5
        ddx = jnp.maximum(
            jnp.maximum(lo_x - mx, mx - (lo_x + tile_size)), 0.0)
        ddy = jnp.maximum(
            jnp.maximum(lo_y - my, my - (lo_y + tile_size)), 0.0)
        return ddx * ddx + ddy * ddy > r * r

    # The cull radius must bound the TRUE alpha >= 1/255 iso-contour: the
    # projected `radii` cap the extent at 3 sigma (projection.py:160), and
    # opaque gaussians still have live pixels beyond 3 sigma — undo the cap
    # by scaling with max(k_exact/3, 1). radii's ceil() and this max() both
    # only ever grow the bound, so the cull can never drop a live pair.
    if opacities is not None:
        k_exact = jnp.sqrt(jnp.maximum(
            2.0 * jnp.log(jnp.maximum(opacities * 255.0, 1e-6)), 0.0))
        radii_cull = radii * jnp.maximum(k_exact / 3.0, 1.0)
    else:
        # unknown opacities: assume op=1 (k_exact = sqrt(2 ln 255) ~ 3.33)
        radii_cull = radii * (math.sqrt(2.0 * math.log(255.0)) / 3.0)

    # Live cells of the 2x2 candidate grid for every small gaussian.
    dx1 = jnp.arange(4, dtype=jnp.int32) % 2
    dy1 = jnp.arange(4, dtype=jnp.int32) // 2
    px1 = x0[:, None] + dx1[None, :]
    py1 = y0[:, None] + dy1[None, :]
    live1 = small[:, None] & (px1 <= x1[:, None]) & (py1 <= y1[:, None])
    live1 &= ~tile_miss(means2d[:, None, 0], means2d[:, None, 1],
                        radii_cull[:, None], px1, py1)

    # Per-gaussian live-cell rank bookkeeping: ranks[i, c] = how many of the
    # first c+1 cells are live; rth_cell(r) = index of the r-th live cell.
    ranks = jnp.cumsum(live1.astype(jnp.int32), axis=1)
    n_live = ranks[:, 3]

    def rth_cell(r):
        return jnp.argmax(live1 & (ranks == r), axis=-1).astype(jnp.int32)

    def cell_tile(c):
        return ((y0 + c // 2) * tx + (x0 + c % 2)).astype(jnp.uint32)

    # Big compaction: cumsum + one tiny scatter (a top_k over N costs a full
    # sort; this is two orders cheaper). Order within each big set is
    # irrelevant — the slots/feat[order] mapping is internally consistent
    # either way. Bigs split into two SIZE CLASSES so the common case (span
    # 3-4 tiles) emits a 4x4 grid instead of the full 8x8 — at production
    # loads most tier-2 keys were sentinels from 3x3-4x4 gaussians riding a
    # 64-cell grid, and sentinel keys cost sort bytes (the binning
    # bottleneck).
    def _compact(mask, k):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        count = pos[-1] + 1
        slot = jnp.where(mask & (pos < k), pos, k)
        order = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:k]
        is_slot = jnp.arange(k) < count
        return order, is_slot, mask & (pos >= k), count

    big4 = big & (x1 - x0 <= 3) & (y1 - y0 <= 3)
    big8 = big & ~((x1 - x0 <= 3) & (y1 - y0 <= 3))
    # Generous floors: small-n maps (SfM init, early densification) have
    # LARGE projected radii — nearest-neighbor-sized init gaussians — so the
    # big fraction is highest exactly when n is smallest. A floor of 512
    # center-tile-degraded ~75% of a 4K-gaussian init scene's bigs; floors
    # this size cost <200K sort keys, invisible next to the ~2n primary keys
    # at production n.
    k_big4 = min(max(n // 64, 4096), n)
    k_big8 = min(max(n // 256, 2048), n)
    big4_order, is_big4_slot, unsel4, count4 = _compact(big4, k_big4)
    big8_order, is_big8_slot, unsel8, count8 = _compact(big8, k_big8)
    big_unsel = unsel4 | unsel8
    big_overflow = (jnp.maximum(count4 - k_big4, 0)
                    + jnp.maximum(count8 - k_big8, 0))

    # Tier 0: one key per gaussian. Smalls emit their first live 2x2 cell
    # (the cell holding the mean is always live, so every live small emits
    # exactly one key). Bigs that don't make the tier-2 cap emit the tile
    # containing their mean — graceful center-tile degradation instead of
    # vanishing (tier-2-selected bigs must NOT also emit here: their grid
    # already covers the center cell and a duplicate pair would composite
    # the gaussian twice).
    prim = rth_cell(1)
    ok0 = n_live >= 1
    tile0 = cell_tile(prim)
    cxt = jnp.clip((means2d[:, 0] // tile_size).astype(jnp.int32), 0, tx - 1)
    cyt = jnp.clip((means2d[:, 1] // tile_size).astype(jnp.int32), 0, ty - 1)
    tile0 = jnp.where(big_unsel, (cyt * tx + cxt).astype(jnp.uint32), tile0)
    keys0 = jnp.where(ok0 | big_unsel, (tile0 << shift) | rank_u,
                      sentinel | rank_u)

    # Tier 1a: one unconditional key per gaussian — the second live cell for
    # 2+-cell straddlers, a sentinel otherwise. No selection pass, no order
    # table, no appended pack rows: the kernel-side id is the ORIGINAL
    # gaussian id (pid - n). ~Half these keys are sentinels, but they cost
    # only sort bytes — cheaper than any per-gaussian selection.
    sec = rth_cell(2)
    keys1a = jnp.where(n_live >= 2, (cell_tile(sec) << shift) | rank_u,
                       sentinel | rank_u)

    # Tier 1b: corner-crossers (3-4 live cells) compacted into k_mid slots,
    # 2 extra keys each (3rd + 4th live cell). The 8192 floor means scenes
    # up to 8K gaussians can never overflow (test fixtures, early maps).
    # Overflowed corner-crossers keep their first two cells (tiers 0+1a) —
    # graceful degradation, not disappearance; mid_overflow counts them.
    k_mid = min(max(n // 16, 8192), n)
    corner = n_live >= 3
    pos_m = jnp.cumsum(corner.astype(jnp.int32)) - 1
    mid_count = pos_m[-1] + 1
    slot_m = jnp.where(corner & (pos_m < k_mid), pos_m, k_mid)
    mid_order = jnp.zeros((k_mid + 1,), jnp.int32).at[slot_m].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:k_mid]
    is_mid = jnp.arange(k_mid) < mid_count
    mid_overflow = jnp.maximum(mid_count - k_mid, 0)

    c3 = rth_cell(3)[mid_order]
    c4 = rth_cell(4)[mid_order]
    rank_mid = rank_u[mid_order]
    t3 = ((y0[mid_order] + c3 // 2) * tx
          + (x0[mid_order] + c3 % 2)).astype(jnp.uint32)
    t4 = ((y0[mid_order] + c4 // 2) * tx
          + (x0[mid_order] + c4 % 2)).astype(jnp.uint32)
    keys1b = jnp.stack([
        jnp.where(is_mid, (t3 << shift) | rank_mid, sentinel | rank_mid),
        jnp.where(is_mid & (n_live[mid_order] >= 4),
                  (t4 << shift) | rank_mid, sentinel | rank_mid),
    ], axis=1).reshape(-1)

    # Tier 2: coverage-grid keys for the compacted large-gaussian classes
    # (4x4 grid for spans <= 4, the full 8x8 for the rest).
    def _grid_keys(order, is_slot, gw, gh):
        m = gw * gh
        dxg = jnp.arange(m, dtype=jnp.int32) % gw
        dyg = jnp.arange(m, dtype=jnp.int32) // gw
        pxg = x0[order][:, None] + dxg[None, :]
        pyg = y0[order][:, None] + dyg[None, :]
        ok = (
            is_slot[:, None]
            & (pxg <= x1[order][:, None])
            & (pyg <= y1[order][:, None])
        )
        ok &= ~tile_miss(means2d[order][:, None, 0],
                         means2d[order][:, None, 1],
                         radii_cull[order][:, None], pxg, pyg)
        rk = rank_u[order]
        tileg = (pyg * tx + pxg).astype(jnp.uint32)
        return jnp.where(ok, (tileg << shift) | rk[:, None],
                         sentinel | rk[:, None]).reshape(-1)

    m2a = 16
    m2 = MAX_COVER_X * MAX_COVER_Y
    keys2a = _grid_keys(big4_order, is_big4_slot, 4, 4)
    keys2b = _grid_keys(big8_order, is_big8_slot, MAX_COVER_X, MAX_COVER_Y)

    keys = jnp.concatenate([keys0, keys1a, keys1b, keys2a, keys2b])
    np_total = keys.shape[0]
    pair_ids = jnp.arange(np_total, dtype=jnp.int32)
    sorted_keys, sorted_pid = jax.lax.sort_key_val(keys, pair_ids)
    sorted_tile = (sorted_keys >> shift).astype(jnp.int32)
    # The kernel-side gaussian id is pure arithmetic on the sorted pair id —
    # tier-0 AND tier-1a pairs map to the ORIGINAL id (pid, pid - n), tier
    # 1b/2 pairs to EXTENDED ids past n (the pack gather appends
    # feat[big4_order], feat[big8_order], then feat[mid_order] rows after
    # the originals), so no gid payload rides the sort and no order-table
    # gather happens.
    n1a = 2 * n
    n1b = n1a + 2 * k_mid
    n2a = n1b + m2a * k_big4
    sorted_gid = jnp.where(
        sorted_pid < n,
        sorted_pid,
        jnp.where(
            sorted_pid < n1a,
            sorted_pid - n,
            jnp.where(
                sorted_pid < n1b,
                n + k_big4 + k_big8 + (sorted_pid - n1a) // 2,
                jnp.where(
                    sorted_pid < n2a,
                    n + (sorted_pid - n1b) // m2a,
                    n + k_big4 + (sorted_pid - n2a) // m2,
                ),
            ),
        ),
    ).astype(jnp.int32)

    starts = jnp.searchsorted(sorted_tile, jnp.arange(t_total + 1, dtype=jnp.int32))
    tile_start = starts[:-1]  # (T,)
    tile_end = starts[1:]

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    pos = tile_start[:, None] + k[None, :]  # (T, K)
    gvalid = pos < tile_end[:, None]
    # Each tile's gaussian ids are a CONTIGUOUS run of the sorted array, so
    # read them as T dynamic slices of length K (one gather of 2KB rows)
    # instead of sorted_gid[pos] (T*K scalar gathers — ~15ms slower at
    # production sizes). K sentinel pads keep every slice in bounds.
    sorted_gid_pad = jnp.concatenate(
        [sorted_gid, jnp.zeros((max_per_tile,), jnp.int32)]
    )
    gidx = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sorted_gid_pad, (s,), (max_per_tile,))
    )(tile_start)

    # Inverse mapping pair -> packed slot, for the gather-based gradient (the
    # scatter-add transpose of the packing gather is ~10x slower on TPU than
    # one extra sort + gathers). Each sorted position's slot is its offset
    # from the start of its tile's run — a run-start cummax instead of a
    # tile_start[] table gather (2.6M scalar gathers cost ~10ms); the inverse
    # sort then carries the slot as its payload, so no gather-by-position.
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, pair_ids, 0))
    k_in_tile = pair_ids - run_start
    slot_sorted = jnp.where(
        (sorted_tile < t_total) & (k_in_tile < max_per_tile),
        sorted_tile * max_per_tile + k_in_tile,
        t_total * max_per_tile,
    )
    _, slot = jax.lax.sort_key_val(sorted_pid, slot_sorted)
    # Tiers 0 and 1a both address ORIGINAL rows, so they share the (N, 2)
    # primary route (sentinel slots route to the zero row in the gradient
    # gather); tier 1b gets its own (K_mid, 2) table over mid_order rows,
    # tiers 2a/2b their (K_big4, 16) / (K_big8, 64) tables.
    slots_prim = slot[:n1a].reshape(2, n).T
    slots_mid = slot[n1a:n1b].reshape(k_mid, 2)
    slots_big4 = slot[n1b:n2a].reshape(k_big4, m2a)
    slots_big8 = slot[n2a:].reshape(k_big8, m2)
    return Binning(gidx, gvalid, slots_prim, slots_mid, slots_big4,
                   slots_big8, mid_order, big4_order, big8_order,
                   mid_overflow, big_overflow)


def _use_pallas() -> bool:
    """Pallas kernels on real accelerators; the XLA reference path on CPU."""
    return jax.default_backend() not in ("cpu",)


def pack_quantization(means2d, conics, colors, opacities, depths):
    """The value rounding the bf16 gather layout applies (exposed so tests can
    quantize reference-renderer inputs identically). means2d ride as a bf16
    hi+lo pair (~16-bit mantissa, <=0.02px at 4K); everything else is plain
    bf16 (2^-8 relative — under the 8-bit display floor of 1/255)."""
    deq = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    hi = deq(means2d)
    m2d = hi + deq(means2d - hi)
    return m2d, deq(conics), deq(colors), deq(opacities), deq(depths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _pack_gather(feat, gidx_ext, slots_prim, slots_mid, slots_big4,
                 slots_big8, mid_order, big4_order, big8_order, tk: int):
    """Gather feature rows into channel-major (16, T, K) tile blocks.

    The source table is [feat; feat[big4_order]; feat[big8_order];
    feat[mid_order]; zero sentinel] — tier-1/2 pair ids address the appended
    copies so the binning sort needs no gaussian-id payload.
    Channel-major keeps K on the 128-lane axis — a trailing dim of 16
    wastes 7/8 of HBM bandwidth on every DMA. The custom VJP turns the gradient
    scatter-add (slow on TPU) into gathers via the precomputed inverse slot
    maps.

    The gather itself runs on a bf16 re-encoding of the rows: a narrow (N,16)
    table pads to 128 HBM lanes either way, so halving the element size halves
    the padded bytes every row-gather actually reads. means2d are split into
    bf16 hi+lo channels (reconstructed to ~16-bit-mantissa f32 after the
    gather); the remaining channels round to bf16 — the exact rounding is
    exposed as pack_quantization(). The VJP treats the rounding as identity
    (straight-through), which is exact up to 2^-8 on individual per-pair
    contributions — the same quantization the gradient route below already
    applies."""
    # encode (f32 16ch) -> (bf16 16ch): 0 mx_hi 1 my_hi 2 mx_lo 3 my_lo
    # 4:6 conic(a,b) 6 conic(c) 7:10 rgb 10 op 11 depth 12:16 pad
    f16 = feat.astype(jnp.bfloat16)
    lo = (feat[:, 0:2] - f16[:, 0:2].astype(jnp.float32)).astype(jnp.bfloat16)
    enc = jnp.concatenate(
        [f16[:, 0:2], lo, f16[:, 2:10], jnp.zeros_like(f16[:, :4])], axis=1
    )
    enc_ext = jnp.concatenate(
        [enc, enc[big4_order], enc[big8_order], enc[mid_order],
         jnp.zeros_like(enc[:1])], axis=0
    )
    t, k = gidx_ext.shape
    g = enc_ext[gidx_ext.reshape(-1)].T.reshape(feat.shape[1], t, k)
    gf = g.astype(jnp.float32)
    # decode back to the kernel layout: mean2d = hi + lo, rest passthrough
    return jnp.concatenate(
        [gf[0:2] + gf[2:4], gf[4:12],
         jnp.zeros_like(gf[0:6])], axis=0
    )


def _pack_gather_fwd(feat, gidx_ext, slots_prim, slots_mid, slots_big4,
                     slots_big8, mid_order, big4_order, big8_order, tk):
    out = _pack_gather(feat, gidx_ext, slots_prim, slots_mid, slots_big4,
                       slots_big8, mid_order, big4_order, big8_order, tk)
    return out, (slots_prim, slots_mid, slots_big4, slots_big8,
                 mid_order, big4_order, big8_order)


def _pack_gather_bwd(tk, res, d_packed):
    (slots_prim, slots_mid, slots_big4, slots_big8,
     mid_order, big4_order, big8_order) = res
    c = d_packed.shape[0]
    tk8 = tk // 8
    # A (TK, C) row table pads C=16 lanes to 128 in HBM (8x the bytes, ~54ms
    # of wasted bandwidth at production sizes). Instead regroup 8 slots per
    # 128-lane row (lane = channel*8 + slot%8): the transpose costs ~6ms and
    # every gathered row is fully dense. The row table, mask, and matmul run
    # in bf16 (accumulation in f32): halves the gather + masked-temp traffic
    # (35.7 -> 14.4 ms at 2.1M pairs, measured) and only quantizes individual
    # per-pair gradient contributions by 2^-8 relative — far below training
    # noise (the f32 route is bit-available via precision="highest" if ever
    # needed for debugging).
    d8 = d_packed.astype(jnp.bfloat16)
    d8 = d8.reshape(c, tk8, 8).transpose(1, 0, 2).reshape(tk8, c * 8)
    d8 = jnp.concatenate([d8, jnp.zeros((1, c * 8), jnp.bfloat16)], axis=0)

    # Reduce 128-lane rows to 16 channels with a lane mask + one constant MXU
    # matmul — strided lane slices materialize 16x-padded intermediates and
    # cost 4x more.
    lane = jnp.arange(c * 8, dtype=jnp.int32)[None, :]
    reduce_mat = (
        (jnp.arange(c * 8)[:, None] // 8) == jnp.arange(c)[None, :]
    ).astype(jnp.bfloat16)

    def route(slots):
        flat = slots.reshape(-1)
        rows = d8[flat >> 3]  # (M, 128); sentinel slot tk -> zero row tk8
        mask = ((lane & 7) == (flat & 7)[:, None]).astype(jnp.bfloat16)
        m_per = slots.shape[1]
        masked = (rows * mask).reshape(slots.shape[0], m_per * c * 8)
        return jnp.dot(
            masked, jnp.tile(reduce_mat, (m_per, 1)),
            preferred_element_type=jnp.float32,
        )

    d_feat = route(slots_prim)
    d_feat = d_feat.at[big4_order].add(route(slots_big4))
    d_feat = d_feat.at[big8_order].add(route(slots_big8))
    d_feat = d_feat.at[mid_order].add(route(slots_mid))
    return d_feat, None, None, None, None, None, None, None, None


_pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "max_per_tile", "backend"),
)
def rasterize(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    width: int,
    height: int,
    background: Optional[jnp.ndarray] = None,
    tile_size: int = 16,
    max_per_tile: int = 512,
    backend: str = "auto",
) -> RasterOutput:
    """Alpha-composite projected gaussians into an image.

    means2d (N,2), conics (N,3), colors (N,3), opacities (N,) post-sigmoid,
    depths (N,), radii (N,) with 0 = culled. Compositing runs in a Pallas TPU
    kernel (pallas_raster.py) or the equivalent XLA reference on CPU.
    """
    from tpu_splat.gs import pallas_raster as pr

    assert tile_size == 16, "kernels assume 16x16 tiles"
    assert max_per_tile % pr.CHUNK == 0
    tx = _ceil_div(width, tile_size)
    ty = _ceil_div(height, tile_size)
    t_total = tx * ty

    b = tile_gaussians(
        means2d, depths, radii, width, height, tile_size, max_per_tile,
        opacities=opacities,
    )

    # Pack per-tile gaussian blocks: one gather in the kernel channel layout,
    # with a zero sentinel row so invalid slots read opacity 0 (no scatter).
    feat = jnp.concatenate(
        [means2d, conics, colors, opacities[:, None], depths[:, None],
         jnp.zeros((means2d.shape[0], pr.C_PACK - 10), means2d.dtype)],
        axis=-1,
    )  # (N, 16)
    sentinel_row = (
        feat.shape[0] + b.big4_order.shape[0] + b.big8_order.shape[0]
        + b.mid_order.shape[0]
    )
    gidx_ext = jnp.where(b.gvalid, b.gidx, sentinel_row)
    packed = _pack_gather(feat, gidx_ext, b.slots_prim, b.slots_mid,
                          b.slots_big4, b.slots_big8, b.mid_order,
                          b.big4_order, b.big8_order,
                          t_total * max_per_tile)

    use_pallas = backend == "pallas" or (backend == "auto" and _use_pallas())
    if use_pallas:
        # per-tile run lengths let the kernel skip whole sentinel chunks
        counts = jnp.sum(b.gvalid, axis=1, dtype=jnp.int32)
        out8 = pr.composite_tiles(packed, tx, ty, tile_size, counts=counts)
    else:
        out8 = pr.composite_tiles_reference(packed, tx, ty, tile_size)

    accum = jnp.transpose(out8[:, 0:3, :], (0, 2, 1))  # (T, P, 3)
    alpha_t = out8[:, 3, :]
    depth_t = out8[:, 4, :]
    trans = 1.0 - alpha_t

    if background is not None:
        accum = accum + trans[..., None] * background

    # Untile: (T, P, C) -> (H, W, C).
    p = tile_size * tile_size

    def untile(arr, c):
        img = arr.reshape(ty, tx, tile_size, tile_size, c)
        img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
            ty * tile_size, tx * tile_size, c
        )
        return img[:height, :width]

    color = untile(accum, 3)
    alpha = untile(alpha_t[..., None], 1)[..., 0]
    depth = untile(depth_t[..., None], 1)[..., 0]
    return RasterOutput(color=color, alpha=alpha, depth=depth)
