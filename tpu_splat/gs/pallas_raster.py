"""Pallas TPU kernels for tile compositing — the rasterizer's hot loop.

The XLA scan in rasterize.py materializes (T, chunk, 256) alpha tensors in HBM
every step and rematerializes them in the backward pass; at production sizes that
is bandwidth-bound by an order of magnitude. These kernels keep each tile's
gaussian block and running transmittance in VMEM:

- forward: per-tile alpha compositing over depth-ordered gaussians with early
  termination once the tile saturates (transmittance < 1e-4); chunk-start
  transmittances are written out as checkpoints.
- backward: the classic analytic 3DGS gradient — a single reverse sweep
  accumulating dL/d(mean2d, conic, color, opacity) per gaussian from the
  forward's checkpoints; chunks the forward never reached are skipped (their
  true gradient is exactly zero).

Both operate on a packed (T, K, 16) tensor (built by one XLA gather); the
custom_vjp returns d_packed so JAX's autodiff scatters gradients back to the
per-gaussian arrays through the packing gather. Channel layout:
  0:2 mean2d | 2:5 conic(a,b,c) | 5:8 rgb | 8 opacity | 9 depth | 10:16 pad
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_splat.gs.rasterize import ALPHA_THRESHOLD, MAX_ALPHA

C_PACK = 16
CHUNK = 128  # gaussians per inner step; lane-aligned so the packed (16, T, K)
# blocks can be sliced along K, and the triangular prefix ops use full MXU tiles
P = 256  # pixels per 16x16 tile
# Stop compositing a tile once every pixel's transmittance is below this
# (classic 3DGS saturation exit). The reference applies the identical
# tile-level gate so CPU/TPU semantics (and the parity harness) stay exact.
# Raising to 1e-3 was measured a no-op for speed — the chunk-quantized exit
# almost never moves a chunk boundary — so the conservative value stays.
TERM_THRESHOLD = 1e-4


def _pixel_coords(tile_id, tx: int, tile_size: int):
    """(1, P) pixel-center x and y for this tile."""
    tile_x = (tile_id % tx) * tile_size
    tile_y = (tile_id // tx) * tile_size
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tile_x + lin % tile_size).astype(jnp.float32) + 0.5
    py = (tile_y + lin // tile_size).astype(jnp.float32) + 0.5
    return px, py


def _triu_strict():
    # strictly-upper-triangular ones (diag excluded): strict suffix-sum operator
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (c > r).astype(jnp.float32)


def _prefix_products(one_minus):
    """(excl, total): exclusive prefix products of (CHUNK, P) along axis 0 and
    the (1, P) full product — a Hillis-Steele doubling scan of multiplies
    (7 roll+select+mul rounds). Replaces the earlier log/exp + triangular-
    matmul formulation: same math, but zero transcendentals (the log/exp pair
    was ~2/3 of the kernel's transcendental budget, which dominates its
    runtime) and bitwise-closer to the reference cumprod."""
    row = jax.lax.broadcasted_iota(jnp.int32, one_minus.shape, 0)
    t = one_minus
    s = 1
    while s < CHUNK:
        sh = pltpu.roll(t, shift=s, axis=0)
        t = t * jnp.where(row < s, 1.0, sh)
        s *= 2
    excl = jnp.where(row < 1, 1.0, pltpu.roll(t, shift=1, axis=0))
    return excl, t[CHUNK - 1 : CHUNK, :]


def _chunk_alpha(blk, px, py):
    """blk (CHUNK, C_PACK) -> (alpha, live, alpha_raw), each (CHUNK, P).
    alpha_raw (pre-clamp) is returned so the backward pass reuses it instead
    of paying a second exp."""
    mx = blk[:, 0:1]
    my = blk[:, 1:2]
    ca = blk[:, 2:3]
    cb = blk[:, 3:4]
    cc = blk[:, 4:5]
    op = blk[:, 8:9]
    dx = px - mx  # (CHUNK, P)
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    alpha_raw = op * jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(alpha_raw, MAX_ALPHA)
    live = (sigma >= 0.0) & (alpha_raw >= ALPHA_THRESHOLD)
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, live, alpha_raw


def _forward_kernel(packed_ref, counts_ref, out_ref, tstart_ref, *, k: int,
                    tx: int, tile_size: int, tiles_per_block: int):
    for b in range(tiles_per_block):
        _forward_one(packed_ref, counts_ref, out_ref, tstart_ref, b,
                     pl.program_id(0) * tiles_per_block + b, k, tx, tile_size)


def _forward_one(packed_ref, counts_ref, out_ref, tstart_ref, b, tile_id, k,
                 tx, tile_size):
    px, py = _pixel_coords(tile_id, tx, tile_size)
    n_chunks = k // CHUNK
    # Bound the sweep by this tile's REAL pair count: per-tile occupancy is a
    # contiguous prefix of the K slots (binning), and slots past it are the
    # zero sentinel row (alpha exactly 0), so skipping whole sentinel chunks
    # is a no-op on the output — ~30% of all chunk work at the bench
    # workload. The post-loop tstart zeroing makes the backward skip them
    # identically. counts rides whole in SMEM (Mosaic only blocks rank-1
    # arrays at 128-multiples), indexed by the absolute tile id.
    n_lim = jnp.minimum((counts_ref[tile_id] + CHUNK - 1) // CHUNK, n_chunks)

    def body(carry):
        c, accum, depth_acc, trans = carry
        # checkpoint the chunk-start transmittance: the backward pass reads it
        # instead of re-sweeping, and uses tstart==0 to skip dead chunks
        tstart_ref[b, pl.ds(pl.multiple_of(c * P, P), P)] = trans[0]
        blk = packed_ref[:, b, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)].T  # (CHUNK, C_PACK)
        alpha, _, _ = _chunk_alpha(blk, px, py)
        one_minus = 1.0 - alpha
        t_within, chunk_prod = _prefix_products(one_minus)
        w = alpha * t_within * trans  # (CHUNK, P)
        rgb = blk[:, 5:8]  # (CHUNK, 3)
        # HIGHEST: exact f32 color accumulation (the MXU default rounds inputs
        # to bf16 — 4e-3 relative color error); the contraction is only 3 wide
        # on one side, so the multi-pass decomposition is ~free
        accum = accum + jnp.dot(rgb.T, w, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        depth_acc = depth_acc + jnp.sum(w * blk[:, 9:10], axis=0, keepdims=True)
        trans = trans * chunk_prod
        return c + 1, accum, depth_acc, trans

    def cond(carry):
        c, _, _, trans = carry
        return (c < n_lim) & (jnp.max(trans) > TERM_THRESHOLD)

    init = (
        jnp.int32(0),
        jnp.zeros((3, P), jnp.float32),
        jnp.zeros((1, P), jnp.float32),
        jnp.ones((1, P), jnp.float32),
    )
    c_end, accum, depth_acc, trans = jax.lax.while_loop(cond, body, init)
    # chunks the early termination never reached: mark dead for the backward
    for c in range(n_chunks):
        @pl.when(c >= c_end)
        def _():
            tstart_ref[b, pl.ds(c * P, P)] = jnp.zeros((P,), jnp.float32)

    out_ref[b, 0:3, :] = accum
    out_ref[b, 3:4, :] = 1.0 - trans
    out_ref[b, 4:5, :] = depth_acc
    out_ref[b, 5:8, :] = jnp.zeros((3, P), jnp.float32)


def _backward_kernel(packed_ref, gout_ref, tstart_ref, dpacked_ref,
                     *, k: int, tx: int, tile_size: int, tiles_per_block: int):
    for b in range(tiles_per_block):
        _backward_one(packed_ref, gout_ref, tstart_ref, dpacked_ref, b,
                      pl.program_id(0) * tiles_per_block + b, k, tx, tile_size)


def _backward_one(packed_ref, gout_ref, tstart_ref, dpacked_ref, b, tile_id,
                  k, tx, tile_size):
    px, py = _pixel_coords(tile_id, tx, tile_size)
    n_chunks = k // CHUNK

    dC = gout_ref[b, 0:3, :]  # (3, P)
    dA = gout_ref[b, 3:4, :]  # (1, P)
    dD = gout_ref[b, 4:5, :]
    # the forward's final transmittance: it wrote 1 - T_final to out[3], and
    # its gradient arrives in gout[5] (see _composite_bwd)
    t_final = gout_ref[b, 5:6, :]

    # Reverse sweep with the suffix accumulator S_p = sum_{j>i} w_j e_j, using
    # the forward's chunk-start transmittance checkpoints — no re-sweep, and
    # chunks the forward never reached (tstart == 0, early termination) are
    # skipped entirely: their true gradient is exactly zero because they never
    # contributed to the forward output.
    def bwd_body(i, suffix):
        c = n_chunks - 1 - i
        t_start = tstart_ref[b, pl.ds(pl.multiple_of(c * P, P), P)][None, :]

        @pl.when(jnp.max(t_start) <= 0.0)
        def _():
            dpacked_ref[:, b, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)] = (
                jnp.zeros((C_PACK, CHUNK), jnp.float32)
            )

        def dead(suffix):
            return suffix

        def live_chunk(suffix):
            return _bwd_chunk(packed_ref, dpacked_ref, b, c, t_start, suffix,
                              px, py, dC, dA, dD, t_final)

        return jax.lax.cond(jnp.max(t_start) > 0.0, live_chunk, dead, suffix)

    jax.lax.fori_loop(0, n_chunks, bwd_body, jnp.zeros((1, P), jnp.float32))


def _bwd_chunk(packed_ref, dpacked_ref, b, c, t_start, suffix, px, py,
               dC, dA, dD, t_final):
    """Gradient of one CHUNK of one tile; returns the updated suffix."""
    blk = packed_ref[:, b, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)].T  # (CHUNK, C_PACK)
    alpha, live, alpha_raw = _chunk_alpha(blk, px, py)
    one_minus = 1.0 - alpha
    t_within, _ = _prefix_products(one_minus)
    t_i = t_within * t_start  # (CHUNK, P) transmittance before gaussian i
    w = alpha * t_i

    rgb = blk[:, 5:8]  # (CHUNK, 3)
    dep = blk[:, 9:10]
    # e_i = c_i . dC + depth_i * dD per pixel — depth-3 contraction as
    # broadcast multiply-adds (exact f32 on the VPU; see _suffix_sums note)
    e = (rgb[:, 0:1] * dC[0:1, :] + rgb[:, 1:2] * dC[1:2, :]
         + rgb[:, 2:3] * dC[2:3, :] + dep * dD)  # (CHUNK, P)
    we = w * e
    # Suffix within the chunk: S_i = sum_{j>i in chunk} w_j e_j + suffix_after
    # (strict suffix sums via a triangular matmul). The MXU's default one-pass
    # bf16 input rounding puts ~1e-3 relative error on the conic/opacity
    # gradients (caught by the parity harness); Mosaic supports neither
    # Precision.HIGH nor HIGHEST-without-cost, so split the operand into
    # bf16 hi + lo halves and run two one-pass matmuls — the 0/1 triangular
    # matrix is bf16-exact, so the result is f32-accurate to ~2^-16 at 2x the
    # one-pass cost (an exact VPU roll-based suffix scan measured +6ms/step).
    we_hi = we.astype(jnp.bfloat16).astype(jnp.float32)
    we_lo = we - we_hi
    tri = _triu_strict()
    s_after = (
        jnp.dot(tri, we_hi, preferred_element_type=jnp.float32)
        + jnp.dot(tri, we_lo, preferred_element_type=jnp.float32)
        + suffix
    )

    # d alpha_i = T_i e_i - S_i/(1-alpha_i) + dA * T_final/(1-alpha_i)
    inv_om = 1.0 / jnp.maximum(one_minus, 1e-3)
    dalpha = t_i * e - s_after * inv_om + dA * t_final * inv_om
    # chain through alpha = clamp(op*exp(-sigma)): zero where clamped/dead.
    # alpha_raw = op * exp(-max(sigma, 0)) from _chunk_alpha is reused for
    # both the clamp test and d/dop (= exp(-sigma) = alpha_raw / op) — no
    # second exp.
    mx = blk[:, 0:1]
    my = blk[:, 1:2]
    ca = blk[:, 2:3]
    cb = blk[:, 3:4]
    cc = blk[:, 4:5]
    op = blk[:, 8:9]
    dx = px - mx
    dy = py - my
    active = live & (alpha_raw < MAX_ALPHA)
    dalpha = jnp.where(active, dalpha, 0.0)
    dsigma = -alpha * dalpha  # (CHUNK, P)
    exp_neg_sigma = alpha_raw / jnp.maximum(op, 1e-12)
    dop = jnp.sum(jnp.where(active, exp_neg_sigma * dalpha, 0.0), axis=1)

    # gradients wrt conic and mean (sum over pixels)
    d_ca = jnp.sum(0.5 * dx * dx * dsigma, axis=1)
    d_cb = jnp.sum(dx * dy * dsigma, axis=1)
    d_cc = jnp.sum(0.5 * dy * dy * dsigma, axis=1)
    gx = ca * dx + cb * dy
    gy = cc * dy + cb * dx
    # dsigma/ddx = gx, and ddx/dmx = -1 -> d_mx = -sum(gx*dsigma)
    d_mx = -jnp.sum(gx * dsigma, axis=1)
    d_my = -jnp.sum(gy * dsigma, axis=1)

    d_rgb = jnp.dot(w, dC.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # (CHUNK, 3)
    d_dep = jnp.sum(w * dD, axis=1)

    grad_blk = jnp.concatenate(
        [
            d_mx[:, None], d_my[:, None], d_ca[:, None], d_cb[:, None],
            d_cc[:, None], d_rgb, dop[:, None], d_dep[:, None],
            jnp.zeros((CHUNK, C_PACK - 10), jnp.float32),
        ],
        axis=1,
    )
    dpacked_ref[:, b, pl.ds(c * CHUNK, CHUNK)] = grad_blk.T

    return suffix + jnp.sum(we, axis=0, keepdims=True)


def composite_tiles(packed: jnp.ndarray, tx: int, ty: int, tile_size: int,
                    counts: jnp.ndarray = None):
    """packed (16, T, K) -> (T, 8, 256): rows 0-2 rgb, 3 alpha, 4 depth.

    counts (T,) int32: per-tile REAL pair count (binning run lengths); slots
    past it must be the zero sentinel row. Omitted -> every tile sweeps all
    K slots (same output, no sentinel-chunk skipping)."""
    if counts is None:
        counts = jnp.full((packed.shape[1],), packed.shape[2], jnp.int32)
    return _composite_tiles_counted(packed, counts, tx, ty, tile_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _composite_tiles_counted(packed, counts, tx, ty, tile_size):
    return _composite_fwd_impl(packed, counts, tx, ty, tile_size)[0]


def _pad_tiles(arr, axis: int, t_total: int):
    """Pad the tile axis to a multiple of the block tile count."""
    pad = (-t_total) % 8
    if pad == 0:
        return arr, t_total
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths), t_total + pad


def _composite_fwd_impl(packed, counts, tx, ty, tile_size):
    """Returns (out (T,8,P), tstart (T_pad, n_chunks*P)) — tstart keeps its
    tile padding so the backward can reuse it without re-padding."""
    _, t_total, k = packed.shape
    packed, t_pad = _pad_tiles(packed, 1, t_total)
    counts, _ = _pad_tiles(counts.astype(jnp.int32), 0, t_total)
    tb = 8
    kernel = functools.partial(_forward_kernel, k=k, tx=tx, tile_size=tile_size,
                               tiles_per_block=tb)
    out, tstart = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec((C_PACK, tb, k), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, (k // CHUNK) * P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, 8, P), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, (k // CHUNK) * P), jnp.float32),
        ],
    )(packed, counts)
    return out[:t_total], tstart


def _composite_fwd(packed, counts, tx, ty, tile_size):
    out, tstart = _composite_fwd_impl(packed, counts, tx, ty, tile_size)
    return out, (packed, tstart, out)


def _composite_bwd(tx, ty, tile_size, res, gout):
    packed, tstart, out = res
    _, t_total, k = packed.shape
    # route the forward's final transmittance to the kernel through gout row 5
    # (rows 5-7 of out are structurally zero, so their cotangents are unused)
    gout = gout.at[:, 5, :].set(1.0 - out[:, 3, :])
    packed, t_pad = _pad_tiles(packed, 1, t_total)
    gout, _ = _pad_tiles(gout, 0, t_total)
    tb = 8
    kernel = functools.partial(_backward_kernel, k=k, tx=tx, tile_size=tile_size,
                               tiles_per_block=tb)
    dpacked = pl.pallas_call(
        kernel,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec((C_PACK, tb, k), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, (k // CHUNK) * P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C_PACK, tb, k), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_PACK, t_pad, k), jnp.float32),
    )(packed, gout, tstart)
    # counts cotangent is None (integer metadata; sentinel chunks the forward
    # skipped get their zero gradient from the backward's tstart==0 branch)
    return (dpacked[:, :t_total, :], None)


_composite_tiles_counted.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_reference(packed: jnp.ndarray, tx: int, ty: int,
                              tile_size: int) -> jnp.ndarray:
    """Pure-XLA reference with identical semantics (used on CPU and in tests)."""
    packed = jnp.transpose(packed, (1, 2, 0))  # (16,T,K) -> (T,K,16)
    t_total, k, _ = packed.shape
    tile_ids = jnp.arange(t_total, dtype=jnp.int32)
    lin = jnp.arange(P, dtype=jnp.int32)
    px = ((tile_ids[:, None] % tx) * tile_size + lin[None, :] % tile_size) + 0.5
    py = ((tile_ids[:, None] // tx) * tile_size + lin[None, :] // tile_size) + 0.5
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)

    def body(carry, blk):
        accum, depth_acc, trans = carry
        # tile-level early-termination gate, identical to the kernel's
        # while-loop exit: once every pixel of a tile is saturated the
        # remaining chunks contribute nothing (not even epsilon — the kernel
        # hard-stops, so the reference must too for exact parity)
        tile_on = (jnp.max(trans, axis=1) > TERM_THRESHOLD)[:, None, None]
        # blk: (T, CHUNK, 16)
        mx = blk[:, :, 0:1]
        my = blk[:, :, 1:2]
        ca = blk[:, :, 2:3]
        cb = blk[:, :, 3:4]
        cc = blk[:, :, 4:5]
        op = blk[:, :, 8:9]
        dx = px[:, None, :] - mx
        dy = py[:, None, :] - my
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha_raw = op * jnp.exp(-jnp.maximum(sigma, 0.0))
        alpha = jnp.minimum(alpha_raw, MAX_ALPHA)
        live = (sigma >= 0.0) & (alpha_raw >= ALPHA_THRESHOLD)
        alpha = jnp.where(live, alpha, 0.0)
        one_minus = 1.0 - alpha
        cum = jnp.cumprod(one_minus, axis=1)
        t_within = jnp.concatenate([jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
        w = alpha * t_within * trans[:, None, :] * tile_on
        # exact f32 (matches the kernel's HIGHEST dots; no-op on CPU)
        accum = accum + jnp.einsum("tkp,tkc->tcp", w, blk[:, :, 5:8],
                                   precision=jax.lax.Precision.HIGHEST)
        depth_acc = depth_acc + jnp.sum(w * blk[:, :, 9:10], axis=1)
        trans = jnp.where(tile_on[:, 0], trans * cum[:, -1, :], trans)
        return (accum, depth_acc, trans), None

    n_chunks = k // CHUNK
    blocks = jnp.swapaxes(
        packed.reshape(t_total, n_chunks, CHUNK, C_PACK), 0, 1
    )
    init = (
        jnp.zeros((t_total, 3, P), jnp.float32),
        jnp.zeros((t_total, P), jnp.float32),
        jnp.ones((t_total, P), jnp.float32),
    )
    (accum, depth_acc, trans), _ = jax.lax.scan(jax.checkpoint(body), init, blocks)
    out = jnp.zeros((t_total, 8, P), jnp.float32)
    out = out.at[:, 0:3, :].set(accum)
    out = out.at[:, 3, :].set(1.0 - trans)
    out = out.at[:, 4, :].set(depth_acc)
    return out
