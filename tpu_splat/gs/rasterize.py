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
):
    """Bin gaussians into per-tile depth-ordered index lists.

    Returns (gidx, gvalid, order):
      gidx:   (T, K) int32 indices into the depth-sorted gaussian arrays.
      gvalid: (T, K) bool.
      order:  (N,) permutation sorting gaussians front-to-back.
    """
    n = means2d.shape[0]
    tx = _ceil_div(width, tile_size)
    ty = _ceil_div(height, tile_size)
    t_total = tx * ty

    valid = radii > 0
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    m2d = means2d[order]
    rad = radii[order]
    val = valid[order]

    # Tile-space bbox (inclusive) per depth-sorted gaussian.
    x0 = jnp.clip(jnp.floor((m2d[:, 0] - rad) / tile_size), 0, tx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((m2d[:, 0] + rad) / tile_size), 0, tx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((m2d[:, 1] - rad) / tile_size), 0, ty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((m2d[:, 1] + rad) / tile_size), 0, ty - 1).astype(jnp.int32)

    m = MAX_COVER_X * MAX_COVER_Y
    dx = jnp.arange(m, dtype=jnp.int32) % MAX_COVER_X  # (M,)
    dy = jnp.arange(m, dtype=jnp.int32) // MAX_COVER_X
    px = x0[:, None] + dx[None, :]  # (N, M)
    py = y0[:, None] + dy[None, :]
    pair_ok = val[:, None] & (px <= x1[:, None]) & (py <= y1[:, None])
    pair_tile = jnp.where(pair_ok, py * tx + px, t_total).astype(jnp.int32)

    # Stable sort by tile id; pairs are generated in depth order (outer axis), so
    # within each tile the depth order is preserved.
    ranks = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, m)
    ).reshape(-1)
    sorted_tile, sorted_rank = jax.lax.sort_key_val(
        pair_tile.reshape(-1), ranks, is_stable=True
    )

    starts = jnp.searchsorted(sorted_tile, jnp.arange(t_total + 1, dtype=jnp.int32))
    tile_start = starts[:-1]  # (T,)
    tile_end = starts[1:]

    k = jnp.arange(max_per_tile, dtype=jnp.int32)
    pos = tile_start[:, None] + k[None, :]  # (T, K)
    gvalid = pos < tile_end[:, None]
    pos = jnp.minimum(pos, n * m - 1)
    gidx = sorted_rank[pos]  # (T, K) indices into depth-sorted arrays
    return gidx, gvalid, order


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "max_per_tile", "chunk"),
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
    max_per_tile: int = 1024,
    chunk: int = 64,
) -> RasterOutput:
    """Alpha-composite projected gaussians into an image.

    means2d (N,2), conics (N,3), colors (N,3), opacities (N,) post-sigmoid,
    depths (N,), radii (N,) with 0 = culled.
    """
    n = means2d.shape[0]
    tx = _ceil_div(width, tile_size)
    ty = _ceil_div(height, tile_size)
    t_total = tx * ty
    p = tile_size * tile_size

    gidx, gvalid, order = tile_gaussians(
        means2d, depths, radii, width, height, tile_size, max_per_tile
    )

    # Depth-sorted per-gaussian attributes.
    m2d = means2d[order]
    con = conics[order]
    col = colors[order]
    opa = opacities[order]
    dep = depths[order]

    # Pixel centers per tile: (T, P, 2).
    tile_ids = jnp.arange(t_total, dtype=jnp.int32)
    tile_x0 = (tile_ids % tx) * tile_size
    tile_y0 = (tile_ids // tx) * tile_size
    local = jnp.arange(p, dtype=jnp.int32)
    pix_x = tile_x0[:, None] + (local % tile_size)[None, :] + 0.5
    pix_y = tile_y0[:, None] + (local // tile_size)[None, :] + 0.5

    num_chunks = _ceil_div(max_per_tile, chunk)
    pad = num_chunks * chunk - max_per_tile
    gidx_c = jnp.pad(gidx, ((0, 0), (0, pad))).reshape(t_total, num_chunks, chunk)
    gval_c = jnp.pad(gvalid, ((0, 0), (0, pad))).reshape(t_total, num_chunks, chunk)
    gidx_c = jnp.swapaxes(gidx_c, 0, 1)  # (C, T, chunk)
    gval_c = jnp.swapaxes(gval_c, 0, 1)

    def body(carry, xs):
        accum, accum_d, trans = carry
        idx, ok = xs  # (T, chunk)
        gm = m2d[idx]  # (T, chunk, 2)
        gc = con[idx]  # (T, chunk, 3)
        gcol = col[idx]  # (T, chunk, 3)
        go = opa[idx]  # (T, chunk)
        gd = dep[idx]

        dxp = pix_x[:, None, :] - gm[..., 0:1]  # (T, chunk, P)
        dyp = pix_y[:, None, :] - gm[..., 1:2]
        sigma = (
            0.5 * (gc[..., 0:1] * dxp * dxp + gc[..., 2:3] * dyp * dyp)
            + gc[..., 1:2] * dxp * dyp
        )
        alpha = go[..., None] * jnp.exp(-jnp.maximum(sigma, 0.0))
        alpha = jnp.minimum(alpha, MAX_ALPHA)
        alpha = jnp.where(
            ok[..., None] & (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0
        )

        # Sequential compositing within the chunk via cumulative products.
        one_minus = 1.0 - alpha  # (T, chunk, P)
        # T_i within chunk = prod_{j<i} (1 - alpha_j), exclusive.
        cum = jnp.cumprod(one_minus, axis=1)
        t_within = jnp.concatenate(
            [jnp.ones_like(cum[:, :1, :]), cum[:, :-1, :]], axis=1
        )
        w = alpha * t_within * trans[:, None, :]  # (T, chunk, P)
        accum = accum + jnp.einsum("tkp,tkc->tpc", w, gcol)
        accum_d = accum_d + jnp.sum(w * gd[..., None], axis=1)
        trans = trans * cum[:, -1, :]
        return (accum, accum_d, trans), None

    init = (
        jnp.zeros((t_total, p, 3), jnp.float32),
        jnp.zeros((t_total, p), jnp.float32),
        jnp.ones((t_total, p), jnp.float32),
    )
    (accum, accum_d, trans), _ = jax.lax.scan(
        jax.checkpoint(body), init, (gidx_c, gval_c)
    )

    if background is not None:
        accum = accum + trans[..., None] * background

    # Untile: (T, P, C) -> (H, W, C).
    def untile(arr, c):
        img = arr.reshape(ty, tx, tile_size, tile_size, c)
        img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(
            ty * tile_size, tx * tile_size, c
        )
        return img[:height, :width]

    color = untile(accum, 3)
    alpha = untile(1.0 - trans[..., None], 1)[..., 0]
    depth = untile(accum_d[..., None], 1)[..., 0]
    return RasterOutput(color=color, alpha=alpha, depth=depth)
