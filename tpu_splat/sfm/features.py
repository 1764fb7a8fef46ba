"""TPU-native SIFT-style feature extraction (DoG keypoints + oriented descriptors).

Replaces COLMAP's `feature_extractor` (SiftGPU) that the reference shells out to
(main.py:950-985). The design maps SIFT onto XLA-friendly primitives:

- Gaussian/DoG pyramid: separable convolutions (VPU) over a batched octave stack.
- Keypoint detection: 3x3x3 extrema via reduce_window max/min, contrast + edge
  (Hessian-ratio) filters, then a static top-K selection per image so every image
  yields fixed-shape outputs (padded with a validity mask) — no dynamic shapes.
- Orientation: 36-bin gradient histogram in a scale-adaptive window, dominant bin
  with parabolic refinement.
- Descriptor: 4x4 spatial x 8 orientation bins (128-d) from a rotated, bilinearly
  sampled 16x16 gradient grid, L2-normalized, clipped at 0.2, renormalized —
  the standard SIFT recipe, vmapped over keypoints.

The "enhanced feature extraction" option of the reference (affine shape estimation
+ domain-size pooling, main.py:967-971) maps here to `upsample_first` (doubling,
equivalent detail gain) and multi-scale descriptor pooling (dsp=True).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FeatureConfig:
    max_features: int = 4096
    num_octaves: int = 4
    scales_per_octave: int = 3
    sigma0: float = 1.6
    contrast_threshold: float = 0.006
    edge_threshold: float = 10.0
    upsample_first: bool = False  # "enhanced" mode: 2x upsample before octave 0
    dsp: bool = False  # domain-size pooling: average descriptors over 3 scales


class Features(NamedTuple):
    xy: jnp.ndarray  # (K, 2) pixel coordinates in the input image
    scale: jnp.ndarray  # (K,) blur sigma at detection (input-image units)
    orientation: jnp.ndarray  # (K,) radians
    response: jnp.ndarray  # (K,) |DoG| response
    descriptor: jnp.ndarray  # (K, 128) L2-normalized float32
    valid: jnp.ndarray  # (K,) bool


def _gaussian_kernel1d(sigma: float) -> np.ndarray:
    radius = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur of (H, W) image, as static-slice weighted sums.

    NOT a conv: a single-channel conv_general_dilated puts C=1 on the TPU's
    128-lane axis — XLA padded the 112 MB octave-0 pyramid buffer to 14 GB
    (measured OOM at 720p x 8 frames). The tap loop is unrolled at trace
    time (kernels are static); each tap is one full-width VPU multiply-add
    with no layout hazards."""
    k = _gaussian_kernel1d(sigma)
    r = len(k) // 2
    h, w = img.shape
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i, wt in enumerate(k):
        out = out + wt * jax.lax.slice(x, (i, 0), (i + h, w))
    x = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    out = jnp.zeros_like(img)
    for i, wt in enumerate(k):
        out = out + wt * jax.lax.slice(x, (0, i), (h, i + w))
    return out


def _local_extrema(dog: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W) -> bool mask of 26-neighborhood extrema on interior scales."""
    mx = jax.lax.reduce_window(
        dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), "SAME"
    )
    mn = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), "SAME")
    is_max = dog >= mx
    is_min = dog <= mn
    mask = is_max | is_min
    # exclude boundary scales (no neighbor above/below)
    mask = mask.at[0].set(False).at[-1].set(False)
    return mask


def _edge_response_ok(dog_s: jnp.ndarray, edge_threshold: float) -> jnp.ndarray:
    """Reject edge-like extrema using the Hessian trace/det ratio test."""
    dxx = jnp.roll(dog_s, -1, 1) - 2 * dog_s + jnp.roll(dog_s, 1, 1)
    dyy = jnp.roll(dog_s, -1, 0) - 2 * dog_s + jnp.roll(dog_s, 1, 0)
    dxy = 0.25 * (
        jnp.roll(jnp.roll(dog_s, -1, 0), -1, 1)
        - jnp.roll(jnp.roll(dog_s, -1, 0), 1, 1)
        - jnp.roll(jnp.roll(dog_s, 1, 0), -1, 1)
        + jnp.roll(jnp.roll(dog_s, 1, 0), 1, 1)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_threshold
    return (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)


def _bilinear3(stack: jnp.ndarray, row_base: jnp.ndarray, h: jnp.ndarray,
               w: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of one pyramid level of a ROW-FLATTENED (R, W0) stack
    at float coords, clamped to the level's (h, w) extent. `row_base` is the
    level's first row (octave offset + scale*height — octaves narrower than
    W0 are right-padded with zeros that the x clamp keeps unreachable), so
    ONE stack serves every octave and the caller needs no per-octave code.

    Two shape lessons are baked in here. (1) Indexing the level INSIDE the
    gather keeps the whole pyramid out of the per-keypoint batch —
    `stack[s][y, x]` under vmap materializes (K, S, H, W), a 20 GB broadcast
    at 640px/2048 keypoints. (2) The stack must be pre-flattened to 2-D by
    the caller: as a (B, S, H, W) gather operand XLA assigned the SMALL dims
    (B, S) as the minor (lane/sublane) axes, padding 675 MB of gradients to
    14 GB (measured OOM at 720p x 8 frames); with (B, S*H, W) the minor dims
    are large and padding is trivial."""
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    r0 = row_base + y0
    v00 = stack[r0, x0]
    v01 = stack[r0, x0 + 1]
    v10 = stack[r0 + 1, x0]
    v11 = stack[r0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _keypoint_orientation(gxs, gys, row_base, h, w, x, y, sigma):
    """Dominant gradient orientation in a gaussian-weighted window (36 bins)."""
    radius = 3.0 * sigma  # window radius in pixels (at this octave's resolution)
    grid = jnp.linspace(-1.0, 1.0, 9)  # 9x9 samples over the window
    ox, oy = jnp.meshgrid(grid * radius, grid * radius)
    sx = x + ox.reshape(-1)
    sy = y + oy.reshape(-1)
    mag_x = _bilinear3(gxs, row_base, h, w, sx, sy)
    mag_y = _bilinear3(gys, row_base, h, w, sx, sy)
    mag = jnp.sqrt(mag_x**2 + mag_y**2)
    ang = jnp.arctan2(mag_y, mag_x)  # [-pi, pi]
    wgt = jnp.exp(-(ox.reshape(-1) ** 2 + oy.reshape(-1) ** 2) / (2 * (1.5 * sigma) ** 2))
    bins = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    hist = jnp.zeros(36).at[bins].add(mag * wgt)
    # smooth circularly, then take argmax with parabolic refinement
    hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    b = jnp.argmax(hist)
    left = hist[(b - 1) % 36]
    right = hist[(b + 1) % 36]
    center = hist[b]
    denom = left - 2 * center + right
    off = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (left - right) / denom, 0.0)
    theta = (b.astype(jnp.float32) + off + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi
    return theta


def _descriptor(gxs, gys, row_base, h, w, x, y, sigma, theta):
    """128-d SIFT descriptor: 4x4 spatial cells x 8 orientation bins."""
    d = 4  # spatial bins
    n_ori = 8
    samples = 16  # 16x16 sample grid
    hist_width = 3.0 * sigma  # pixels per spatial bin
    # sample grid in keypoint frame, rotated by theta
    lin = (jnp.arange(samples) - samples / 2 + 0.5) / samples * d  # in bin units
    u, v = jnp.meshgrid(lin, lin)  # (16, 16) in [-2, 2)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    sx = x + (cos_t * u - sin_t * v).reshape(-1) * hist_width
    sy = y + (sin_t * u + cos_t * v).reshape(-1) * hist_width
    gxv = _bilinear3(gxs, row_base, h, w, sx, sy)
    gyv = _bilinear3(gys, row_base, h, w, sx, sy)
    mag = jnp.sqrt(gxv**2 + gyv**2)
    ang = jnp.arctan2(gyv, gxv) - theta
    wgt = jnp.exp(-(u.reshape(-1) ** 2 + v.reshape(-1) ** 2) / (2 * (d / 2) ** 2))
    w_mag = mag * wgt

    # soft-assign to spatial bins (bilinear) and orientation bins (linear)
    ub = u.reshape(-1) + d / 2 - 0.5  # [0-0.5, 3.5] bin coords
    vb = v.reshape(-1) + d / 2 - 0.5
    ob = (ang % (2 * jnp.pi)) / (2 * jnp.pi) * n_ori

    u0 = jnp.floor(ub).astype(jnp.int32)
    v0 = jnp.floor(vb).astype(jnp.int32)
    o0 = jnp.floor(ob).astype(jnp.int32)
    fu = ub - u0
    fv = vb - v0
    fo = ob - o0

    desc = jnp.zeros((d, d, n_ori))
    for du, wu in ((0, 1 - fu), (1, fu)):
        uu = u0 + du
        u_ok = (uu >= 0) & (uu < d)
        for dv, wv in ((0, 1 - fv), (1, fv)):
            vv = v0 + dv
            v_ok = (vv >= 0) & (vv < d)
            for do, wo in ((0, 1 - fo), (1, fo)):
                oo = (o0 + do) % n_ori
                w = w_mag * wu * wv * wo * (u_ok & v_ok)
                desc = desc.at[
                    jnp.clip(vv, 0, d - 1), jnp.clip(uu, 0, d - 1), oo
                ].add(w)
    vec = desc.reshape(-1)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec), 1e-8)
    vec = jnp.minimum(vec, 0.2)
    vec = vec / jnp.maximum(jnp.linalg.norm(vec), 1e-8)
    return vec


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def extract_features(
    image: jnp.ndarray, cfg: FeatureConfig, height: int, width: int
) -> Features:
    """Extract up to cfg.max_features SIFT features from a grayscale (H, W) image
    in [0, 1]. Outputs are fixed-shape with a validity mask."""
    img = image.astype(jnp.float32)
    if cfg.upsample_first:
        img = jax.image.resize(img, (height * 2, width * 2), "linear")
        base_scale = 0.5
    else:
        base_scale = 1.0

    s = cfg.scales_per_octave
    k = 2.0 ** (1.0 / s)
    # blur increments between successive scales
    sigmas = [cfg.sigma0 * (k**i) for i in range(s + 3)]

    # Number of octaves that will actually run (downsampling floors at 32px);
    # needed up front so per-octave quotas can be static.
    hh, ww = img.shape
    n_oct = 0
    for _ in range(cfg.num_octaves):
        n_oct += 1
        hh, ww = (hh + 1) // 2, (ww + 1) // 2
        if min(hh, ww) < 32:
            break

    kk = cfg.max_features
    all_resp, all_x, all_y, all_sig, all_oct, all_scale_idx = [], [], [], [], [], []
    gauss_stacks = []

    cur = _blur(img, cfg.sigma0)
    for octave in range(n_oct):
        h, w = cur.shape
        stack = [cur]
        for i in range(1, s + 3):
            inc = math.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6))
            stack.append(_blur(stack[-1], inc))
        gauss = jnp.stack(stack)  # (S+3, h, w)
        gauss_stacks.append(gauss)
        dog = gauss[1:] - gauss[:-1]  # (S+2, h, w)

        extrema = _local_extrema(dog)
        contrast_ok = jnp.abs(dog) > cfg.contrast_threshold
        edge_ok = jax.vmap(lambda d: _edge_response_ok(d, cfg.edge_threshold))(dog)
        # border margin
        yy = jnp.arange(h)
        xx = jnp.arange(w)
        margin = 8
        border = (
            (yy[:, None] >= margin)
            & (yy[:, None] < h - margin)
            & (xx[None, :] >= margin)
            & (xx[None, :] < w - margin)
        )
        mask = extrema & contrast_ok & edge_ok & border[None]
        resp = jnp.where(mask, jnp.abs(dog), 0.0).reshape(-1)

        top_resp, top_idx = jax.lax.top_k(resp, min(kk, resp.shape[0]))
        sw = dog.shape[2]
        scale_i = top_idx // (h * w)
        rem = top_idx % (h * w)
        py = rem // sw
        px = rem % sw

        octave_scale = base_scale * (2.0**octave)
        all_resp.append(top_resp)
        all_x.append((px.astype(jnp.float32) + 0.5) * octave_scale - 0.5)
        all_y.append((py.astype(jnp.float32) + 0.5) * octave_scale - 0.5)
        # sigma at this scale level, in input-image units
        sig = jnp.asarray(sigmas)[scale_i + 1] * octave_scale
        all_sig.append(sig)
        all_oct.append(jnp.full_like(scale_i, octave))
        all_scale_idx.append(scale_i + 1)

        cur = stack[s][::2, ::2]

    # Precompute gradient stacks ONCE (outside the keypoint vmap): every
    # octave's (S+3, h_o, w_o) gradients are row-flattened and CONCATENATED
    # into one (R, W0) table (narrower octaves right-padded to octave 0's
    # width — never sampled, _bilinear3 clamps x to the level's true width).
    # Each keypoint then evaluates orientation + descriptor exactly ONCE,
    # addressing its own octave through a computed row offset. The previous
    # design evaluated every keypoint against EVERY octave and selected
    # (num_octaves x the descriptor work — a lax.switch is no alternative:
    # vmapped it lowers to select_n over captured operands, broadcasting each
    # octave's full gradient stack to (K, S, H, W), 20 GB at 640px/2048 kps).
    w0 = gauss_stacks[0].shape[2]
    gx_rows, gy_rows, row_offs, oct_h, oct_w = [], [], [], [], []
    off = 0
    for gauss in gauss_stacks:
        gx = (jnp.roll(gauss, -1, 2) - jnp.roll(gauss, 1, 2)) * 0.5
        gy = (jnp.roll(gauss, -1, 1) - jnp.roll(gauss, 1, 1)) * 0.5
        oh, ow = gauss.shape[1], gauss.shape[2]
        gx_rows.append(jnp.pad(gx.reshape(-1, ow), ((0, 0), (0, w0 - ow))))
        gy_rows.append(jnp.pad(gy.reshape(-1, ow), ((0, 0), (0, w0 - ow))))
        row_offs.append(off)
        oct_h.append(oh)
        oct_w.append(ow)
        off += gx.shape[0] * oh
    gxs = jnp.concatenate(gx_rows)
    gys = jnp.concatenate(gy_rows)

    resp = jnp.concatenate(all_resp)
    xs = jnp.concatenate(all_x)
    ys = jnp.concatenate(all_y)
    sig = jnp.concatenate(all_sig)
    octs = jnp.concatenate(all_oct)
    sidx = jnp.concatenate(all_scale_idx)

    top_resp, sel = jax.lax.top_k(resp, kk)
    valid = top_resp > 0
    xs, ys, sig = xs[sel], ys[sel], sig[sel]
    octs, sidx = octs[sel], sidx[sel]

    def _sel_oct(vals, octi):
        """Per-keypoint octave constant via a where-cascade (n_oct scalars)."""
        out = jnp.full_like(octi, vals[0])
        for o in range(1, len(vals)):
            out = jnp.where(octi == o, vals[o], out)
        return out

    def per_keypoint(xi, yi, sigi, octi, si, ok):
        octave_scale = base_scale * jnp.exp2(octi.astype(jnp.float32))
        oh = _sel_oct(oct_h, octi)
        ow = _sel_oct(oct_w, octi)
        row_base = _sel_oct(row_offs, octi) + si * oh
        # coords at octave resolution
        lx = (xi + 0.5) / octave_scale - 0.5
        ly = (yi + 0.5) / octave_scale - 0.5
        lsig = sigi / octave_scale
        theta = _keypoint_orientation(gxs, gys, row_base, oh, ow, lx, ly, lsig)
        if cfg.dsp:
            descs = [
                _descriptor(gxs, gys, row_base, oh, ow, lx, ly, lsig * f, theta)
                for f in (0.75, 1.0, 1.5)
            ]
            desc = sum(descs) / 3.0
            desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
        else:
            desc = _descriptor(gxs, gys, row_base, oh, ow, lx, ly, lsig, theta)
        return theta, jnp.where(ok, desc, 0.0)

    thetas, descs = jax.vmap(per_keypoint)(xs, ys, sig, octs, sidx, valid)

    return Features(
        xy=jnp.stack([xs, ys], axis=-1),
        scale=sig,
        orientation=thetas,
        response=top_resp,
        descriptor=descs.astype(jnp.float32),
        valid=valid,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def _extract_features_vmapped(images, cfg, height, width):
    return jax.vmap(lambda im: extract_features(im, cfg, height, width))(images)


def extract_features_batch(
    images: jnp.ndarray, cfg: FeatureConfig, height: int, width: int,
    chunk: int = 8,
) -> Features:
    """Batched extraction: one jit dispatch per `chunk` images instead of one
    per image — per-call dispatch latency dominates single-image extraction on
    remote-tunnel TPU setups (~24x fewer round trips at typical counts)."""
    outs = []
    n = images.shape[0]
    for i in range(0, n, chunk):
        blk = images[i:i + chunk]
        pad = chunk - blk.shape[0]
        if pad:  # keep one compiled shape
            blk = jnp.concatenate([blk, jnp.tile(blk[-1:], (pad, 1, 1))])
        f = _extract_features_vmapped(blk, cfg, height, width)
        outs.append(jax.tree.map(lambda a: a[:chunk - pad] if pad else a, f))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W[, 3]) -> (H, W) luminance."""
    if img.ndim == 2:
        return img
    return img @ jnp.asarray([0.299, 0.587, 0.114], img.dtype)
