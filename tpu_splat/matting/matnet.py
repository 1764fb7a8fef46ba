"""MatNet — a compact salient-subject matting net with bundled weights.

The reference ships *learned* matting: the backgroundremover CLI downloads
U2Net checkpoints (reference remove_background.py:254-268) and the deployment
Lambda fetches SAM2's 2.3 GB video checkpoint
(model_deployment/model_deployment.py:33-77). This build runs with zero
network egress, so those weights cannot be downloaded; instead MatNet is a
~0.4M-parameter U-Net trained from scratch on procedurally generated
composites (textured subjects over distinct backgrounds — the same capture
regime the pipeline's segmentation stage targets: one dominant centered
subject on a turntable/orbit capture) and its weights ARE bundled with the
package (`weights/matnet.npz`, float16, <1 MB).

It serves two call sites:
 - the `u2net`/`u2net_human_seg` background-removal path when no converted
   torch checkpoint is available (matting/remove.py), and
 - the saliency weighting of subject-aware blur scoring
   (reference filter_blurry_images.py:205-338 -> ingest/blur.py).

Training: scripts/train_matnet.py (synthetic composites, BCE + soft-IoU).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

_RES = 256  # inference resolution (square); outputs are resized back


def _conv(x, w, b, stride=1, dilation=1):
    import jax.lax as lax

    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _gn(x, scale, bias, groups=8):
    """GroupNorm over channel groups (no running stats — tiny net, trained
    with the same normalization it runs with)."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + 1e-5)
    return xg.reshape(n, h, w, c) * scale + bias


# Channel plan: encoder levels at full/2/4/8 resolution.
_CH = (16, 32, 64, 96)


def init_params(seed: int = 0) -> Dict[str, Any]:
    """He-initialized parameter pytree (flat dict of numpy arrays)."""
    rng = np.random.default_rng(seed)
    p: Dict[str, np.ndarray] = {}

    def conv(name, cin, cout, k=3):
        fan = k * k * cin
        p[f"{name}.w"] = (rng.standard_normal((k, k, cin, cout))
                          * np.sqrt(2.0 / fan)).astype(np.float32)
        p[f"{name}.b"] = np.zeros((cout,), np.float32)

    def norm(name, c):
        p[f"{name}.s"] = np.ones((c,), np.float32)
        p[f"{name}.o"] = np.zeros((c,), np.float32)

    cin = 3
    for i, c in enumerate(_CH):
        conv(f"enc{i}a", cin, c)
        norm(f"enc{i}a.n", c)
        conv(f"enc{i}b", c, c)
        norm(f"enc{i}b.n", c)
        cin = c
    # dilated context block at the bottom (rates 2, 4)
    conv("ctx1", _CH[-1], _CH[-1])
    norm("ctx1.n", _CH[-1])
    conv("ctx2", _CH[-1], _CH[-1])
    norm("ctx2.n", _CH[-1])
    for i in range(len(_CH) - 2, -1, -1):
        conv(f"dec{i}", _CH[i + 1] + _CH[i], _CH[i])
        norm(f"dec{i}.n", _CH[i])
    conv("head", _CH[0], 1, k=1)
    return p


def apply(params: Dict[str, Any], x):
    """x: (N, 256, 256, 3) float32 in [0,1] -> logits (N, 256, 256)."""
    import jax
    import jax.numpy as jnp

    def blk(name, x, stride=1, dilation=1):
        x = _conv(x, params[f"{name}.w"], params[f"{name}.b"],
                  stride=stride, dilation=dilation)
        x = _gn(x, params[f"{name}.n.s"], params[f"{name}.n.o"])
        return jax.nn.relu(x)

    x = x - 0.5
    skips = []
    for i in range(len(_CH)):
        x = blk(f"enc{i}a", x, stride=1 if i == 0 else 2)
        x = blk(f"enc{i}b", x)
        skips.append(x)
    x = blk("ctx1", x, dilation=2)
    x = blk("ctx2", x, dilation=4)
    for i in range(len(_CH) - 2, -1, -1):
        ref = skips[i]
        x = jax.image.resize(x, ref.shape[:-1] + (x.shape[-1],), "bilinear")
        x = blk(f"dec{i}", jnp.concatenate([x, ref], axis=-1))
    logits = _conv(x, params["head.w"], params["head.b"])
    return logits[..., 0]


def save_params(params: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, **{k: v.astype(np.float16) for k, v in params.items()})


def load_params(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return {k: z[k].astype(np.float32) for k in z.files}


def bundled_weights_path() -> Optional[str]:
    cand = os.environ.get("TPU_SPLAT_MATNET_WEIGHTS")
    if cand and os.path.exists(cand):
        return cand
    here = os.path.join(os.path.dirname(__file__), "weights", "matnet.npz")
    return here if os.path.exists(here) else None


_CACHE: Dict[str, Any] = {}


def matnet_saliency(images: np.ndarray,
                    weights_path: Optional[str] = None) -> Optional[np.ndarray]:
    """images (N, H, W, 3) float32 [0,1] -> saliency (N, H, W) in [0,1],
    or None when no weights are bundled (callers fall back to classical
    saliency). Runs on whatever backend JAX selected; the net is small
    enough that CPU inference stays sub-second per frame."""
    import jax
    import jax.numpy as jnp

    path = weights_path or bundled_weights_path()
    if path is None:
        return None
    if path not in _CACHE:
        params = load_params(path)
        jitted = jax.jit(lambda imgs: jax.nn.sigmoid(apply(params, imgs)))
        _CACHE[path] = jitted
    fn = _CACHE[path]
    n, h, w, _ = images.shape
    x = jax.image.resize(jnp.asarray(images, jnp.float32),
                         (n, _RES, _RES, 3), "bilinear")
    out = []
    for i in range(0, n, 8):
        out.append(np.asarray(fn(x[i:i + 8])))
    sal = np.concatenate(out)
    sal = jax.image.resize(jnp.asarray(sal), (n, h, w), "bilinear")
    return np.clip(np.asarray(sal), 0.0, 1.0)
