"""U2Net salient-object matting in flax.

The TPU-native replacement for the `backgroundremover` CLI's U2Net models
(remove_background.py:254-268). Faithful U^2-Net architecture (RSU-7..RSU-4F
encoder/decoder with side outputs); weights are converted from the standard
PyTorch checkpoints (u2net.pth / u2net_human_seg.pth) with
`convert_torch_checkpoint` — the weights themselves are not bundled.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class REBNCONV(nn.Module):
    out_ch: int = 3
    dirate: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch, (3, 3), padding=self.dirate,
            kernel_dilation=(self.dirate, self.dirate), name="conv_s1",
        )(x)
        x = nn.BatchNorm(use_running_average=True, name="bn_s1")(x)
        return nn.relu(x)


def _down(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")


def _up_to(x, ref):
    return jax.image.resize(x, ref.shape[:-1] + (x.shape[-1],), "bilinear")


class RSU(nn.Module):
    """Residual U-block of a given height (RSU-7 has height 7)."""

    height: int
    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, name="rebnconvin")(x)
        # encoder
        feats: List[jnp.ndarray] = []
        hx = hxin
        for i in range(1, self.height):
            hx = REBNCONV(self.mid_ch, 1, name=f"rebnconv{i}")(hx)
            feats.append(hx)
            if i < self.height - 1:
                hx = _down(hx)
        hx = REBNCONV(self.mid_ch, 2, name=f"rebnconv{self.height}")(hx)
        # decoder
        for i in range(self.height - 1, 0, -1):
            skip = feats[i - 1]
            if hx.shape[1:3] != skip.shape[1:3]:
                hx = _up_to(hx, skip)
            cat = jnp.concatenate([hx, skip], axis=-1)
            ch = self.out_ch if i == 1 else self.mid_ch
            hx = REBNCONV(ch, 1, name=f"rebnconv{i}d")(cat)
        return hx + hxin


class RSU4F(nn.Module):
    """Dilated (no-pooling) residual U-block."""

    mid_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, name="rebnconvin")(x)
        h1 = REBNCONV(self.mid_ch, 1, name="rebnconv1")(hxin)
        h2 = REBNCONV(self.mid_ch, 2, name="rebnconv2")(h1)
        h3 = REBNCONV(self.mid_ch, 4, name="rebnconv3")(h2)
        h4 = REBNCONV(self.mid_ch, 8, name="rebnconv4")(h3)
        h3d = REBNCONV(self.mid_ch, 4, name="rebnconv3d")(jnp.concatenate([h4, h3], -1))
        h2d = REBNCONV(self.mid_ch, 2, name="rebnconv2d")(jnp.concatenate([h3d, h2], -1))
        h1d = REBNCONV(self.out_ch, 1, name="rebnconv1d")(jnp.concatenate([h2d, h1], -1))
        return h1d + hxin


class U2Net(nn.Module):
    """Full U^2-Net (use cfg='full') or U2NetP (cfg='small')."""

    cfg: str = "full"

    @nn.compact
    def __call__(self, x):
        if self.cfg == "full":
            enc = [
                RSU(7, 32, 64, name="stage1"), RSU(6, 32, 128, name="stage2"),
                RSU(5, 64, 256, name="stage3"), RSU(4, 128, 512, name="stage4"),
                RSU4F(256, 512, name="stage5"), RSU4F(256, 512, name="stage6"),
            ]
            dec = [
                RSU4F(256, 512, name="stage5d"), RSU(4, 128, 256, name="stage4d"),
                RSU(5, 64, 128, name="stage3d"), RSU(6, 32, 64, name="stage2d"),
                RSU(7, 16, 64, name="stage1d"),
            ]
        else:
            enc = [
                RSU(7, 16, 64, name="stage1"), RSU(6, 16, 64, name="stage2"),
                RSU(5, 16, 64, name="stage3"), RSU(4, 16, 64, name="stage4"),
                RSU4F(16, 64, name="stage5"), RSU4F(16, 64, name="stage6"),
            ]
            dec = [
                RSU4F(16, 64, name="stage5d"), RSU(4, 16, 64, name="stage4d"),
                RSU(5, 16, 64, name="stage3d"), RSU(6, 16, 64, name="stage2d"),
                RSU(7, 16, 64, name="stage1d"),
            ]

        hs = []
        hx = x
        for i, stage in enumerate(enc):
            hx = stage(hx)
            hs.append(hx)
            if i < 5:
                hx = _down(hx)
        d = hs[5]
        sides = []
        for i, stage in enumerate(dec):
            skip = hs[4 - i]
            d = _up_to(d, skip)
            d = stage(jnp.concatenate([d, skip], axis=-1))
            sides.append(d)
        # side outputs (original order: d1..d6)
        outs = []
        d_list = [sides[4], sides[3], sides[2], sides[1], sides[0], hs[5]]
        for i, feat in enumerate(d_list, start=1):
            s = nn.Conv(1, (3, 3), padding=1, name=f"side{i}")(feat)
            s = _up_to(s, x)
            outs.append(s)
        fused = nn.Conv(1, (1, 1), name="outconv")(jnp.concatenate(outs, axis=-1))
        return [jax.nn.sigmoid(o) for o in [fused] + outs]


def convert_torch_checkpoint(path: str, cfg: str = "full") -> Dict[str, Any]:
    """Convert a PyTorch u2net .pth state dict into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    for key, tensor in sd.items():
        arr = tensor.detach().numpy()
        parts = key.split(".")
        # torch: stage1.rebnconv1.conv_s1.weight -> flax params/stage1/rebnconv1/conv_s1/kernel
        if parts[-2].startswith("conv") and parts[-1] == "weight" and arr.ndim == 4:
            put(params, parts[:-1] + ["kernel"], np.transpose(arr, (2, 3, 1, 0)))
        elif parts[-2].startswith("conv") and parts[-1] == "bias":
            put(params, parts[:-1] + ["bias"], arr)
        elif parts[-2].startswith("bn"):
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], arr)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], arr)
            elif name == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], arr)
            elif name == "running_var":
                put(batch_stats, parts[:-1] + ["var"], arr)
        elif parts[0].startswith("side") and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], np.transpose(arr, (2, 3, 1, 0)))
        elif parts[0].startswith("side") and parts[-1] == "bias":
            put(params, parts[:-1] + ["bias"], arr)
        elif parts[0] == "outconv":
            if parts[-1] == "weight":
                put(params, ["outconv", "kernel"], np.transpose(arr, (2, 3, 1, 0)))
            else:
                put(params, ["outconv", "bias"], arr)
    return {"params": params, "batch_stats": batch_stats}


def u2net_apply(variables: Dict[str, Any], images: jnp.ndarray,
                cfg: str = "full") -> jnp.ndarray:
    """images (N, H, W, 3) in [0,1] -> saliency masks (N, H, W) in [0,1].

    Applies the standard U2Net preprocessing (per-image max-normalize +
    ImageNet mean/std) at 320x320 and resizes the fused output back."""
    n, h, w, _ = images.shape
    x = jax.image.resize(images, (n, 320, 320, 3), "bilinear")
    x = x / jnp.maximum(jnp.max(x, axis=(1, 2, 3), keepdims=True), 1e-6)
    mean = jnp.array([0.485, 0.456, 0.406])
    std = jnp.array([0.229, 0.224, 0.225])
    x = (x - mean) / std
    model = U2Net(cfg=cfg)
    outs = model.apply(variables, x)
    fused = outs[0][..., 0]
    mn = jnp.min(fused, axis=(1, 2), keepdims=True)
    mx = jnp.max(fused, axis=(1, 2), keepdims=True)
    fused = (fused - mn) / jnp.maximum(mx - mn, 1e-6)
    return jax.image.resize(fused, (n, h, w), "bilinear")
