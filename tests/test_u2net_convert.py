"""U2Net torch-checkpoint conversion golden test (CI-exercised, no real
weights needed): build a synthetic torch state dict with the exact torch key
naming/layout, run `convert_torch_checkpoint`, and assert the converted tree
drives the flax model identically to a native flax init — the conversion path
the reference exercises with u2net.pth / u2netp.pth (remove_background.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tpu_splat.matting.u2net import U2Net, convert_torch_checkpoint, u2net_apply


def _flax_to_torch_key(path, leaf_name):
    """Invert the converter's naming: flax param path -> torch state-dict key."""
    name = {"kernel": "weight", "scale": "weight"}.get(leaf_name, leaf_name)
    return ".".join(path) + "." + name


def _build_torch_state_dict(variables, rng):
    """Random torch state dict with the exact keys/shapes of a real u2netp."""
    sd = {}

    def walk(tree, path, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], collection)
                continue
            arr = rng.normal(0, 0.05, v.shape).astype(np.float32)
            if collection == "params":
                if k == "kernel":  # flax (kh, kw, in, out) -> torch (out, in, kh, kw)
                    t = np.transpose(arr, (3, 2, 0, 1))
                else:
                    t = arr
                sd[_flax_to_torch_key(path, k)] = torch.tensor(t)
            else:  # batch_stats
                name = {"mean": "running_mean", "var": "running_var"}[k]
                if k == "var":
                    arr = np.abs(arr) + 0.5  # variances must be positive
                sd[".".join(path) + "." + name] = torch.tensor(arr)

    walk(variables["params"], [], "params")
    walk(variables["batch_stats"], [], "batch_stats")
    # torch BN also carries num_batches_tracked; the converter must skip it
    sd["stage1.rebnconvin.bn_s1.num_batches_tracked"] = torch.tensor(0)
    return sd


def test_convert_torch_checkpoint_roundtrip(tmp_path):
    model = U2Net(cfg="small")
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    rng = np.random.default_rng(3)
    sd = _build_torch_state_dict(
        {"params": dict(ref["params"]), "batch_stats": dict(ref["batch_stats"])},
        rng,
    )
    path = tmp_path / "u2netp_synthetic.pth"
    torch.save(sd, str(path))

    conv = convert_torch_checkpoint(str(path), cfg="small")

    # identical tree structure and shapes as a native flax init
    ref_flat = jax.tree_util.tree_leaves_with_path(ref)
    conv_flat = jax.tree_util.tree_leaves_with_path(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    )
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in ref_flat}
    conv_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in conv_flat}
    assert ref_paths == conv_paths, (
        f"missing: {set(ref_paths) - set(conv_paths)}; "
        f"extra: {set(conv_paths) - set(ref_paths)}"
    )

    # values survive the layout transpose exactly
    k_flax = np.asarray(conv["params"]["stage1"]["rebnconvin"]["conv_s1"]["kernel"])
    k_torch = sd["stage1.rebnconvin.conv_s1.weight"].numpy()
    np.testing.assert_array_equal(k_flax, np.transpose(k_torch, (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(conv["batch_stats"]["stage1"]["rebnconvin"]["bn_s1"]["var"]),
        sd["stage1.rebnconvin.bn_s1.running_var"].numpy(),
    )

    # the converted tree drives the model end to end
    masks = u2net_apply(conv, jnp.ones((1, 64, 64, 3)) * 0.5, cfg="small")
    assert masks.shape == (1, 64, 64)
    m = np.asarray(masks)
    assert np.isfinite(m).all() and m.min() >= 0.0 and m.max() <= 1.0


def test_saliency_blur_scoring_runs():
    """The u2net-saliency blur mode (classical fallback without weights):
    scores are finite, and a sharp-subject frame outscores a blurred one."""
    import cv2

    from tpu_splat.ingest.blur import saliency_laplacian_variance

    rng = np.random.default_rng(0)
    h = w = 96
    frames = []
    base = np.full((h, w, 3), 0.5, np.float32)
    # a textured square subject in the center
    tex = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    for blur in (0, 0, 5, 0, 9, 0):
        img = base.copy()
        patch = tex if blur == 0 else cv2.GaussianBlur(tex, (blur, blur), 0)
        img[32:64, 32:64] = patch
        frames.append(img)
    frames = np.stack(frames)
    scores = saliency_laplacian_variance(frames, model="u2net", decay_frames=2.0)
    assert np.isfinite(scores).all() and (scores > 0).all()
    assert scores[0] > scores[2] > scores[4]
