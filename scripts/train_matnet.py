"""Train MatNet (the bundled compact matting net) on procedural composites.

Run (TPU or CPU):
    timeout 3600 python scripts/train_matnet.py [--steps 3000] [--eval-only]

Writes tpu_splat/matting/weights/matnet.npz (float16, <1 MB) and prints the
held-out IoU on tests/test_matting_quality.composite_scene — a distribution
the trainer never samples (fixed geometry + texture family combinations).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tpu_splat", "matting", "weights", "matnet.npz"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_splat.matting import matnet
    from tpu_splat.matting.synthdata import make_batch

    print(f"backend: {jax.default_backend()}", flush=True)

    if args.eval_only:
        evaluate(args.out)
        return

    params = {k: jnp.asarray(v) for k, v in matnet.init_params(args.seed).items()}
    opt_m = jax.tree.map(jnp.zeros_like, params)
    opt_v = jax.tree.map(jnp.zeros_like, params)

    def loss_fn(params, imgs, masks):
        logits = matnet.apply(params, imgs)
        # BCE + soft IoU (the bench metric is hard IoU at 0.5)
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * masks
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        p = jax.nn.sigmoid(logits)
        inter = jnp.sum(p * masks, axis=(1, 2))
        union = jnp.sum(p + masks - p * masks, axis=(1, 2))
        soft_iou = jnp.mean(inter / jnp.maximum(union, 1.0))
        return bce + 0.5 * (1.0 - soft_iou), soft_iou

    @jax.jit
    def step(params, opt_m, opt_v, imgs, masks, t):
        (loss, iou), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, imgs, masks)
        b1, b2, eps = 0.9, 0.999, 1e-8
        opt_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt_m, grads)
        opt_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, opt_v, grads)
        lr_t = args.lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        # cosine decay over the run
        lr_t = lr_t * 0.5 * (1 + jnp.cos(jnp.pi * jnp.minimum(t / args.steps, 1.0)))
        params = jax.tree.map(
            lambda p, m, v: p - lr_t * m / (jnp.sqrt(v) + eps),
            params, opt_m, opt_v)
        return params, opt_m, opt_v, loss, iou

    rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    for i in range(1, args.steps + 1):
        imgs, masks = make_batch(rng, args.batch)
        params, opt_m, opt_v, loss, iou = step(
            params, opt_m, opt_v, jnp.asarray(imgs), jnp.asarray(masks),
            jnp.float32(i))
        if i % 100 == 0 or i == 1:
            print(f"step {i:5d}  loss {float(loss):.4f}  soft-iou "
                  f"{float(iou):.3f}  {time.time() - t0:.0f}s", flush=True)

    matnet.save_params({k: np.asarray(v) for k, v in params.items()}, args.out)
    sz = os.path.getsize(args.out) / 1e6
    print(f"saved {args.out} ({sz:.2f} MB)")
    evaluate(args.out)


def evaluate(weights_path):
    """Held-out check: the matting-quality bench scene (never trained on) and
    a fresh batch of generator composites."""
    import tpu_splat.matting.matnet as matnet
    from tpu_splat.matting.synthdata import make_batch
    from tests.test_matting_quality import composite_scene, mask_iou

    imgs, gt = composite_scene()
    sal = matnet.matnet_saliency(imgs, weights_path)
    ious = [mask_iou(sal[i], gt[i]) for i in range(len(imgs))]
    print(f"held-out bench-scene IoU: {np.mean(ious):.3f} "
          f"(min {np.min(ious):.3f})")

    rng = np.random.default_rng(12345)
    imgs2, gt2 = make_batch(rng, 24)
    sal2 = matnet.matnet_saliency(imgs2, weights_path)
    ious2 = [mask_iou(sal2[i], gt2[i]) for i in range(len(imgs2))]
    print(f"generator fresh-batch IoU: {np.mean(ious2):.3f} "
          f"(min {np.min(ious2):.3f})")


if __name__ == "__main__":
    main()
