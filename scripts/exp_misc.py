"""Measure the non-render parts of the train step on TPU: adam, SSIM, densify
stat accumulation, lr tree, and the binning sort-payload variants."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, n=20, name=""):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(carry, i):
            out = fn(*args, i)
            return carry + out, None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return total

    _ = float(run(args))
    t0 = time.time()
    _ = float(run(args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs.losses import image_loss, ssim
    from tpu_splat.gs.optim import adam_init, adam_update

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    N = 1 << 19
    H, W = 720, 1280

    params = {
        "means": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "scales": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(N, 4)), jnp.float32),
        "opacities": jnp.asarray(rng.normal(size=(N,)), jnp.float32),
        "sh0": jnp.asarray(rng.normal(size=(N, 3)), jnp.float32),
        "shN": jnp.asarray(rng.normal(size=(N, 15, 3)), jnp.float32),
    }
    grads = {k: v * 0.01 for k, v in params.items()}
    state = adam_init(params, skip=())
    lrs = {k: jnp.float32(1e-3) for k in params}

    def f_adam(params, grads, i):
        g = {k: v + 0.0 * i for k, v in grads.items()}
        p2, _ = adam_update(params, g, state, lrs)
        return sum(jnp.sum(v) for v in p2.values())

    bench(f_adam, (params, grads), name="adam update (60ch f32/bf16-shN)")

    img1 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def f_ssim(img1, i):
        return ssim(img1 + 0.0 * i, img2)

    bench(f_ssim, (img1,), name="SSIM fwd 720p")

    def f_ssim_grad(img1, i):
        return jnp.sum(jax.grad(lambda a: image_loss(a, img2))(img1 + 0.0 * i))

    bench(f_ssim_grad, (img1,), name="image_loss fwd+bwd 720p")

    # sort payload variants at 2.6M
    M = 2_621_440
    keys = jnp.asarray(rng.integers(0, 2**32, M, dtype=np.uint32))
    pid = jnp.arange(M, dtype=jnp.int32)
    gid = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))

    def f_sort3(keys, i):
        k2 = keys ^ i.astype(jnp.uint32)
        sk, sp, sg = jax.lax.sort((k2, pid, gid), num_keys=1)
        return jnp.sum(sp.astype(jnp.float32)) + jnp.sum(sg[0].astype(jnp.float32))

    bench(f_sort3, (keys,), name="sort 2.6M key+2 payloads")

    def f_sort2(keys, i):
        k2 = keys ^ i.astype(jnp.uint32)
        sk, sp = jax.lax.sort((k2, pid), num_keys=1)
        return jnp.sum(sp.astype(jnp.float32))

    bench(f_sort2, (keys,), name="sort 2.6M key+1 payload")


if __name__ == "__main__":
    main()
