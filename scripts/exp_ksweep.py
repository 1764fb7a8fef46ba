"""Per-tile capacity (max_per_tile) quality sweep on the TPU.

Renders the bench workload's dense random scene (400K alive, 720p — median
tile occupancy ~970, far denser than typical trained scenes) at several K and
reports PSNR against a K=1024 reference render. Measures exactly what the
capacity truncates: depth-ordered tails beyond slot K.

Also sweeps a post-opacity-reset regime (all opacities 0.01) — the worst case
for truncation, since nothing saturates and deep slots still carry light.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scripts._jaxcache  # noqa: F401


def main():
    import jax
    import jax.numpy as jnp

    from tpu_splat.gs.render import render_view

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import ring_views

    rng = np.random.default_rng(0)
    capacity = 1 << 19
    n_alive = 400_000
    width, height = 1280, 720
    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    means = jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32)
    scales = jnp.asarray(np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32)
    quats = jnp.asarray(
        np.concatenate([np.ones((capacity, 1)),
                        0.1 * rng.normal(size=(capacity, 3))], 1), jnp.float32)
    sh0 = jnp.asarray(rng.normal(0, 0.5, (capacity, 3)), jnp.float32)
    shN = jnp.asarray(rng.normal(0, 0.05, (capacity, 15, 3)), jnp.float32)
    viewmats, intrins, _ = ring_views(2, width, height, rng)
    alive_j = jnp.asarray(alive)

    fx, fy, cx, cy = [float(v) for v in np.asarray(intrins[0])]

    def render_k(opac, k):
        f = jax.jit(lambda op: render_view(
            means, scales, quats, op, sh0, shN, viewmats[0],
            fx, fy, cx, cy, width, height, sh_degree=3,
            background=jnp.zeros(3), max_per_tile=k, alive=alive_j,
        ).color)
        img = f(opac)
        return np.asarray(img)

    for regime, opac in (
        ("trained (op~sigmoid N(0,1))",
         jnp.asarray(rng.normal(0.0, 1.0, (capacity,)), jnp.float32)),
        ("post-reset (op=0.01)",
         jnp.full((capacity,), np.log(0.01 / 0.99), jnp.float32)),
    ):
        ref = render_k(opac, 1024)
        print(f"--- {regime}", flush=True)
        for k in (512, 384, 256, 128):
            t0 = time.time()
            img = render_k(opac, k)
            mse = float(np.mean((img - ref) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(f"K={k:4d}: PSNR vs K=1024 = {psnr:6.2f} dB "
                  f"(maxerr {np.abs(img - ref).max():.4f})  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
