"""Measure essential_ransac accuracy vs multistart budget (n_fib candidates,
pre_steps pre-polish GN iterations) on the quasi-degenerate orbit-pair scenes
from tests/test_sfm_geometry.py — decides the cheapest safe multistart.

Measured (CPU, 12 hard pairs: plane-heavy 0.5px and tight-cluster 0.3px at
f=140, 18-degree orbit steps):
    n_fib=512 pre=10: max 7.68  mean 3.37 deg   (the original full budget)
    n_fib=128 pre= 3: max 7.68  mean 3.37 deg   <- default (2x margin)
    n_fib= 64 pre= 3: max 7.68  mean 3.37 deg   <- cheapest identical
    n_fib= 32 pre= 3: max 17.38 mean 4.82 deg   <- cliff: under-samples basins
    n_fib=  0 pre= 0: max 18.59 mean 9.84 deg   <- multistart disabled
Run: python scripts/exp_msac_polish.py
"""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "./tests")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

FX = 140.0


def run(pts, sigma_px, seed, n_fib, pre):
    from test_sfm_geometry import _ring_pair
    from tpu_splat.sfm.geometry import (decompose_essential, essential_ransac,
                                        log_so3)
    rng = np.random.default_rng(seed)
    (Ra, ta), (Rb, tb), R_rel, t_dir = _ring_pair()

    def proj(R, t):
        xc = pts @ R.T + t
        return xc[:, :2] / xc[:, 2:]

    n = len(pts)
    x1 = proj(Ra, ta) + rng.normal(0, sigma_px / FX, (n, 2))
    x2 = proj(Rb, tb) + rng.normal(0, sigma_px / FX, (n, 2))
    E, inl = essential_ransac(
        jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(seed), threshold=2.0 / FX,
        n_fib=n_fib, pre_steps=pre)
    R, t = decompose_essential(E, jnp.asarray(x1, jnp.float32),
                               jnp.asarray(x2, jnp.float32), inl)
    return float(np.degrees(np.linalg.norm(np.asarray(
        log_so3(jnp.asarray(np.asarray(R) @ R_rel.T))))))


def main():
    for n_fib, pre in [(512, 10), (128, 3), (64, 3), (32, 3), (0, 0)]:
        errs = []
        for seed in range(6):
            r = np.random.default_rng(seed)
            pts = np.concatenate([
                r.normal(0, 0.35, (60, 3)),
                np.c_[r.uniform(-1.5, 1.5, 40), np.full(40, 0.9),
                      r.uniform(-1.5, 1.5, 40)]])
            errs.append(run(pts, 0.5, seed, n_fib, pre))
            pts2 = r.normal(0, 0.25, (100, 3))
            errs.append(run(pts2, 0.3, seed + 50, n_fib, pre))
        print(f"n_fib={n_fib:4d} pre={pre:2d}: max {max(errs):6.2f} "
              f"mean {np.mean(errs):5.2f} deg over {len(errs)} hard pairs",
              flush=True)


if __name__ == "__main__":
    main()
