"""Is the pack-forward row gather byte-bound or row-bound? Times the same
1.84M-row gather from (N,16) tables in f32 vs bf16 (and the production
_pack_gather at K=256/512) — decides whether a bf16 hi/lo packed layout is
worth the rework."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scripts._jaxcache  # noqa: F401
from scripts.profile_step import bench_scan


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    n = (1 << 19) + 8192 + 1
    tk = 3600 * 256
    idx = jnp.asarray(rng.integers(0, n, tk), jnp.int32)
    feat32 = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
    feat16 = feat32.astype(jnp.bfloat16)

    def g32(f, i, step):
        out = f[(i + step * 0)].T.reshape(16, 3600, 256)
        return jnp.sum(out.astype(jnp.float32))

    def g16(f, i, step):
        out = f[(i + step * 0)].T.reshape(16, 3600, 256)
        return jnp.sum(out.astype(jnp.float32))

    # chain the index through the carry so nothing hoists
    def g32c(f, i, step):
        ii = (i + step) % n
        return jnp.sum(f[ii].astype(jnp.float32))

    def g16c(f, i, step):
        ii = (i + step) % n
        return jnp.sum(f[ii].astype(jnp.float32))

    bench_scan(g32c, (feat32, idx), name=f"row gather f32  ({tk/1e6:.2f}M rows)")
    bench_scan(g16c, (feat16, idx), name=f"row gather bf16 ({tk/1e6:.2f}M rows)")
    bench_scan(g32, (feat32, idx), name="gather+T+reshape f32")
    bench_scan(g16, (feat16, idx), name="gather+T+reshape bf16")


if __name__ == "__main__":
    main()
