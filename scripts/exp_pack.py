"""Experiments: pack gather fwd/bwd variants at production sizes (TPU).

Variants:
  fwd_f32   : current — gather (N,16) f32 rows (512B padded each)
  fwd_bf16  : gather (N,16) bf16 rows (256B padded), hi/lo split channels
  bwd_cur   : current — mask-mult temp + constant matmul
  bwd_dotf  : same but mul expressed inside dot_general operand (fusion test)
  bwd_bf16  : masked temp in bf16
"""

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
    print(f"{name:34s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    N = 1 << 19          # gaussians
    T = 3600             # tiles (720p)
    K = 512
    TK = T * K
    M1 = N * 4           # tier-1 pair count
    c = 16

    feat = jnp.asarray(rng.normal(size=(N + 1, c)), jnp.float32)
    gidx_ext = jnp.asarray(rng.integers(0, N + 1, (T, K)), jnp.int32)
    slots1 = jnp.asarray(rng.integers(0, TK + 1, (N, 4)), jnp.int32)
    d_packed = jnp.asarray(rng.normal(size=(c, TK)), jnp.float32)

    # ---------------- forward variants ----------------
    def fwd_f32(feat, i):
        f = feat + 0.0 * i
        return jnp.sum(f[gidx_ext.reshape(-1)].T.reshape(c, T, K))

    bench(fwd_f32, (feat,), name="fwd gather f32 rows")

    feat16 = feat.astype(jnp.bfloat16)

    def fwd_bf16(feat16, i):
        f = feat16 + jnp.bfloat16(0.0) * i.astype(jnp.bfloat16)
        out = f[gidx_ext.reshape(-1)].T.reshape(c, T, K)
        return jnp.sum(out.astype(jnp.float32))

    bench(fwd_bf16, (feat16,), name="fwd gather bf16 rows")

    # ---------------- backward variants ----------------
    tk8 = TK // 8
    lane = jnp.arange(c * 8, dtype=jnp.int32)[None, :]
    reduce_mat = (
        (jnp.arange(c * 8)[:, None] // 8) == jnp.arange(c)[None, :]
    ).astype(jnp.float32)
    rm_tiled = jnp.tile(reduce_mat, (4, 1))

    def make_d8(d_packed):
        d8 = d_packed.reshape(c, tk8, 8).transpose(1, 0, 2).reshape(tk8, c * 8)
        return jnp.concatenate([d8, jnp.zeros((1, c * 8), d_packed.dtype)], 0)

    def bwd_cur(d_packed, i):
        d8 = make_d8(d_packed + 0.0 * i)
        flat = slots1.reshape(-1)
        rows = d8[flat >> 3]
        mask = ((lane & 7) == (flat & 7)[:, None]).astype(jnp.float32)
        masked = (rows * mask).reshape(N, 4 * c * 8)
        out = jnp.dot(masked, rm_tiled, preferred_element_type=jnp.float32,
                      precision="highest")
        return jnp.sum(out)

    bench(bwd_cur, (d_packed,), name="bwd current (mask temp + dot)")

    def bwd_bf16(d_packed, i):
        d8 = make_d8((d_packed + 0.0 * i).astype(jnp.bfloat16))
        flat = slots1.reshape(-1)
        rows = d8[flat >> 3]
        mask = ((lane & 7) == (flat & 7)[:, None]).astype(jnp.bfloat16)
        masked = (rows * mask).reshape(N, 4 * c * 8)
        out = jnp.dot(masked, rm_tiled.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return jnp.sum(out)

    bench(bwd_bf16, (d_packed,), name="bwd bf16 rows+temp")

    # mask folded into the reduce matrix per phase, summed over 8 phase dots:
    # out = sum_p [rows * (phase==p)] @ R_p where R_p selects lanes ch*8+p.
    # (phase==p) is per-row scalar -> weight AFTER the dot: rows @ R_p gives
    # out_p[i,ch] = rows[i, ch*8+p]; then out = sum_p w_p[:,None] * out_p.
    # 8 skinny dots (128->16) but NO (M,128) temp.
    def bwd_phase(d_packed, i):
        d8 = make_d8(d_packed + 0.0 * i)
        flat = slots1.reshape(-1)
        rows = d8[flat >> 3]                       # (M, 128)
        phase = (flat & 7)[:, None]                # (M, 1)
        acc = jnp.zeros((M1, c), jnp.float32)
        for p in range(8):
            Rp = ((jnp.arange(c * 8)[:, None] % 8 == p)
                  & (jnp.arange(c * 8)[:, None] // 8
                     == jnp.arange(c)[None, :])).astype(jnp.float32)
            outp = jnp.dot(rows, Rp, preferred_element_type=jnp.float32,
                           precision="highest")
            acc = acc + jnp.where(phase == p, outp, 0.0)
        return jnp.sum(acc.reshape(N, 4, c).sum(1))

    bench(bwd_phase, (d_packed,), name="bwd 8-phase dots (no mask temp)")

    # single dot to (M,16) via one wide matrix then phase-select from 8
    # variants packed on the channel axis: rows @ R_all -> (M, 128) where
    # cols = ch*8+p. Then select col ch*8+phase: same select problem. skip.

    # hi/lo split check: exactness of tile-relative means in bf16 pairs
    mx = rng.uniform(0, 1280, 100000).astype(np.float32)
    tc = (mx // 16) * 16 + 8
    rel = mx - tc
    hi = np.round(rel)
    lo = (rel - hi).astype(np.float32)
    err = np.abs(
        (np.float32(np.asarray(jnp.bfloat16(hi), np.float32))
         + np.float32(np.asarray(jnp.bfloat16(lo), np.float32))) - rel
    )
    print(f"hi/lo bf16 tile-relative mean err: max {err.max():.5f}px")


if __name__ == "__main__":
    main()
