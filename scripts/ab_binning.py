"""A/B microbenchmarks for the binning + pack regression (VERDICT r4 item 1).

Measures, on the real TPU with the scan-chained-one-jit method:
  part A: primitive costs (sorts at various sizes, top_k, scatter compaction)
  part B: tile_gaussians current vs candidate redesigns
  part C: _pack_gather fwd variants

Run:  timeout 1200 python scripts/ab_binning.py [A|B|C ...]
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
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def make_workload():
    """Same distribution as profile_step.py: 512K capacity, 400K alive, 720p."""
    import jax.numpy as jnp
    from tpu_splat.gs.projection import project_gaussians

    rng = np.random.default_rng(0)
    capacity = 1 << 19
    n_alive = 400_000
    width, height = 1280, 720
    alive = np.zeros(capacity, bool)
    alive[:n_alive] = True
    means = jnp.asarray(rng.uniform(-2, 2, (capacity, 3)), jnp.float32)
    scales = jnp.asarray(np.log(rng.uniform(0.005, 0.03, (capacity, 3))), jnp.float32)
    quats = jnp.asarray(
        np.concatenate([np.ones((capacity, 1)), 0.1 * rng.normal(size=(capacity, 3))], 1),
        jnp.float32)
    eye = np.array([4.5, 0.8, 0.0])
    z = -eye / np.linalg.norm(eye)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z); x /= np.linalg.norm(x)
    y = np.cross(z, x)
    w2c = np.eye(4, dtype=np.float32)
    w2c[:3, :3] = np.stack([x, y, z]); w2c[:3, 3] = -w2c[:3, :3] @ eye
    viewmat = jnp.asarray(w2c)
    fx = fy = width * 0.85
    proj = project_gaussians(means, scales, quats, viewmat, fx, fy,
                             width / 2, height / 2, width, height)
    radii = jnp.where(jnp.asarray(alive), proj.radii, 0.0)
    opac = jnp.asarray(1.0 / (1.0 + np.exp(-rng.normal(0.0, 1.0, capacity))),
                       jnp.float32)
    return proj, radii, opac, width, height, capacity


def part_a():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    n = 1 << 19

    for m in (1_300_000, 1_700_000, 2_600_000):
        keys = jnp.asarray(rng.integers(0, 1 << 32, m, dtype=np.uint32))
        pid = jnp.arange(m, dtype=jnp.int32)

        def f_sort(keys, i):
            k2 = keys + i.astype(jnp.uint32)
            sk, sp = jax.lax.sort_key_val(k2, pid)
            return jnp.sum(sp.astype(jnp.float32)) + jnp.sum(sk.astype(jnp.float32))

        bench(f_sort, (keys,), name=f"sort_key_val u32+i32 @ {m/1e6:.1f}M")

    score = jnp.asarray(rng.normal(size=n).astype(np.float32))
    for k in (8192, 32768, 131072):
        def f_topk(score, i, k=k):
            _, idx = jax.lax.top_k(score + 0.0 * i, k)
            return jnp.sum(idx.astype(jnp.float32))

        bench(f_topk, (score,), name=f"top_k @ 512K, k={k}")

    # compaction of ~6K flagged elements into 8192 slots: cumsum + tiny scatter
    flags = jnp.asarray(rng.random(n) < 0.012)

    def f_compact(flags, i):
        fl = flags ^ (i < 0)
        pos = jnp.cumsum(fl.astype(jnp.int32)) - 1
        idx = jnp.where(fl & (pos < 8192), pos, 8192)
        order = jnp.full((8193,), 0, jnp.int32).at[idx].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        return jnp.sum(order.astype(jnp.float32))

    bench(f_compact, (flags,), name="cumsum+scatter compaction 512K->8192")

    # per-row argsort of live masks (tier-2 cell compaction candidate)
    live = jnp.asarray(rng.random((8192, 64)) < 0.3)

    def f_rowsort(live, i):
        order = jnp.argsort(~(live ^ (i < 0)), axis=1)
        return jnp.sum(order.astype(jnp.float32))

    bench(f_rowsort, (live,), name="row argsort (8192,64) bool")


def part_a2():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    m = 1_300_000
    t_total = 3600
    K = 512
    pid = jnp.arange(m, dtype=jnp.int32)
    sorted_tile = jnp.sort(jnp.asarray(
        rng.integers(0, t_total + 1, m, dtype=np.int32)))

    def f_cummax(sorted_tile, i):
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]])
        run_start = jax.lax.cummax(jnp.where(is_start, pid + i * 0, 0))
        return jnp.sum(run_start.astype(jnp.float32))

    bench(f_cummax, (sorted_tile,), name="is_start + cummax @ 1.3M")

    def f_searchsorted(sorted_tile, i):
        s = jnp.searchsorted(sorted_tile + 0 * i,
                             jnp.arange(t_total + 1, dtype=jnp.int32))
        return jnp.sum(s.astype(jnp.float32))

    bench(f_searchsorted, (sorted_tile,), name="searchsorted 3601 @ 1.3M")

    sorted_gid = jnp.asarray(rng.integers(0, 1 << 19, m + K, dtype=np.int32))
    tile_start = jnp.sort(jnp.asarray(
        rng.integers(0, m - K, t_total, dtype=np.int32)))

    def f_dynslice(sorted_gid, i):
        g = jax.vmap(lambda s: jax.lax.dynamic_slice(
            sorted_gid, (s + 0 * i,), (K,)))(tile_start)
        return jnp.sum(g.astype(jnp.float32))

    bench(f_dynslice, (sorted_gid,), name="vmap dynamic_slice (3600, 512)")

    idx32 = jnp.asarray(rng.integers(0, 1 << 19, 32768, dtype=np.int32))
    vals = jnp.asarray(rng.random(32768) > 0.5)

    def f_scatter_bool(vals, i):
        out = jnp.zeros((1 << 19,), bool).at[idx32].set(vals ^ (i < 0))
        return jnp.sum(out.astype(jnp.float32))

    bench(f_scatter_bool, (vals,), name="bool scatter set 32K -> 512K")

    big_idx = jnp.asarray(rng.integers(0, 1 << 19, 1_300_000, dtype=np.int32))
    f32 = jnp.asarray(rng.random(m).astype(np.float32))

    def f_inv_sort(f32, i):
        _, s = jax.lax.sort_key_val(big_idx + 0 * i, pid)
        return jnp.sum(s.astype(jnp.float32)) + f32[0]

    bench(f_inv_sort, (f32,), name="sort_key_val i32+i32 @ 1.3M (inverse)")

    # concat of 4 key streams (HBM write test)
    a = jnp.asarray(rng.integers(0, 1 << 31, 512 * 1024, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 31, 128 * 1024, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 1 << 31, 96 * 1024, dtype=np.uint32))
    d = jnp.asarray(rng.integers(0, 1 << 31, 512 * 1024, dtype=np.uint32))

    def f_concat(a, i):
        k = jnp.concatenate([a + i.astype(jnp.uint32), b, c, d])
        return jnp.sum(k.astype(jnp.float32))

    bench(f_concat, (a,), name="concat 4 key streams -> 1.25M")


def part_b():
    import jax.numpy as jnp
    from tpu_splat.gs.rasterize import tile_gaussians

    proj, radii, opac, width, height, capacity = make_workload()
    K = 512

    def f_cur(m2d, depths, r, op, i):
        b = tile_gaussians(m2d + 0.0 * i, depths, r, width, height, 16, K,
                           opacities=op)
        return (jnp.sum(b.gidx.astype(jnp.float32))
                + jnp.sum(b.slots_prim.astype(jnp.float32))
                + jnp.sum(b.slots_mid.astype(jnp.float32))
                + jnp.sum(b.slots_big4.astype(jnp.float32))
                + jnp.sum(b.slots_big8.astype(jnp.float32)))

    bench(f_cur, (proj.means2d, proj.depths, radii, opac),
          name="tile_gaussians CURRENT (w/ opacities)")

    from scripts._binning_v3 import tile_gaussians_v3

    def f_v3(m2d, depths, r, op, i):
        b = tile_gaussians_v3(m2d + 0.0 * i, depths, r, width, height, 16, K,
                              opacities=op)
        return (jnp.sum(b.gidx.astype(jnp.float32))
                + jnp.sum(b.slots_prim.astype(jnp.float32))
                + jnp.sum(b.slots_mid.astype(jnp.float32))
                + jnp.sum(b.slots_big4.astype(jnp.float32))
                + jnp.sum(b.slots_big8.astype(jnp.float32)))

    bench(f_v3, (proj.means2d, proj.depths, radii, opac),
          name="tile_gaussians V3 (no top_k, 2-key small)")


def part_c():
    import jax.numpy as jnp
    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.rasterize import _pack_gather, tile_gaussians

    proj, radii, opac, width, height, capacity = make_workload()
    K = 512
    b = tile_gaussians(proj.means2d, proj.depths, radii, width, height, 16, K,
                       opacities=opac)
    t_total = b.gidx.shape[0]
    feat = jnp.concatenate(
        [proj.means2d, proj.conics, jnp.ones((capacity, 3), jnp.float32) * 0.3,
         opac[:, None], proj.depths[:, None],
         jnp.zeros((capacity, pr.C_PACK - 10))], axis=-1)
    sent = capacity + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sent)

    def f_pack(feat, i):
        packed = _pack_gather(feat + 0.0 * i, gidx_ext, b.slots_prim,
                              b.slots_mid, b.slots_big4, b.slots_big8, b.mid_order,
                              b.big4_order, b.big8_order, t_total * K)
        return jnp.sum(packed)

    bench(f_pack, (feat,), name="pack fwd CURRENT (full)")

    # pieces: the bf16 encode+concat table build, the raw row gather, the
    # transpose+decode — to see which dominates the 13.8ms.
    n_ext = capacity + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0] + 1

    def build_enc(feat):
        f16 = feat.astype(jnp.bfloat16)
        lo = (feat[:, 0:2] - f16[:, 0:2].astype(jnp.float32)).astype(jnp.bfloat16)
        enc = jnp.concatenate(
            [f16[:, 0:2], lo, f16[:, 2:10], jnp.zeros_like(f16[:, :4])], axis=1)
        return jnp.concatenate(
            [enc, enc[b.big4_order], enc[b.big8_order], enc[b.mid_order], jnp.zeros_like(enc[:1])],
            axis=0)

    def f_enc(feat, i):
        return jnp.sum(build_enc(feat + 0.0 * i).astype(jnp.float32))

    bench(f_enc, (feat,), name="pack fwd: enc table build only")

    enc_ext = build_enc(feat)
    flat_idx = gidx_ext.reshape(-1)

    def f_gather(enc_ext, i):
        g = enc_ext[flat_idx] * (1 + 0 * i).astype(jnp.bfloat16)
        return jnp.sum(g.astype(jnp.float32))

    bench(f_gather, (enc_ext,), name="pack fwd: row gather only (M=1.84M)")

    def f_gather_t(enc_ext, i):
        g = (enc_ext[flat_idx] * (1 + 0 * i).astype(jnp.bfloat16)).T
        g = g.reshape(16, t_total, K)
        return jnp.sum(g.astype(jnp.float32))

    bench(f_gather_t, (enc_ext,), name="pack fwd: gather + transpose")

    # sorted (contiguous-ish) index order: same M, index locality test
    srt = jnp.sort(flat_idx)

    def f_gather_s(enc_ext, i):
        g = enc_ext[srt] * (1 + 0 * i).astype(jnp.bfloat16)
        return jnp.sum(g.astype(jnp.float32))

    bench(f_gather_s, (enc_ext,), name="pack fwd: row gather, sorted idx")

    # f32 table (no bf16 halving) for reference
    enc32 = enc_ext.astype(jnp.float32)

    def f_gather32(enc32, i):
        g = enc32[flat_idx] + 0.0 * i
        return jnp.sum(g)

    bench(f_gather32, (enc32,), name="pack fwd: row gather f32 table")


def part_c2():
    """Full _pack_gather-equivalent fwd with candidate fixes."""
    import jax
    import jax.numpy as jnp
    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.rasterize import tile_gaussians

    proj, radii, opac, width, height, capacity = make_workload()
    K = 512
    b = tile_gaussians(proj.means2d, proj.depths, radii, width, height, 16, K,
                       opacities=opac)
    t_total = b.gidx.shape[0]
    feat = jnp.concatenate(
        [proj.means2d, proj.conics, jnp.ones((capacity, 3), jnp.float32) * 0.3,
         opac[:, None], proj.depths[:, None],
         jnp.zeros((capacity, pr.C_PACK - 10))], axis=-1)
    sent = capacity + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sent)
    t, k = gidx_ext.shape

    def fwd(feat, barrier, bf16_out):
        f16 = feat.astype(jnp.bfloat16)
        lo = (feat[:, 0:2] - f16[:, 0:2].astype(jnp.float32)).astype(jnp.bfloat16)
        enc = jnp.concatenate(
            [f16[:, 0:2], lo, f16[:, 2:10], jnp.zeros_like(f16[:, :4])], axis=1)
        enc_ext = jnp.concatenate(
            [enc, enc[b.big4_order], enc[b.big8_order], enc[b.mid_order], jnp.zeros_like(enc[:1])],
            axis=0)
        if barrier:
            enc_ext = jax.lax.optimization_barrier(enc_ext)
        g = enc_ext[gidx_ext.reshape(-1)].T.reshape(feat.shape[1], t, k)
        if bf16_out:
            return jnp.sum(g.astype(jnp.float32))
        gf = g.astype(jnp.float32)
        out = jnp.concatenate(
            [gf[0:2] + gf[2:4], gf[4:12], jnp.zeros_like(gf[0:6])], axis=0)
        return jnp.sum(out)

    def f_cur(feat, i):
        return fwd(feat + 0.0 * i, False, False)

    def f_bar(feat, i):
        return fwd(feat + 0.0 * i, True, False)

    def f_bar16(feat, i):
        return fwd(feat + 0.0 * i, True, True)

    bench(f_cur, (feat,), name="pack fwd inline (no barrier)")
    bench(f_bar, (feat,), name="pack fwd + optimization_barrier")
    bench(f_bar16, (feat,), name="pack fwd + barrier, bf16 out (no decode)")


def part_c3():
    """Isolate pack-fwd stages with forced materialization."""
    import jax
    import jax.numpy as jnp
    from tpu_splat.gs import pallas_raster as pr
    from tpu_splat.gs.rasterize import tile_gaussians

    proj, radii, opac, width, height, capacity = make_workload()
    K = 512
    b = tile_gaussians(proj.means2d, proj.depths, radii, width, height, 16, K,
                       opacities=opac)
    t_total = b.gidx.shape[0]
    feat = jnp.concatenate(
        [proj.means2d, proj.conics, jnp.ones((capacity, 3), jnp.float32) * 0.3,
         opac[:, None], proj.depths[:, None],
         jnp.zeros((capacity, pr.C_PACK - 10))], axis=-1)
    sent = capacity + b.big4_order.shape[0] + b.big8_order.shape[0] + b.mid_order.shape[0]
    gidx_ext = jnp.where(b.gvalid, b.gidx, sent)
    t, k = gidx_ext.shape
    flat_idx = gidx_ext.reshape(-1)

    def build(feat):
        f16 = feat.astype(jnp.bfloat16)
        lo = (feat[:, 0:2] - f16[:, 0:2].astype(jnp.float32)).astype(jnp.bfloat16)
        enc = jnp.concatenate(
            [f16[:, 0:2], lo, f16[:, 2:10], jnp.zeros_like(f16[:, :4])], axis=1)
        return jax.lax.optimization_barrier(jnp.concatenate(
            [enc, enc[b.big4_order], enc[b.big8_order], enc[b.mid_order], jnp.zeros_like(enc[:1])],
            axis=0))

    def f_g_mat(feat, i):
        g = build(feat + 0.0 * i)[flat_idx]
        g = jax.lax.optimization_barrier(g)
        return jnp.sum(g.astype(jnp.float32))

    def f_gt_mat(feat, i):
        g = build(feat + 0.0 * i)[flat_idx].T
        g = jax.lax.optimization_barrier(g)
        return jnp.sum(g.astype(jnp.float32))

    def f_g3_mat(feat, i):
        g = build(feat + 0.0 * i)[flat_idx].reshape(t, k, 16)
        g = jnp.transpose(g, (0, 2, 1))  # (t, 16, k) batched minor transpose
        g = jax.lax.optimization_barrier(g)
        return jnp.sum(g.astype(jnp.float32))

    def f_g8_mat(feat, i):
        g = build(feat + 0.0 * i)[flat_idx].reshape(t * k // 8, 8, 16)
        g = jnp.transpose(g, (0, 2, 1)).reshape(t * k // 8, 128)
        g = jax.lax.optimization_barrier(g)
        return jnp.sum(g.astype(jnp.float32))

    bench(f_g_mat, (feat,), name="enc + gather, materialized (no T)")
    bench(f_gt_mat, (feat,), name="enc + gather + .T, materialized")
    bench(f_g3_mat, (feat,), name="enc + gather + (t,16,k) batch-T, mat")
    bench(f_g8_mat, (feat,), name="enc + gather + 8-slot 128-lane pack, mat")


def main():
    import jax
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)
    parts = sys.argv[1:] or ["A"]
    if "A" in parts:
        part_a()
    if "A2" in parts:
        part_a2()
    if "B" in parts:
        part_b()
    if "C" in parts:
        part_c()
    if "C2" in parts:
        part_c2()
    if "C3" in parts:
        part_c3()


if __name__ == "__main__":
    main()
