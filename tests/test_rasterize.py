"""Rasterizer correctness: parity with a brute-force per-pixel reference renderer,
gradient flow, and geometric sanity of the projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_splat.gs.projection import project_gaussians, quat_to_rotmat
from tpu_splat.gs.rasterize import (
    ALPHA_THRESHOLD,
    MAX_ALPHA,
    rasterize,
)
from tpu_splat.gs.sh import SH_C0, eval_sh_basis


def brute_force_raster(means2d, conics, colors, opacities, depths, radii,
                       width, height, tile_size=16, background=None,
                       order_depths=None):
    """Per-pixel reference compositor (numpy). Applies the same tile-bbox support
    region as the tile rasterizer so outputs match exactly. `order_depths`
    decouples sort order from composited depth values (the rasterizer orders by
    the original f32 depths while compositing the pack-quantized ones)."""
    means2d, conics, colors = map(np.asarray, (means2d, conics, colors))
    opacities, depths, radii = map(np.asarray, (opacities, depths, radii))
    od = depths if order_depths is None else np.asarray(order_depths)
    order = np.argsort(np.where(radii > 0, od, np.inf), kind="stable")
    img = np.zeros((height, width, 3))
    acc_d = np.zeros((height, width))
    trans = np.ones((height, width))
    tx_max = -(-width // tile_size)
    ty_max = -(-height // tile_size)
    for i in order:
        if radii[i] <= 0:
            continue
        x0 = int(np.clip((means2d[i, 0] - radii[i]) // tile_size, 0, tx_max - 1))
        x1 = int(np.clip((means2d[i, 0] + radii[i]) // tile_size, 0, tx_max - 1))
        y0 = int(np.clip((means2d[i, 1] - radii[i]) // tile_size, 0, ty_max - 1))
        y1 = int(np.clip((means2d[i, 1] + radii[i]) // tile_size, 0, ty_max - 1))
        for ty in range(y0, y1 + 1):
            for txx in range(x0, x1 + 1):
                ys = slice(ty * tile_size, min((ty + 1) * tile_size, height))
                xs = slice(txx * tile_size, min((txx + 1) * tile_size, width))
                py, px = np.mgrid[ys, xs]
                dx = px + 0.5 - means2d[i, 0]
                dy = py + 0.5 - means2d[i, 1]
                a, b, c = conics[i]
                sigma = 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy
                alpha = np.minimum(opacities[i] * np.exp(-np.maximum(sigma, 0)), MAX_ALPHA)
                alpha = np.where((sigma >= 0) & (alpha >= ALPHA_THRESHOLD), alpha, 0.0)
                w = alpha * trans[ys, xs]
                img[ys, xs] += w[..., None] * colors[i]
                acc_d[ys, xs] += w * depths[i]
                trans[ys, xs] *= 1.0 - alpha
    if background is not None:
        img += trans[..., None] * np.asarray(background)
    return img, 1.0 - trans, acc_d


def make_scene(rng, n=50, width=64, height=48):
    means2d = np.stack(
        [rng.uniform(-5, width + 5, n), rng.uniform(-5, height + 5, n)], axis=1
    )
    # random SPD conics from random covariances
    L = rng.normal(size=(n, 2, 2)) * 3
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 1.0
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    conics = np.stack(
        [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det], axis=1
    )
    mid = 0.5 * (cov[:, 0, 0] + cov[:, 1, 1])
    lam = mid + np.sqrt(np.maximum(mid**2 - det, 0))
    radii = np.ceil(3 * np.sqrt(lam))
    colors = rng.uniform(0, 1, (n, 3))
    opac = rng.uniform(0.2, 1.0, n)
    depths = rng.uniform(1, 10, n)
    return (means2d.astype(np.float32), conics.astype(np.float32),
            colors.astype(np.float32), opac.astype(np.float32),
            depths.astype(np.float32), radii.astype(np.float32))


class TestRasterizeParity:
    def test_matches_brute_force(self, rng):
        args = make_scene(rng, n=80)
        w, h = 64, 48
        bg = np.array([0.1, 0.2, 0.3], np.float32)
        out = rasterize(*[jnp.asarray(a) for a in args], width=w, height=h,
                        background=jnp.asarray(bg), max_per_tile=128)
        # the packing gather rides a bf16 encoding — give the brute-force
        # reference the identically-rounded values so the comparison stays
        # exact-f32-compositing vs exact-f32-compositing
        from tpu_splat.gs.rasterize import pack_quantization

        q = [np.asarray(a) for a in pack_quantization(
            *[jnp.asarray(a) for a in args[:5]])]
        ref_img, ref_alpha, ref_d = brute_force_raster(
            *q, args[5], width=w, height=h, background=bg,
            order_depths=args[4])
        np.testing.assert_allclose(np.asarray(out.color), ref_img, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.alpha), ref_alpha, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth), ref_d, atol=1e-3)

    def test_depth_ordering_occlusion(self):
        """A nearer opaque gaussian must occlude a farther one."""
        means2d = jnp.array([[32.0, 24.0], [32.0, 24.0]])
        conics = jnp.tile(jnp.array([[0.05, 0.0, 0.05]]), (2, 1))
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        opac = jnp.array([0.95, 0.95])
        radii = jnp.array([20.0, 20.0])
        # red at depth 1 (near), green at depth 5
        out_near_red = rasterize(
            means2d, conics, colors, opac, jnp.array([1.0, 5.0]), radii,
            width=64, height=48, max_per_tile=128,
        )
        c = np.asarray(out_near_red.color)[24, 32]
        assert c[0] > 0.9 and c[1] < 0.06
        # swap depths: green in front
        out_near_green = rasterize(
            means2d, conics, colors, opac, jnp.array([5.0, 1.0]), radii,
            width=64, height=48, max_per_tile=128,
        )
        c = np.asarray(out_near_green.color)[24, 32]
        assert c[1] > 0.9 and c[0] < 0.06

    def test_culled_gaussians_invisible(self, rng):
        args = list(make_scene(rng, n=20))
        out_all = rasterize(*[jnp.asarray(a) for a in args], width=64, height=48,
                            max_per_tile=128)
        # zero radius = culled
        args[5] = np.zeros_like(args[5])
        out_none = rasterize(*[jnp.asarray(a) for a in args], width=64, height=48,
                             max_per_tile=128)
        assert float(jnp.abs(out_none.color).max()) == 0.0
        assert float(jnp.abs(out_all.color).max()) > 0.0

    def test_gradients_flow(self, rng):
        args = make_scene(rng, n=30)

        def loss(means2d, colors, opac):
            out = rasterize(
                means2d, jnp.asarray(args[1]), colors, opac,
                jnp.asarray(args[4]), jnp.asarray(args[5]),
                width=64, height=48, max_per_tile=128,
            )
            return jnp.sum(out.color**2)

        g_means, g_col, g_op = jax.grad(loss, argnums=(0, 1, 2))(
            jnp.asarray(args[0]), jnp.asarray(args[2]), jnp.asarray(args[3])
        )
        for g in (g_means, g_col, g_op):
            assert jnp.all(jnp.isfinite(g))
        assert float(jnp.abs(g_col).max()) > 0.0
        assert float(jnp.abs(g_means).max()) > 0.0


class TestProjection:
    def test_quat_identity(self):
        R = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(np.asarray(R)[0], np.eye(3), atol=1e-6)

    def test_quat_90deg_z(self):
        s = np.sqrt(0.5)
        R = np.asarray(quat_to_rotmat(jnp.array([[s, 0, 0, s]])))[0]
        np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_center_projection(self):
        """A gaussian on the optical axis lands at the principal point."""
        proj = project_gaussians(
            means=jnp.array([[0.0, 0.0, 5.0]]),
            log_scales=jnp.full((1, 3), -2.0),
            quats=jnp.array([[1.0, 0, 0, 0]]),
            viewmat=jnp.eye(4),
            fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48,
        )
        np.testing.assert_allclose(np.asarray(proj.means2d)[0], [32.0, 24.0], atol=1e-5)
        assert float(proj.depths[0]) == 5.0
        assert float(proj.radii[0]) > 0

    def test_behind_camera_culled(self):
        proj = project_gaussians(
            means=jnp.array([[0.0, 0.0, -5.0]]),
            log_scales=jnp.full((1, 3), -2.0),
            quats=jnp.array([[1.0, 0, 0, 0]]),
            viewmat=jnp.eye(4),
            fx=100.0, fy=100.0, cx=32.0, cy=24.0, width=64, height=48,
        )
        assert float(proj.radii[0]) == 0.0

    def test_isotropic_cov2d_scale(self):
        """An isotropic gaussian at depth z has screen sigma ~ fx*s/z pixels."""
        s, z, fx = 0.1, 4.0, 200.0
        proj = project_gaussians(
            means=jnp.array([[0.0, 0.0, z]]),
            log_scales=jnp.log(jnp.full((1, 3), s)),
            quats=jnp.array([[1.0, 0, 0, 0]]),
            viewmat=jnp.eye(4),
            fx=fx, fy=fx, cx=128.0, cy=128.0, width=256, height=256,
        )
        expected_sigma = fx * s / z  # 5 px
        conic = np.asarray(proj.conics)[0]
        sigma_from_conic = 1.0 / np.sqrt(conic[0])
        np.testing.assert_allclose(sigma_from_conic, expected_sigma, rtol=0.05)
        np.testing.assert_allclose(float(proj.radii[0]), 3 * expected_sigma, rtol=0.1)


class TestSH:
    def test_dc_only(self):
        basis = eval_sh_basis(0, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(basis), [[SH_C0]], atol=1e-7)

    def test_basis_orthonormality(self, rng):
        """Monte-Carlo check: int Y_i Y_j dOmega = delta_ij over the sphere."""
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        basis = np.asarray(eval_sh_basis(3, jnp.asarray(v, dtype=jnp.float32)))
        gram = 4 * np.pi * (basis.T @ basis) / v.shape[0]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)


class TestPackGatherVJP:
    def test_matches_plain_autodiff(self, rng):
        """The custom VJP (inverse-slot gather route, bf16 internals) must
        agree with plain autodiff through an equivalent quantized gather —
        a gather's gradient is value-independent, so the straight-through
        treatment of the bf16 rounding is exact up to the route's own bf16
        accumulation quantization."""
        from tpu_splat.gs.rasterize import _pack_gather, tile_gaussians

        n, width, height, k = 512, 96, 64, 128
        means2d = jnp.asarray(np.stack(
            [rng.uniform(-10, width + 10, n),
             rng.uniform(-10, height + 10, n)], 1), jnp.float32)
        depths = jnp.asarray(rng.uniform(0.1, 10, n), jnp.float32)
        radii = jnp.asarray(np.where(rng.uniform(size=n) < 0.9,
                                     rng.uniform(1, 30, n), 0.0), jnp.float32)
        b = tile_gaussians(means2d, depths, radii, width, height, 16, k)
        t_total = b.gidx.shape[0]
        feat = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
        sent = (n + b.big4_order.shape[0] + b.big8_order.shape[0]
                + b.mid_order.shape[0])
        gidx_ext = jnp.where(b.gvalid, b.gidx, sent)
        cot = jnp.asarray(rng.standard_normal((16, t_total, k)), jnp.float32)

        def loss_custom(f):
            return jnp.sum(
                _pack_gather(f, gidx_ext, b.slots_prim, b.slots_mid,
                             b.slots_big4, b.slots_big8, b.mid_order,
                             b.big4_order, b.big8_order,
                             t_total * k) * cot)

        def loss_ref(f):
            f_ext = jnp.concatenate(
                [f, f[b.big4_order], f[b.big8_order], f[b.mid_order],
                 jnp.zeros_like(f[:1])], 0)
            packed = f_ext[gidx_ext.reshape(-1)].T.reshape(16, t_total, k)
            return jnp.sum(packed * cot)

        g_c = np.asarray(jax.grad(loss_custom)(feat))
        g_r = np.asarray(jax.grad(loss_ref)(feat))
        scale = np.abs(g_r).max() + 1e-12
        err = np.abs(g_c - g_r).max() / scale
        assert err < 5e-3, f"pack VJP rel err {err:.2e}"
        # forward values stay finite under the bf16 encode/decode
        p = np.asarray(
            _pack_gather(feat, gidx_ext, b.slots_prim, b.slots_mid,
                         b.slots_big4, b.slots_big8, b.mid_order,
                         b.big4_order, b.big8_order, t_total * k))
        assert np.isfinite(p).all()


class TestTierOverflow:
    def test_mid_overflow_counts_and_degrades_gracefully(self, rng):
        """Tier 1 is capacity-capped: gaussians beyond the cap keep only
        their primary cell (graceful quality loss, never a crash) and the
        Binning reports how many were dropped."""
        from tpu_splat.gs.rasterize import tile_gaussians

        n, width, height = 20000, 640, 480
        # radius 10 at 16px tiles: spans at most 2x2, and nearly every
        # position straddles at least one tile boundary -> multi-cell
        means2d = jnp.asarray(np.stack(
            [rng.uniform(20, width - 20, n),
             rng.uniform(20, height - 20, n)], 1), jnp.float32)
        depths = jnp.asarray(rng.uniform(0.1, 10, n), jnp.float32)
        radii = jnp.full((n,), 10.0, jnp.float32)
        b = tile_gaussians(means2d, depths, radii, width, height, 16, 128)
        # tier-1b capacity (corner crossers): n//16, floor 8192. 2-cell
        # straddlers ride the unconditional tier-1a key and never overflow.
        k_mid = b.mid_order.shape[0]
        assert k_mid == max(n // 16, 8192)
        assert int(b.mid_overflow) > 0
        # every valid gaussian still appears at least once (primary cell for
        # smalls / overflow mids, center tile for overflow bigs) ...
        ext = np.concatenate(
            [np.arange(n), np.asarray(b.big4_order),
             np.asarray(b.big8_order), np.asarray(b.mid_order)])
        seen = np.zeros(n, bool)
        gidx, gvalid = np.asarray(b.gidx), np.asarray(b.gvalid)
        seen[ext[gidx[gvalid]]] = True
        assert seen.all()
        # ... and never twice in the same tile (a duplicate pair would
        # composite the gaussian twice)
        for t in range(gidx.shape[0]):
            ids = ext[gidx[t][gvalid[t]]]
            assert len(ids) == len(set(ids)), f"duplicate pair in tile {t}"

    def test_no_overflow_on_small_radii(self, rng):
        from tpu_splat.gs.rasterize import tile_gaussians

        n, width, height = 8192, 640, 480
        means2d = jnp.asarray(np.stack(
            [rng.uniform(0, width, n), rng.uniform(0, height, n)], 1),
            jnp.float32)
        depths = jnp.asarray(rng.uniform(0.1, 10, n), jnp.float32)
        radii = jnp.asarray(rng.uniform(1.0, 5.0, n), jnp.float32)
        b = tile_gaussians(means2d, depths, radii, width, height, 16, 128)
        assert int(b.mid_overflow) == 0


class TestCircleCull:
    def test_culled_pairs_are_inert(self, rng):
        """Every bbox-grid candidate pair the circle cull drops must have max
        in-tile alpha < 1/255 — i.e. the compositors' `live` gate would have
        zeroed every one of its pixels anyway (rasterize.tile_gaussians
        tile_miss; the cull is exact, not approximate)."""
        from tpu_splat.gs.rasterize import tile_gaussians

        n, width, height, ts, k = 256, 128, 96, 16, 256
        tx, ty = width // ts, height // ts
        mx = rng.uniform(-20, width + 20, n)
        my = rng.uniform(-20, height + 20, n)
        means2d = jnp.asarray(np.stack([mx, my], 1), jnp.float32)
        depths = jnp.asarray(rng.uniform(0.1, 10, n), jnp.float32)
        ops = rng.uniform(0.005, 1.0, n)
        # anisotropic covariances; radii per projection.py's formula
        s1 = rng.uniform(1.0, 12.0, n)
        s2 = s1 * rng.uniform(0.15, 1.0, n)
        th = rng.uniform(0, np.pi, n)
        ca, sa = np.cos(th), np.sin(th)
        # Sigma = R diag(s1^2, s2^2) R^T
        Sxx = ca**2 * s1**2 + sa**2 * s2**2
        Syy = sa**2 * s1**2 + ca**2 * s2**2
        Sxy = ca * sa * (s1**2 - s2**2)
        det = Sxx * Syy - Sxy**2
        conic = np.stack([Syy / det, -Sxy / det, Sxx / det], 1)
        k_exact = np.sqrt(np.maximum(2 * np.log(255.0 * ops), 0.0))
        radii = np.ceil(np.minimum(k_exact, 3.0) * s1)
        b = tile_gaussians(
            means2d, depths, jnp.asarray(radii, jnp.float32),
            width, height, ts, k, opacities=jnp.asarray(ops, jnp.float32))
        gidx, gvalid = np.asarray(b.gidx), np.asarray(b.gvalid)
        assert not (gvalid.sum(1) == k).any(), "test needs no K overflow"
        assert int(b.mid_overflow) == 0
        # tier-1/2 entries ride as EXTENDED ids past n (the pack gather
        # appends feat[big4_order], feat[big8_order], then feat[mid_order]
        # rows) — translate back to original indices
        ext = np.concatenate(
            [np.arange(n), np.asarray(b.big4_order),
             np.asarray(b.big8_order), np.asarray(b.mid_order)])
        kept = [set(ext[gidx[t][gvalid[t]]]) for t in range(tx * ty)]
        n_culled = 0
        for g in range(n):
            if radii[g] <= 0:
                continue
            x0 = int(np.clip((mx[g] - radii[g]) // ts, 0, tx - 1))
            x1 = int(np.clip((mx[g] + radii[g]) // ts, 0, tx - 1))
            y0 = int(np.clip((my[g] - radii[g]) // ts, 0, ty - 1))
            y1 = int(np.clip((my[g] + radii[g]) // ts, 0, ty - 1))
            for py in range(y0, y1 + 1):
                for px in range(x0, x1 + 1):
                    t = py * tx + px
                    if g in kept[t]:
                        continue
                    n_culled += 1
                    # max alpha over the tile's pixel grid must be < 1/255
                    xs, ys = np.meshgrid(np.arange(px * ts, px * ts + ts),
                                         np.arange(py * ts, py * ts + ts))
                    dx = xs.ravel() - mx[g]
                    dy = ys.ravel() - my[g]
                    m2 = (conic[g, 0] * dx**2 + 2 * conic[g, 1] * dx * dy
                          + conic[g, 2] * dy**2)
                    amax = ops[g] * np.exp(-0.5 * m2.min())
                    assert amax < 1.0 / 255.0, (
                        f"culled pair (g={g}, tile={t}) has live alpha "
                        f"{amax:.5f}")
        assert n_culled > 20, f"cull exercised only {n_culled} pairs"
