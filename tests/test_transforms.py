"""Splat transform tests: Wigner-D SH rotation correctness by Monte-Carlo color
preservation, composition, the known 180-about-X special case, and mirroring."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_codecs import random_cloud
from tpu_splat.core.spz import rotate_180_about_x
from tpu_splat.export.transforms import (
    axis_rotation,
    mirror_splat,
    parse_rotation_spec,
    rotate_sh,
    rotate_splat,
    sh_rotation_matrices,
)
from tpu_splat.gs.sh import eval_sh_basis


def eval_color(sh0, shN, dirs, degree):
    basis = np.asarray(eval_sh_basis(degree, jnp.asarray(dirs, jnp.float32)))
    c = sh0[:, None, :] * basis[None, :, :1]  # (N, D, 1*3)? broadcast carefully
    c = np.einsum("nc,d->ndc", sh0, basis[:, 0]) if False else None
    # simpler: full contraction
    out = np.einsum("db,nbc->ndc", basis[:, 1:], shN) + np.einsum(
        "d,nc->ndc", basis[:, 0], sh0
    )
    return out  # (N, D, 3)


class TestShRotation:
    def test_band_matrices_orthogonal(self, rng):
        R = axis_rotation("x", 30) @ axis_rotation("y", 55) @ axis_rotation("z", -70)
        for D in sh_rotation_matrices(R, 3):
            np.testing.assert_allclose(D @ D.T, np.eye(D.shape[0]), atol=1e-10)

    def test_composition(self):
        Ra = axis_rotation("x", 40)
        Rb = axis_rotation("z", 25) @ axis_rotation("y", -80)
        Da = sh_rotation_matrices(Ra, 3)
        Db = sh_rotation_matrices(Rb, 3)
        Dab = sh_rotation_matrices(Rb @ Ra, 3)
        for l in range(3):
            np.testing.assert_allclose(Dab[l], Db[l] @ Da[l], atol=1e-10)

    def test_color_preservation(self, rng):
        """Rotating a splat then viewing from rotated directions must reproduce
        the original view-dependent colors (for every band, degree 3)."""
        n = 8
        sh0 = rng.normal(size=(n, 3))
        shN = rng.normal(size=(n, 15, 3))
        R = axis_rotation("x", 70) @ axis_rotation("y", 200) @ axis_rotation("z", 15)
        shN_rot = rotate_sh(shN, R)
        dirs = rng.normal(size=(64, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        dirs_rot = dirs @ R.T
        col_orig = eval_color(sh0, shN, dirs, 3)
        col_rot = eval_color(sh0, shN_rot, dirs_rot, 3)
        np.testing.assert_allclose(col_rot, col_orig, atol=1e-4)

    def test_matches_reference_180_x_flip(self, rng):
        """The SPZ codec's rotate180DegAboutX flips SH coeffs {0,1,3,6,8,10,11,13};
        the general Wigner-D path must reproduce exactly that for R_x(180)."""
        cloud = random_cloud(rng, n=10, sh_degree=3)
        q = np.asarray(cloud.quats)
        cloud = cloud.replace(quats=(q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32))
        via_codec = rotate_180_about_x(cloud)
        via_wigner = rotate_splat(cloud, axis_rotation("x", 180))
        np.testing.assert_allclose(
            np.asarray(via_wigner.means), np.asarray(via_codec.means), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(via_wigner.shN), np.asarray(via_codec.shN), atol=1e-5
        )
        # quats agree up to sign
        qa = np.asarray(via_wigner.quats)
        qb = np.asarray(via_codec.quats)
        sign = np.sign(np.sum(qa * qb, axis=1, keepdims=True))
        np.testing.assert_allclose(qa * sign, qb, atol=1e-5)

    def test_rotation_roundtrip(self, rng):
        cloud = random_cloud(rng, n=20, sh_degree=2)
        spec = "x:270,y:180"
        R = parse_rotation_spec(spec)
        back = rotate_splat(rotate_splat(cloud, spec), R.T)
        np.testing.assert_allclose(np.asarray(back.means), np.asarray(cloud.means), atol=1e-4)
        np.testing.assert_allclose(np.asarray(back.shN), np.asarray(cloud.shN), atol=1e-4)

    def test_spec_parsing(self):
        R = parse_rotation_spec("x:90")
        np.testing.assert_allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-12)
        R2 = parse_rotation_spec("x:90,z:90")  # x first, then z
        # y -> (x:90) -> z -> (z:90, leaves z fixed) -> z
        np.testing.assert_allclose(R2 @ [0, 1, 0], [0, 0, 1], atol=1e-12)
        # x -> (x:90, fixed) -> x -> (z:90) -> y
        np.testing.assert_allclose(R2 @ [1, 0, 0], [0, 1, 0], atol=1e-12)


class TestMirror:
    def test_mirror_involution(self, rng):
        cloud = random_cloud(rng, n=16, sh_degree=3)
        q = np.asarray(cloud.quats)
        cloud = cloud.replace(quats=(q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32))
        twice = mirror_splat(mirror_splat(cloud, "x"), "x")
        np.testing.assert_allclose(np.asarray(twice.means), np.asarray(cloud.means), atol=1e-5)
        np.testing.assert_allclose(np.asarray(twice.shN), np.asarray(cloud.shN), atol=1e-4)

    def test_mirror_color_preservation(self, rng):
        """Viewing the mirrored splat from mirrored directions reproduces colors."""
        n = 6
        sh0 = rng.normal(size=(n, 3)).astype(np.float32)
        shN = rng.normal(size=(n, 15, 3)).astype(np.float32)
        cloud = random_cloud(rng, n=n, sh_degree=3).replace(
            sh0=sh0, shN=shN
        )
        out = mirror_splat(cloud, "y")
        M = np.diag([1.0, -1.0, 1.0])
        dirs = rng.normal(size=(50, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        col_orig = eval_color(sh0, shN, dirs, 3)
        col_mir = eval_color(np.asarray(out.sh0), np.asarray(out.shN), dirs @ M.T, 3)
        np.testing.assert_allclose(col_mir, col_orig, atol=1e-4)

    def test_mirror_positions(self, rng):
        cloud = random_cloud(rng, n=5, sh_degree=0)
        out = mirror_splat(cloud, "z")
        np.testing.assert_allclose(
            np.asarray(out.means), np.asarray(cloud.means) * [1, 1, -1], atol=1e-6
        )
