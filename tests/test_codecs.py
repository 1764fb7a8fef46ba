"""PLY and SPZ codec tests: round trips, golden bytes, format invariants."""

import gzip
import io
import struct

import numpy as np
import pytest

from tpu_splat.core import spz
from tpu_splat.core.ply import load_ply, save_ply
from tpu_splat.core.types import GaussianCloud


def random_cloud(rng, n=100, sh_degree=3, antialiased=False):
    k = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    return GaussianCloud(
        means=(rng.normal(size=(n, 3)) * 5).astype(np.float32),
        scales=(rng.normal(size=(n, 3)) * 1.5 - 4).astype(np.float32),
        quats=quats,
        opacities=rng.normal(size=(n,)).astype(np.float32) * 2,
        sh0=rng.normal(size=(n, 3)).astype(np.float32),
        shN=(rng.normal(size=(n, k, 3)) * 0.3).astype(np.float32),
        antialiased=antialiased,
    )


class TestPly:
    def test_roundtrip_exact(self, rng, tmp_path):
        cloud = random_cloud(rng, n=57, sh_degree=3)
        p = str(tmp_path / "splat.ply")
        save_ply(cloud, p)
        back = load_ply(p)
        np.testing.assert_array_equal(back.means, cloud.means)
        np.testing.assert_array_equal(back.scales, cloud.scales)
        np.testing.assert_array_equal(back.quats, cloud.quats)
        np.testing.assert_array_equal(back.opacities, cloud.opacities)
        np.testing.assert_array_equal(back.sh0, cloud.sh0)
        np.testing.assert_array_equal(back.shN, cloud.shN)

    def test_roundtrip_degree0(self, rng, tmp_path):
        cloud = random_cloud(rng, n=10, sh_degree=0)
        p = str(tmp_path / "splat.ply")
        save_ply(cloud, p)
        back = load_ply(p)
        assert back.shN.shape == (10, 0, 3)
        np.testing.assert_array_equal(back.means, cloud.means)

    def test_header_layout(self, rng):
        """Property order must match the reference writer exactly (load-spz.cc:807-830)."""
        cloud = random_cloud(rng, n=3, sh_degree=1)
        buf = io.BytesIO()
        save_ply(cloud, buf)
        header = buf.getvalue().split(b"end_header\n")[0].decode()
        lines = header.strip().splitlines()
        assert lines[0] == "ply"
        assert lines[1] == "format binary_little_endian 1.0"
        assert lines[2] == "element vertex 3"
        props = [l.split()[-1] for l in lines if l.startswith("property")]
        expected = (
            ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
            + [f"f_rest_{i}" for i in range(9)]
            + ["opacity", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3"]
        )
        assert props == expected

    def test_frest_channel_major(self, rng):
        """f_rest must be channel-major: all K coeffs for R, then G, then B."""
        n, k = 2, 3
        shN = np.zeros((n, k, 3), dtype=np.float32)
        for c in range(k):
            shN[:, c, 0] = 100 + c  # R channel
            shN[:, c, 1] = 200 + c  # G
            shN[:, c, 2] = 300 + c  # B
        cloud = GaussianCloud(
            means=np.zeros((n, 3), np.float32),
            scales=np.zeros((n, 3), np.float32),
            quats=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
            opacities=np.zeros((n,), np.float32),
            sh0=np.zeros((n, 3), np.float32),
            shN=shN,
        )
        buf = io.BytesIO()
        save_ply(cloud, buf)
        raw = buf.getvalue().split(b"end_header\n")[1]
        row = np.frombuffer(raw, dtype="<f4").reshape(n, 17 + 3 * k)[0]
        np.testing.assert_array_equal(row[9 : 9 + 9], [100, 101, 102, 200, 201, 202, 300, 301, 302])


class TestSpz:
    def test_header_bytes(self, rng):
        cloud = random_cloud(rng, n=5, sh_degree=2, antialiased=True)
        raw = spz.pack_gaussians(cloud)
        magic, version, n, deg, frac, flags, reserved = struct.unpack("<IIIBBBB", raw[:16])
        assert magic == 0x5053474E
        assert version == 2
        assert n == 5
        assert deg == 2
        assert frac == 12
        assert flags == 1
        assert reserved == 0
        # total size: header + N*9 pos + N alpha + N*3 color + N*3 scale + N*3 rot + N*8*3 sh
        assert len(raw) == 16 + 5 * (9 + 1 + 3 + 3 + 3 + 24)

    def test_roundtrip_quantization_stability(self, rng, tmp_path):
        """pack -> unpack -> pack must be byte-identical (quantization is idempotent)."""
        cloud = random_cloud(rng, n=200, sh_degree=3)
        raw1 = spz.pack_gaussians(cloud)
        back = spz.unpack_gaussians(raw1)
        raw2 = spz.pack_gaussians(back)
        assert raw1 == raw2

    def test_roundtrip_accuracy(self, rng):
        cloud = random_cloud(rng, n=500, sh_degree=1)
        back = spz.unpack_gaussians(spz.pack_gaussians(cloud))
        # positions: 12 fractional bits -> ~0.25mm resolution
        np.testing.assert_allclose(back.means, cloud.means, atol=1.5 / 4096)
        # scales: 1/16 resolution
        np.testing.assert_allclose(back.scales, cloud.scales, atol=1.0 / 16 + 1e-5)
        # alpha roundtrip through sigmoid/8-bit
        a1 = 1 / (1 + np.exp(-np.asarray(cloud.opacities)))
        a2 = 1 / (1 + np.exp(-np.asarray(back.opacities)))
        np.testing.assert_allclose(a1, a2, atol=1.0 / 255 + 1e-5)

    def test_rotation_sign_convention(self):
        """Quaternions with negative w must be negated before packing (w >= 0)."""
        q = np.array([[-0.5, 0.5, 0.5, 0.5]], np.float32)  # wxyz, w < 0
        cloud = GaussianCloud(
            means=np.zeros((1, 3), np.float32),
            scales=np.zeros((1, 3), np.float32),
            quats=q,
            opacities=np.zeros((1,), np.float32),
            sh0=np.zeros((1, 3), np.float32),
            shN=np.zeros((1, 0, 3), np.float32),
        )
        back = spz.unpack_gaussians(spz.pack_gaussians(cloud))
        expected = -q[0]  # same rotation, positive w
        np.testing.assert_allclose(np.asarray(back.quats)[0], expected, atol=0.01)

    def test_file_roundtrip_gzip(self, rng, tmp_path):
        cloud = random_cloud(rng, n=64, sh_degree=0)
        p = str(tmp_path / "splat.spz")
        spz.save_spz(cloud, p)
        with open(p, "rb") as f:
            assert f.read(2) == b"\x1f\x8b"  # gzip magic
        back = spz.load_spz(p)
        np.testing.assert_allclose(back.means, cloud.means, atol=1.5 / 4096)

    def test_sh_bucket_quantization(self):
        """First 9 SH values use bucket 8 (5 bits); the rest bucket 16 (4 bits)."""
        n, k = 1, 15
        shN = np.full((n, k, 3), 0.1, np.float32)
        cloud = GaussianCloud(
            means=np.zeros((n, 3), np.float32),
            scales=np.zeros((n, 3), np.float32),
            quats=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
            opacities=np.zeros((n,), np.float32),
            sh0=np.zeros((n, 3), np.float32),
            shN=shN,
        )
        raw = spz.pack_gaussians(cloud)
        sh_off = 16 + n * (9 + 1 + 3 + 3 + 3)
        sh_bytes = np.frombuffer(raw, np.uint8, offset=sh_off)
        # 0.1*128 = 12.8 -> round 13 -> +128 = 141.
        # bucket 8: (141+4)//8*8 = 144; bucket 16: (141+8)//16*16 = 144
        assert all(b % 8 == 0 for b in sh_bytes[:9])
        assert all(b % 16 == 0 for b in sh_bytes[9:])

    def test_rotate180_about_x_involution(self, rng):
        cloud = random_cloud(rng, n=20, sh_degree=3)
        # normalize quats so comparison is in canonical form
        q = np.asarray(cloud.quats)
        q = q / np.linalg.norm(q, axis=1, keepdims=True)
        cloud = cloud.replace(quats=q.astype(np.float32))
        twice = spz.rotate_180_about_x(spz.rotate_180_about_x(cloud))
        np.testing.assert_allclose(twice.means, cloud.means, atol=1e-6)
        np.testing.assert_allclose(twice.shN, cloud.shN, atol=1e-6)
        # quats equal up to global sign
        q2 = np.asarray(twice.quats)
        sign = np.sign(np.sum(q2 * q, axis=1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-5)

    def test_rotate180_rotates_positions(self, rng):
        cloud = random_cloud(rng, n=4, sh_degree=0)
        out = spz.rotate_180_about_x(cloud)
        m = np.asarray(cloud.means)
        np.testing.assert_allclose(np.asarray(out.means), m * [1, -1, -1], atol=1e-6)
