"""Cross-compatibility tests: the C++ codec and the Python codec must agree byte-for-byte
on the packed (pre-gzip) SPZ payload, and each must read the other's files."""

import gzip
import shutil
import subprocess

import numpy as np
import pytest

from tests.test_codecs import random_cloud
from tpu_splat.core import spz
from tpu_splat.core.ply import load_ply, save_ply

native = pytest.importorskip("tpu_splat.export.native")

pytestmark = pytest.mark.skipif(shutil.which("cmake") is None, reason="no cmake")


@pytest.fixture(scope="session")
def build_dir():
    return native.build_native()


def test_cli_ply_to_spz_matches_python(rng, tmp_path, build_dir):
    cloud = random_cloud(rng, n=333, sh_degree=3)
    ply = tmp_path / "splat.ply"
    save_ply(cloud, str(ply))
    out = native.run_splat_converter(str(ply))
    assert out.exists()
    cpp_payload = gzip.decompress(out.read_bytes())
    py_payload = spz.pack_gaussians(cloud)
    assert cpp_payload == py_payload


def test_cli_spz_to_ply_roundtrip(rng, tmp_path, build_dir):
    cloud = random_cloud(rng, n=64, sh_degree=2)
    spz_path = tmp_path / "splat.spz"
    spz.save_spz(cloud, str(spz_path))
    out = native.run_splat_converter(str(spz_path))
    assert out.exists()
    back = load_ply(str(out))
    expected = spz.unpack_gaussians(spz.pack_gaussians(cloud))
    np.testing.assert_allclose(back.means, expected.means, atol=1e-6)
    np.testing.assert_allclose(back.scales, expected.scales, atol=1e-6)
    np.testing.assert_allclose(back.sh0, expected.sh0, atol=1e-6)
    np.testing.assert_allclose(back.shN, expected.shN, atol=1e-6)
    # quats: xyzw->wxyz conversion handled by codecs; compare directly
    np.testing.assert_allclose(back.quats, expected.quats, atol=1e-5)
    np.testing.assert_allclose(back.opacities, expected.opacities, atol=2e-3)


def test_c_abi_convert_spz_to_ply(rng, tmp_path, build_dir):
    cloud = random_cloud(rng, n=16, sh_degree=1)
    spz_path = tmp_path / "a.spz"
    ply_path = tmp_path / "a.ply"
    spz.save_spz(cloud, str(spz_path))
    assert native.convert_spz_to_ply(str(spz_path), str(ply_path))
    back = load_ply(str(ply_path))
    np.testing.assert_allclose(
        back.means, spz.unpack_gaussians(spz.pack_gaussians(cloud)).means, atol=1e-6
    )


def test_c_abi_convert_ply_to_spz_bytes(rng, tmp_path, build_dir):
    cloud = random_cloud(rng, n=50, sh_degree=0)
    ply_path = tmp_path / "b.ply"
    spz_path = tmp_path / "b.spz"
    save_ply(cloud, str(ply_path))
    assert native.convert_ply_to_spz(str(ply_path), str(spz_path))
    assert gzip.decompress(spz_path.read_bytes()) == spz.pack_gaussians(cloud)


def test_cli_rejects_unknown_extension(tmp_path, build_dir):
    p = tmp_path / "x.txt"
    p.write_text("hi")
    res = subprocess.run(
        [str(native.splat_converter_path()), str(p)], capture_output=True, text=True
    )
    assert res.returncode != 0
    assert "Unsupported" in res.stderr
