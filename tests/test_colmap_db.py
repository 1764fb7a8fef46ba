"""COLMAP database.db interchange (sfm/colmap_db.py).

Round-trips the SQLite schema the reference works against through COLMAP's
own binaries (main.py:950-1154) and its pose-prior DB updater
(process_pose_transforms.py:487)."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from tpu_splat.sfm.colmap_db import (images_from_pair_id,
                                     pair_id_from_images, read_database,
                                     write_database)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def test_pair_id_encoding():
    assert pair_id_from_images(1, 2) == 1 * 2147483647 + 2
    # order-independent
    assert pair_id_from_images(9, 4) == pair_id_from_images(4, 9)
    assert images_from_pair_id(pair_id_from_images(4, 9)) == (4, 9)


def test_roundtrip(tmp_path, rng):
    path = os.path.join(tmp_path, "database.db")
    n = 3
    names = [f"frame_{i:04d}.png" for i in range(n)]
    kps = [rng.uniform(0, 100, (8 + i, 2)).astype(np.float32)
           for i in range(n)]
    descs = [rng.uniform(0, 0.3, (8 + i, 128)).astype(np.float32)
             for i in range(n)]
    scales = [np.full(8 + i, 2.0, np.float32) for i in range(n)]
    orients = [np.zeros(8 + i, np.float32) for i in range(n)]
    matches = {(0, 1): np.array([[0, 1], [2, 3]], np.uint32),
               (1, 2): np.array([[4, 5]], np.uint32)}
    priors = rng.normal(0, 1, (n, 3))
    write_database(path, 64, 48, 50.0, 50.0, 32.0, 24.0, names,
                   keypoints=kps, descriptors=descs, scales=scales,
                   orientations=orients, matches=matches, verified=matches,
                   pose_priors=priors)
    db = read_database(path)
    assert db["cameras"][1]["model"] == 0  # SIMPLE_PINHOLE (fx == fy, k1 0)
    np.testing.assert_allclose(db["cameras"][1]["params"], [50.0, 32.0, 24.0])
    assert [db["images"][i + 1] for i in range(n)] == names
    for i in range(n):
        kp = db["keypoints"][i + 1]
        assert kp.shape == (8 + i, 6)
        np.testing.assert_allclose(kp[:, :2], kps[i], atol=1e-6)
        # affine = scale * R(0) = diag(scale)
        np.testing.assert_allclose(kp[:, 2], scales[i], atol=1e-6)
        np.testing.assert_allclose(kp[:, 3], 0.0, atol=1e-6)
        # descriptors: COLMAP u8 convention (x512)
        np.testing.assert_array_equal(
            db["descriptors"][i + 1],
            np.clip(descs[i] * 512.0, 0, 255).astype(np.uint8))
    for key in ("matches", "two_view"):
        assert set(db[key]) == set(matches)
        for p, idx in matches.items():
            np.testing.assert_array_equal(db[key][p], idx)
    for i in range(n):
        np.testing.assert_allclose(db["pose_priors"][i + 1], priors[i])


def test_camera_model_selection(tmp_path):
    # distortion -> SIMPLE_RADIAL; fx != fy -> PINHOLE
    p1 = os.path.join(tmp_path, "radial.db")
    write_database(p1, 64, 48, 50.0, 50.0, 32.0, 24.0, ["a.png"],
                   keypoints=[np.zeros((0, 2), np.float32)], k1=-0.1)
    db = read_database(p1)
    assert db["cameras"][1]["model"] == 2
    np.testing.assert_allclose(db["cameras"][1]["params"],
                               [50.0, 32.0, 24.0, -0.1])
    p2 = os.path.join(tmp_path, "pinhole.db")
    write_database(p2, 64, 48, 50.0, 55.0, 32.0, 24.0, ["a.png"],
                   keypoints=[np.zeros((0, 2), np.float32)])
    db = read_database(p2)
    assert db["cameras"][1]["model"] == 1
    np.testing.assert_allclose(db["cameras"][1]["params"],
                               [50.0, 55.0, 32.0, 24.0])


def test_mapper_export(tmp_path, rng):
    """IncrementalMapper.export_colmap_database writes its feature/match
    state; indices stay consistent with the unfiltered feature arrays."""
    import jax.numpy as jnp

    from tpu_splat.sfm.features import FeatureConfig
    from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig

    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    m = IncrementalMapper(imgs, MapperConfig(feature=FeatureConfig()),
                          fx=30.0, fy=30.0, cx=16.0, cy=16.0)
    k = 16
    m.feats = [
        SimpleNamespace(
            xy=jnp.asarray(rng.uniform(0, 32, (k, 2)), jnp.float32),
            scale=jnp.full((k,), 1.5),
            orientation=jnp.zeros((k,)),
            response=jnp.ones((k,)),
            descriptor=jnp.asarray(rng.uniform(0, 0.2, (k, 128)), jnp.float32),
            valid=jnp.ones((k,), bool),
        )
        for _ in range(2)
    ]
    m.pair_matches = {(0, 1): np.array([[1, 2], [5, 9]], np.uint32)}
    path = os.path.join(tmp_path, "database.db")
    m.export_colmap_database(path)
    db = read_database(path)
    assert len(db["images"]) == 2
    assert db["keypoints"][1].shape == (k, 6)
    np.testing.assert_array_equal(db["two_view"][(0, 1)],
                                  m.pair_matches[(0, 1)])
