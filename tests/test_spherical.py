"""Spherical projection tests: ERP<->cubemap roundtrip, perspective extraction,
and the 360-capture expansion pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_splat.core.config import SphericalCameraConfig
from tpu_splat.spherical.pipeline import expand_equirectangular_captures
from tpu_splat.spherical.projections import (
    FACE_NAMES,
    cubemap_to_erp,
    dirs_to_erp_xy,
    erp_to_cubemap,
    erp_to_perspective,
    rotation_yaw_pitch,
)


def smooth_erp(rng, h=128, w=256):
    """Low-frequency random ERP image (smooth enough to roundtrip accurately)."""
    import jax

    small = rng.uniform(0, 1, (h // 16, w // 16, 3)).astype(np.float32)
    return np.asarray(jax.image.resize(jnp.asarray(small), (h, w, 3), "bilinear"))


def test_dirs_to_erp_centers():
    h, w = 100, 200
    # +z (forward) maps to image center
    x, y = dirs_to_erp_xy(jnp.asarray([[0.0, 0.0, 1.0]]), h, w)
    np.testing.assert_allclose([float(x[0]), float(y[0])], [w / 2 - 0.5, h / 2 - 0.5])
    # +y (down) maps to bottom row
    x, y = dirs_to_erp_xy(jnp.asarray([[0.0, 1.0, 0.0]]), h, w)
    np.testing.assert_allclose(float(y[0]), h - 0.5)


def test_erp_cubemap_roundtrip(rng):
    erp = smooth_erp(rng)
    faces = erp_to_cubemap(jnp.asarray(erp), 128)
    back = np.asarray(cubemap_to_erp(faces, 128, 256))
    # exclude the extreme poles where ERP sampling is degenerate; allow small
    # face-seam interpolation artifacts (<0.15% of pixels) via a loose max
    err = np.abs(back[16:-16] - erp[16:-16])
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.12, err.max()


def test_perspective_yaw_picks_correct_region(rng):
    """Paint a distinctive color at +x (yaw 90) and check the right-looking view."""
    erp = np.zeros((64, 128, 3), np.float32)
    # lon=+pi/2 -> x = (0.25+0.5)*128 = 96
    erp[:, 92:100, 0] = 1.0
    view = np.asarray(
        erp_to_perspective(jnp.asarray(erp), jnp.asarray(rotation_yaw_pitch(90, 0),
                                                         jnp.float32), 32, 32, 60.0)
    )
    assert view[16, 16, 0] > 0.9  # center of the right-looking view is red
    view_front = np.asarray(
        erp_to_perspective(jnp.asarray(erp), jnp.asarray(np.eye(3), jnp.float32),
                           32, 32, 60.0)
    )
    assert view_front[16, 16, 0] < 0.1


def test_expand_captures_shapes(rng):
    images = np.stack([smooth_erp(rng, 64, 128) for _ in range(4)])
    cfg = SphericalCameraConfig(enable=True, cube_faces_to_remove="down",
                                optimize_sequential_frame_order=True)
    out = expand_equirectangular_captures(images, cfg, face_size=32)
    # 4 horizontal faces x 4 frames + connective nodes + up views, no down views
    assert out.shape[1:] == (32, 32, 3)
    assert len(out) > 16
    cfg2 = SphericalCameraConfig(enable=True, cube_faces_to_remove="up,down",
                                 optimize_sequential_frame_order=False)
    out2 = expand_equirectangular_captures(images, cfg2, face_size=32)
    assert len(out2) == 16  # exactly 4 faces x 4 frames, no extras


def test_sequence_order_and_reversals():
    """Face-major ordering with direction reversals (the reference's
    Left -> Front(reversed) -> Right -> Back(reversed) layout,
    equirectangular_to_perspective.py:752-1472): per-frame constant-color ERPs
    let the source frame of every output view be read back from its pixels."""
    n = 4
    images = np.stack([
        np.full((32, 64, 3), (i + 1) / 10.0, np.float32) for i in range(n)
    ])
    cfg = SphericalCameraConfig(enable=True, cube_faces_to_remove="up,down",
                                optimize_sequential_frame_order=False)
    out = expand_equirectangular_captures(images, cfg, face_size=16)
    src = np.round(out[:, 8, 8, 0] * 10 - 1).astype(int)
    # 4 faces x 4 frames; odd faces walk the capture in reverse
    assert list(src) == [0, 1, 2, 3, 3, 2, 1, 0, 0, 1, 2, 3, 3, 2, 1, 0]


def test_oval_nodes_use_temporal_neighbors():
    """useOvalNodes: connective views cycle source frames center/prev/center/
    next (get_oval_node_paths, equirectangular_to_perspective.py:353-440)."""
    n = 4
    images = np.stack([
        np.full((32, 64, 3), (i + 1) / 10.0, np.float32) for i in range(n)
    ])
    base = SphericalCameraConfig(enable=True, cube_faces_to_remove="up,down",
                                 optimize_sequential_frame_order=True)
    out_plain = expand_equirectangular_captures(images, base, face_size=16)
    oval = SphericalCameraConfig(enable=True, cube_faces_to_remove="up,down",
                                 optimize_sequential_frame_order=True,
                                 use_oval_nodes=True)
    out_oval = expand_equirectangular_captures(images, oval, face_size=16)
    assert len(out_plain) == len(out_oval)
    src_plain = np.round(out_plain[:, 8, 8, 0] * 10 - 1).astype(int)
    src_oval = np.round(out_oval[:, 8, 8, 0] * 10 - 1).astype(int)
    # every frame is a key frame at n=4: after each face view come 4
    # connective views; plain sources them all from the center frame, oval
    # cycles [center, prev, center, next]
    assert list(src_plain[1:5]) == [0, 0, 0, 0]
    assert list(src_oval[1:5]) == [0, 0, 0, 1]  # prev of frame 0 clamps to 0
    # a mid-sequence key frame shows the full center/prev/center/next cycle
    i = list(src_plain).index(1)  # frame 1's face view
    assert list(src_plain[i + 1:i + 5]) == [1, 1, 1, 1]
    assert list(src_oval[i + 1:i + 5]) == [1, 0, 1, 2]
