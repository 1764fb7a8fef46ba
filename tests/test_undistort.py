"""Undistortion tests: point-level inverse consistency and image remap sanity."""

import numpy as np
import jax.numpy as jnp

from tpu_splat.sfm.undistort import (
    distort_normalized,
    undistort_batch,
    undistort_image,
    undistort_points,
)


def test_point_inverse_consistency(rng):
    fx = fy = 400.0
    cx, cy = 320.0, 240.0
    k1 = -0.15
    # pinhole (true) points
    pts_true = np.stack([rng.uniform(100, 540, 50), rng.uniform(80, 400, 50)], 1)
    xn = (pts_true[:, 0] - cx) / fx
    yn = (pts_true[:, 1] - cy) / fy
    xd, yd = distort_normalized(jnp.asarray(xn), jnp.asarray(yn), k1)
    pts_dist = np.stack([np.asarray(xd) * fx + cx, np.asarray(yd) * fy + cy], 1)
    back = undistort_points(pts_dist, fx, fy, cx, cy, k1)
    np.testing.assert_allclose(back, pts_true, atol=0.05)


def test_image_remap_straightens(rng):
    """A vertical line distorted by k1<0 bows; undistortion restores it."""
    fx = fy = 100.0
    cx = cy = 64.0
    k1 = -0.25
    h = w = 128
    # build the DISTORTED image directly: paint pixel (u,v) white if its
    # undistorted position lies on the line x=96
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    pts = np.stack([xs.ravel(), ys.ravel()], 1)
    und = undistort_points(pts, fx, fy, cx, cy, k1)
    img = np.zeros((h, w, 1), np.float32)
    on_line = np.abs(und[:, 0] - 96.0) < 0.75
    img.ravel()[on_line] = 1.0
    out = np.asarray(undistort_image(jnp.asarray(img), fx, fy, cx, cy, k1))
    cols = out[:, :, 0].sum(axis=0)
    peak = int(np.argmax(cols))
    assert abs(peak - 96) <= 1, f"line recovered at {peak}"
    # energy concentrated in the neighboring columns
    assert cols[94:99].sum() > 0.75 * cols.sum()


def test_batch_shape(rng):
    imgs = rng.uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    out = undistort_batch(imgs, 30.0, 30.0, 16.0, 16.0, -0.1)
    assert out.shape == imgs.shape


def test_mapper_norm_coords_inverts_k1(rng):
    """mapper._norm_coords must undo SIMPLE_RADIAL distortion: distort ideal
    normalized coords forward, convert to pixels, and expect the mapper (with
    its k1 set) to hand back the ideal coords."""
    from types import SimpleNamespace

    from tpu_splat.sfm.mapper import IncrementalMapper, MapperConfig

    fx, cx, cy = 500.0, 320.0, 240.0
    m = IncrementalMapper(np.zeros((1, 480, 640), np.float32), MapperConfig(),
                          fx=fx, fy=fx, cx=cx, cy=cy)
    k1 = -0.15
    ideal = rng.uniform(-0.5, 0.5, (64, 2)).astype(np.float32)
    r2 = np.sum(ideal**2, axis=1, keepdims=True)
    distorted = ideal * (1.0 + k1 * r2)
    xy_pix = distorted * fx + np.array([cx, cy])
    m.feats = [SimpleNamespace(xy=xy_pix.astype(np.float32))]

    m.k1 = 0.0  # pinhole: plain normalization
    np.testing.assert_allclose(
        m._norm_coords(0, np.arange(64)), distorted, atol=1e-5)
    m.k1 = k1  # calibrated: inversion recovers the ideal coords
    np.testing.assert_allclose(
        m._norm_coords(0, np.arange(64)), ideal, atol=2e-4)
