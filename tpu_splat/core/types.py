"""Core data types for the TPU-native 3D reconstruction framework.

These are JAX pytrees (flax.struct dataclasses) so they can flow through jit/pjit/
shard_map directly. Conventions:

- Camera poses are camera-to-world 4x4 matrices in the COLMAP/OpenCV camera
  convention (+x right, +y down, +z forward into the scene).
- Gaussian rotations are unit quaternions in **wxyz** order (matches the INRIA .ply
  layout where the fields are rot_0=w, rot_1..3=xyz; reference layout documented at
  /root/reference .../spz/src/cc/load-spz.cc:752-838).
- Scales are stored on a log scale; opacities pre-sigmoid (logits) — matching both
  the .ply interchange format and the training parameterization.
- Spherical harmonics rest coefficients are stored coefficient-major per point:
  shN has shape (N, K, 3) where K in {0, 3, 8, 15} for degrees 0..3 and the trailing
  axis is RGB. This matches the SPZ interchange layout ([N, S, C]); the .ply layout
  ([N, C, S]) is converted at the codec boundary.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np
from flax import struct


class CameraModel(enum.Enum):
    """Supported camera models (subset of COLMAP's model zoo that the pipeline uses)."""

    SIMPLE_PINHOLE = "SIMPLE_PINHOLE"  # f, cx, cy
    PINHOLE = "PINHOLE"  # fx, fy, cx, cy
    SIMPLE_RADIAL = "SIMPLE_RADIAL"  # f, cx, cy, k1
    OPENCV = "OPENCV"  # fx, fy, cx, cy, k1, k2, p1, p2


SH_DIM_FOR_DEGREE = {0: 0, 1: 3, 2: 8, 3: 15}


def sh_degree_for_dim(dim: int) -> int:
    """Map a per-channel SH rest-coefficient count to an SH degree (load-spz.cc:47-55)."""
    if dim < 3:
        return 0
    if dim < 8:
        return 1
    if dim < 15:
        return 2
    return 3


@struct.dataclass
class Cameras:
    """A batch of cameras sharing one (width, height) image plane.

    camtoworlds: (N, 4, 4) camera-to-world, OpenCV convention.
    fx, fy, cx, cy: (N,) intrinsics in pixels.
    distortion: (N, 4) [k1, k2, p1, p2] radial/tangential coefficients (zeros = pinhole).
    """

    camtoworlds: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    distortion: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    def __len__(self) -> int:
        return self.camtoworlds.shape[0]

    @property
    def worldtocams(self) -> jnp.ndarray:
        """(N, 4, 4) world-to-camera matrices (inverse of SE(3) camtoworlds)."""
        R = self.camtoworlds[..., :3, :3]
        t = self.camtoworlds[..., :3, 3]
        Rt = jnp.swapaxes(R, -1, -2)
        t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
        w2c = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=w2c.dtype), w2c.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([w2c, bottom], axis=-2)

    def intrinsics_matrix(self) -> jnp.ndarray:
        """(N, 3, 3) pinhole K matrices."""
        n = self.fx.shape[0]
        K = jnp.zeros((n, 3, 3), dtype=self.fx.dtype)
        K = K.at[:, 0, 0].set(self.fx)
        K = K.at[:, 1, 1].set(self.fy)
        K = K.at[:, 0, 2].set(self.cx)
        K = K.at[:, 1, 2].set(self.cy)
        K = K.at[:, 2, 2].set(1.0)
        return K

    @classmethod
    def single(cls, c2w, fx, fy, cx, cy, width, height, distortion=None) -> "Cameras":
        def _a(x, shape=None):
            arr = jnp.asarray(x, dtype=jnp.float32)
            return arr.reshape(shape) if shape else arr

        if distortion is None:
            distortion = jnp.zeros((1, 4), dtype=jnp.float32)
        return cls(
            camtoworlds=_a(c2w, (1, 4, 4)),
            fx=_a([fx]),
            fy=_a([fy]),
            cx=_a([cx]),
            cy=_a([cy]),
            distortion=jnp.asarray(distortion, jnp.float32).reshape(1, 4),
            width=int(width),
            height=int(height),
        )

    def take(self, idx) -> "Cameras":
        """Select a sub-batch of cameras by index array."""
        idx = jnp.asarray(idx)
        return Cameras(
            camtoworlds=self.camtoworlds[idx],
            fx=self.fx[idx],
            fy=self.fy[idx],
            cx=self.cx[idx],
            cy=self.cy[idx],
            distortion=self.distortion[idx],
            width=self.width,
            height=self.height,
        )


@struct.dataclass
class GaussianCloud:
    """A 3D Gaussian splat model (the training state and the interchange type).

    means:     (N, 3) positions.
    scales:    (N, 3) log-scales (exp to get per-axis standard deviations).
    quats:     (N, 4) rotations, wxyz order (not necessarily normalized in training).
    opacities: (N,) pre-sigmoid alpha logits.
    sh0:       (N, 3) SH DC component (color = 0.5 + 0.282095 * sh0).
    shN:       (N, K, 3) SH rest coefficients, coefficient-major, RGB innermost.
    """

    means: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    sh0: jnp.ndarray
    shN: jnp.ndarray
    antialiased: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_points(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return sh_degree_for_dim(self.shN.shape[1])

    @classmethod
    def empty(cls, n: int = 0, sh_degree: int = 0) -> "GaussianCloud":
        k = SH_DIM_FOR_DEGREE[sh_degree]
        return cls(
            means=jnp.zeros((n, 3), jnp.float32),
            scales=jnp.zeros((n, 3), jnp.float32),
            quats=jnp.concatenate(
                [jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 3), jnp.float32)], axis=1
            ),
            opacities=jnp.zeros((n,), jnp.float32),
            sh0=jnp.zeros((n, 3), jnp.float32),
            shN=jnp.zeros((n, k, 3), jnp.float32),
        )

    def to_numpy(self) -> "GaussianCloud":
        return GaussianCloud(
            means=np.asarray(self.means),
            scales=np.asarray(self.scales),
            quats=np.asarray(self.quats),
            opacities=np.asarray(self.opacities),
            sh0=np.asarray(self.sh0),
            shN=np.asarray(self.shN),
            antialiased=self.antialiased,
        )


@struct.dataclass
class SfMScene:
    """Output of structure-from-motion: registered cameras + sparse points.

    points:       (P, 3) triangulated 3D points.
    point_colors: (P, 3) uint8-range float colors sampled from source images.
    point_errors: (P,) mean reprojection error per point (pixels).
    track_counts: (P,) number of observations per point.
    registered:   (N,) bool mask over the input image list.
    """

    cameras: Cameras
    points: jnp.ndarray
    point_colors: jnp.ndarray
    point_errors: jnp.ndarray
    track_counts: jnp.ndarray
    registered: jnp.ndarray

    @property
    def num_points(self) -> int:
        return self.points.shape[0]
