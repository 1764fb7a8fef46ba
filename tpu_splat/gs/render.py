"""Full splat rendering: GaussianCloud + camera -> image.

Chains SH color decode, EWA projection, and the tile rasterizer. This is the
forward model used by training, evaluation, and the viewer export path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tpu_splat.core.types import Cameras, GaussianCloud
from tpu_splat.gs.projection import project_gaussians
from tpu_splat.gs.rasterize import RasterOutput, rasterize
from tpu_splat.gs.sh import sh_to_color


def render_view(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacity_logits: jnp.ndarray,
    sh0: jnp.ndarray,
    shN: jnp.ndarray,
    viewmat: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    sh_degree: int = 3,
    background: Optional[jnp.ndarray] = None,
    antialiased: bool = False,
    tile_size: int = 16,
    max_per_tile: int = 512,
    means2d_dummy: Optional[jnp.ndarray] = None,
    alive: Optional[jnp.ndarray] = None,
) -> RasterOutput:
    """Render one view. `means2d_dummy` (N,2 zeros) lets callers extract
    screen-space gradients for densification; `alive` masks padded slots."""
    op_sig = jax.nn.sigmoid(opacity_logits)
    # opacity-aware extents (AA compensation only shrinks opacity, so the
    # pre-compensation sigmoid is a valid conservative bound for the cutoff)
    proj = project_gaussians(
        means, log_scales, quats, viewmat, fx, fy, cx, cy, width, height,
        antialiased=antialiased, opacities=op_sig,
    )
    means2d = proj.means2d
    if means2d_dummy is not None:
        means2d = means2d + means2d_dummy

    cam_pos = -viewmat[:3, :3].T @ viewmat[:3, 3]
    dirs = means - cam_pos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    colors = sh_to_color(sh0, shN, dirs, sh_degree)

    opacities = op_sig * proj.compensations
    radii = proj.radii
    if alive is not None:
        radii = jnp.where(alive, radii, 0.0)

    return rasterize(
        means2d,
        proj.conics,
        colors,
        opacities,
        proj.depths,
        radii,
        width=width,
        height=height,
        background=background,
        tile_size=tile_size,
        max_per_tile=max_per_tile,
    )


def render_cloud(
    cloud: GaussianCloud,
    cameras: Cameras,
    cam_index: int = 0,
    sh_degree: Optional[int] = None,
    background: Optional[jnp.ndarray] = None,
    max_per_tile: int = 512,
) -> RasterOutput:
    """Convenience: render a GaussianCloud through one camera of a Cameras batch."""
    viewmat = cameras.worldtocams[cam_index]
    return render_view(
        cloud.means,
        cloud.scales,
        cloud.quats,
        cloud.opacities,
        cloud.sh0,
        cloud.shN,
        viewmat,
        float(cameras.fx[cam_index]),
        float(cameras.fy[cam_index]),
        float(cameras.cx[cam_index]),
        float(cameras.cy[cam_index]),
        cameras.width,
        cameras.height,
        sh_degree=cloud.sh_degree if sh_degree is None else sh_degree,
        background=background,
        antialiased=cloud.antialiased,
        max_per_tile=max_per_tile,
    )
