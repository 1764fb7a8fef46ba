"""360-degree capture expansion: equirectangular frames -> SfM-ready perspective
view sequence.

Functional port of the reference's ERP->perspective optimizer
(equirectangular_to_perspective.py): each ERP frame expands into cube-face
perspective views (faces can be removed, e.g. "down" to drop the tripod), with
"connective" intermediate-angle views inserted at key frames so sequential
matching can bridge between faces, and a final face-major ordering with
direction reversals (Left -> Front(reversed) -> Right -> Back(reversed) -> Up ->
Down(reversed), :127,:752-1472) that keeps consecutive outputs visually adjacent.
Operates on an in-memory image table instead of renaming files on disk.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp
import numpy as np

from tpu_splat.spherical.projections import erp_to_perspective, rotation_yaw_pitch

_FACE_YAW = {"front": 0.0, "right": 90.0, "back": 180.0, "left": -90.0}
# Horizontal connective angles between adjacent faces (the reference's
# 15/30/45/60-degree ladder, equirectangular_to_perspective.py:448-750).
_CONNECTIVE_STEPS = (15.0, 30.0, 45.0, 60.0, 75.0)


def _key_frame_indices(n: int) -> List[int]:
    """12 key positions: 0%,10%..90%, midpoint, end (the reference's node frames)."""
    fracs = [i / 10 for i in range(10)] + [0.5, 1.0]
    idx = sorted({min(int(round(f * (n - 1))), n - 1) for f in fracs})
    return idx


def expand_equirectangular_captures(
    images: np.ndarray,
    cfg,
    face_size: int = 0,
    fov_deg: float = 90.0,
) -> np.ndarray:
    """images: (N, H, W, 3) ERP frames. cfg: SphericalCameraConfig. Returns the
    expanded, sequence-ordered perspective image stack."""
    n, h, w = images.shape[:3]
    face_size = face_size or max(h // 2, 256)
    removed = {
        f.strip().lower()
        for f in (cfg.cube_faces_to_remove or "").split(",")
        if f.strip()
    }
    horiz_faces = [f for f in ("left", "front", "right", "back") if f not in removed]
    want_up = "up" not in removed
    want_down = "down" not in removed

    key_frames = set(_key_frame_indices(n))

    def render(frame_idx: int, yaw: float, pitch: float) -> np.ndarray:
        rot = jnp.asarray(rotation_yaw_pitch(yaw, pitch), jnp.float32)
        return np.asarray(
            erp_to_perspective(
                jnp.asarray(images[frame_idx]), rot, face_size, face_size, fov_deg
            )
        )

    # Per-face frame sequences (face-major ordering with reversal rules so the
    # final sequence walks each face along the capture path, alternating
    # direction to stay visually continuous at face boundaries).
    # Oval nodes (get_oval_node_paths, equirectangular_to_perspective.py:353):
    # connective views at a key frame cycle their SOURCE frame through
    # [center, prev, center, next] per angle index, adding temporal baseline
    # (an elliptical camera path) that stiffens SfM convergence. Out-of-range
    # neighbors fall back to the center frame (the reference's validate path).
    use_oval = getattr(cfg, "use_oval_nodes", False)

    def oval_source(fi: int, angle_idx: int) -> int:
        if not use_oval:
            return fi
        cycle = (fi, max(fi - 1, 0), fi, min(fi + 1, n - 1))
        return cycle[angle_idx % 4]

    sequence: List[np.ndarray] = []
    order = list(range(n))
    for i, face in enumerate(horiz_faces):
        yaw = _FACE_YAW[face]
        frames = order if i % 2 == 0 else order[::-1]
        for fi in frames:
            sequence.append(render(fi, yaw, 0.0))
            # connective views toward the next face at key frames
            if fi in key_frames and cfg.optimize_sequential_frame_order and i + 1 < len(horiz_faces):
                next_yaw = _FACE_YAW[horiz_faces[i + 1]]
                delta = ((next_yaw - yaw + 540) % 360) - 180
                for k, step in enumerate(_CONNECTIVE_STEPS[:4]):
                    sequence.append(render(
                        oval_source(fi, k), yaw + math.copysign(step, delta), 0.0
                    ))

    pitches_up = (40.0, 75.0) if getattr(cfg, "angled_up_views", False) else (75.0,)
    pitches_down = (-40.0, -75.0) if getattr(cfg, "angled_down_views", False) else (-75.0,)
    if want_up:
        for j, fi in enumerate(sorted(key_frames)):
            for p in pitches_up:
                sequence.append(render(fi, 0.0, p))
    if want_down:
        for j, fi in enumerate(sorted(key_frames, reverse=True)):
            for p in pitches_down:
                sequence.append(render(fi, 0.0, p))

    return np.stack(sequence)
