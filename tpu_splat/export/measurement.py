"""Metric-scale estimation from a tripod-height reference.

Port of the reference's estimate_scale_from_tripod.py semantics: RANSAC a ground
plane through the splat points (500 iterations, inlier threshold 0.5% of the
bbox diagonal, plane normal must have a dominant axis component >= 0.85, score =
inliers weighted by how one-sided the cameras are), measure the median camera
height above the plane, and derive meters-per-model-unit from the known tripod
height. Emits the measurement JSON with a coefficient-of-variation confidence and
robust (percentile) bounding-box dimensions.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def fit_ground_plane_ransac(
    points: np.ndarray,
    rng: np.random.Generator,
    iterations: int = 500,
    threshold_frac: float = 0.005,
    min_axis_component: float = 0.85,
    camera_centers: Optional[np.ndarray] = None,
):
    """Returns (normal, d, inlier_mask) for plane n.x + d = 0, or None."""
    n_pts = points.shape[0]
    if n_pts < 10:
        return None
    diag = float(np.linalg.norm(points.max(0) - points.min(0)))
    threshold = max(diag * threshold_frac, 1e-9)

    best = None
    best_score = -1.0
    for _ in range(iterations):
        idx = rng.choice(n_pts, 3, replace=False)
        p0, p1, p2 = points[idx]
        n = np.cross(p1 - p0, p2 - p0)
        nn = np.linalg.norm(n)
        if nn < 1e-12:
            continue
        n = n / nn
        if np.max(np.abs(n)) < min_axis_component:
            continue  # not axis-aligned enough to be a floor
        d = -n @ p0
        dist = np.abs(points @ n + d)
        inliers = dist < threshold
        score = float(inliers.sum())
        if camera_centers is not None and len(camera_centers):
            side = np.sign(camera_centers @ n + d)
            one_sidedness = abs(side.sum()) / len(side)
            score *= 0.5 + 0.5 * one_sidedness
        if score > best_score:
            best_score = score
            best = (n, d, inliers)
    return best


def estimate_scale_from_tripod(
    points: np.ndarray,
    camtoworlds: np.ndarray,
    tripod_height_m: float,
    seed: int = 0,
) -> Dict:
    """points (N,3); camtoworlds (C,4,4). Returns the measurement JSON dict."""
    rng = np.random.default_rng(seed)
    centers = camtoworlds[:, :3, 3]
    fit = fit_ground_plane_ransac(points, rng, camera_centers=centers)
    if fit is None or tripod_height_m <= 0:
        return {
            "referenceType": "tripod",
            "valid": False,
            "reason": "no ground plane found or tripod height not set",
        }
    n, d, inliers = fit
    heights = centers @ n + d
    # orient normal so cameras are above the plane
    if np.median(heights) < 0:
        n, d, heights = -n, -d, -heights
    median_height = float(np.median(heights))
    if median_height <= 1e-9:
        return {"referenceType": "tripod", "valid": False, "reason": "degenerate height"}
    scale = tripod_height_m / median_height

    cv = float(np.std(heights) / max(np.median(heights), 1e-9))
    confidence = "high" if cv < 0.05 else ("medium" if cv < 0.15 else "low")

    lo, hi = np.percentile(points, [2, 98], axis=0)
    dims = (hi - lo) * scale
    return {
        "referenceType": "tripod",
        "valid": True,
        "tripodHeightM": tripod_height_m,
        "metersPerModelUnit": float(scale),
        "confidence": confidence,
        "heightCV": cv,
        "groundPlane": {"normal": n.tolist(), "d": float(d)},
        "numPlaneInliers": int(inliers.sum()),
        "boundingBoxDimsM": {
            "x": float(dims[0]), "y": float(dims[1]), "z": float(dims[2])
        },
    }
