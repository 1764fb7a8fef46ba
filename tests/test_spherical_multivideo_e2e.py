"""End-to-end run_job wiring for BASELINE configs 4 and 5: a 360-degree ERP
capture and a multi-video property scan, each delivering a .spz.

The reference drives these through SphericaltoPerspective
(main.py:863-906 -> equirectangular_to_perspective.py:448-750) and the
multi-video merged-SfM path; here both go through the public run_job API on
captures rendered by the CPU mesh renderer (core/meshrender.py — independent
of the gaussian rasterizer). These are the slowest wiring tests in the suite
(full SfM + short training each); they guard the two job shapes no other
test drives end to end.
"""

import os

import numpy as np
import pytest

from tpu_splat.core.config import job_config_from_json
from tpu_splat.core.meshrender import (
    make_capture_scene,
    orbit_w2c,
    render_erp,
    render_mesh,
)
from tpu_splat.pipeline.runner import run_job


def test_spherical_erp_job_delivers_spz(tmp_path):
    """Synthetic ERP capture -> face expansion -> SfM -> splat -> .spz."""
    import cv2

    mesh = make_capture_scene(seed=7)
    img_dir = tmp_path / "pano"
    img_dir.mkdir()
    # camera walks an arc INSIDE the scene (360 capture regime); adjacent
    # eyes ~0.5 apart give the per-face sequences real baseline for SfM
    n = 6
    for i, ang in enumerate(np.linspace(0.2, 1.6, n)):
        eye = np.array([2.6 * np.cos(ang), -0.1, 2.6 * np.sin(ang)])
        erp = render_erp(mesh, eye, 256, 512, face_size=256)
        cv2.imwrite(str(img_dir / f"pano_{i:03d}.png"),
                    (np.clip(erp[..., ::-1], 0, 1) * 255).astype(np.uint8))

    out_dir = tmp_path / "out"
    cfg = job_config_from_json({
        "uuid": "spherical-e2e",
        "inputPath": str(img_dir),
        "outputPath": str(out_dir),
        "imageProcessing": {"filterBlurryImages": False},
        "sphericalCamera": {
            "enable": True,
            # up = featureless sky, down = nadir hole in real rigs; removing
            # them also exercises the face-removal contract
            "cubeFacesToRemove": "up,down",
            "optimizeSequentialFrameOrder": True,
        },
        "sfm": {"enable": True, "matchingMethod": "sequential"},
        "training": {"enable": True, "maxSteps": 60},
    })
    result = run_job(cfg)
    assert result.status == "Complete"
    assert "Spherical-To-Perspective" in result.timings
    assert os.path.exists(result.artifacts["spz"])
    assert result.metrics["num_gaussians"] > 100
    # the expansion must have multiplied the image count (faces x frames)
    assert result.metrics.get("num_images", 0) >= 3 * n


def test_multi_video_job_delivers_spz(tmp_path):
    """Two overlapping orbit videos -> merged SfM -> one splat -> .spz."""
    import cv2

    mesh = make_capture_scene(seed=7)
    W, H, FX = 192, 144, 175.0
    angles = np.linspace(0, 1.8 * np.pi, 22)
    frames = [
        (np.clip(render_mesh(mesh, orbit_w2c(a), FX, FX, W / 2, H / 2, W, H)
                 [..., ::-1], 0, 1) * 255).astype(np.uint8)
        for a in angles
    ]

    def write_video(path, frs):
        vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (W, H))
        assert vw.isOpened(), "mp4v VideoWriter unavailable"
        for f in frs:
            vw.write(f)
        vw.release()

    v1 = tmp_path / "scan_a.mp4"
    v2 = tmp_path / "scan_b.mp4"
    write_video(v1, frames[:13])       # first arc
    write_video(v2, frames[9:])        # overlapping continuation

    out_dir = tmp_path / "out"
    cfg = job_config_from_json({
        "uuid": "multi-video-e2e",
        "inputPath": f"{v1},{v2}",
        "outputPath": str(out_dir),
        "videoProcessing": {"maxNumImages": 24},
        "imageProcessing": {"filterBlurryImages": False},
        "sfm": {"enable": True, "matchingMethod": "exhaustive"},
        "training": {"enable": True, "maxSteps": 60},
    })
    result = run_job(cfg)
    assert result.status == "Complete"
    assert os.path.exists(result.artifacts["spz"])
    assert result.metrics["num_gaussians"] > 100
    # frames from BOTH videos must have registered into one model (each video
    # alone contributes <= 13 frames)
    assert result.metrics.get("num_registered", 0) > 13
