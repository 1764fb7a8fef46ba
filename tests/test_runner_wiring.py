"""Job-runner wiring tests: every accepted job-JSON flag must be honored.

Covers the paths the reference driver dispatches conditionally
(main.py:663-704 pose priors, :912-941 human-subject removal, :1155-1197
undistortion, :1317-1347 multi-GPU) — each exercised end to end through
run_job or at the train_splat/component level."""

import json
import os
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_sfm_e2e import make_textured_scene, ring_cameras
from tpu_splat.core.config import job_config_from_json
from tpu_splat.core.types import Cameras, SfMScene
from tpu_splat.gs.render import render_cloud

W = H = 128
FX = 115.0
N_VIEWS = 12


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Rendered synthetic capture: frames on disk + ground-truth poses."""
    import cv2

    rng = np.random.default_rng(3)
    cloud = make_textured_scene(rng, n_gauss=2500)
    viewmats = ring_cameras(n_views=N_VIEWS, radius=4.0)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((N_VIEWS,), FX), fy=jnp.full((N_VIEWS,), FX),
        cx=jnp.full((N_VIEWS,), W / 2), cy=jnp.full((N_VIEWS,), H / 2),
        distortion=jnp.zeros((N_VIEWS, 4)), width=W, height=H,
    )
    images = np.stack([
        np.asarray(render_cloud(cloud, cams, i, background=jnp.full(3, 0.7),
                                max_per_tile=256).color)
        for i in range(N_VIEWS)
    ])
    root = tmp_path_factory.mktemp("capture")
    img_dir = root / "frames"
    img_dir.mkdir()
    for i, img in enumerate(images):
        cv2.imwrite(str(img_dir / f"frame_{i:04d}.png"),
                    (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8))
    return str(img_dir), images, viewmats


def _opencv_c2w_to_arkit(c2w: np.ndarray) -> np.ndarray:
    """Inverse of pose_priors.convert_pose for arkit (T is self-inverse)."""
    T = np.diag([1.0, -1.0, -1.0, 1.0])
    return T @ c2w @ T


def test_pose_prior_transforms_json_job(capture, tmp_path):
    """NeRFCapture-style zip (frames + transforms.json, ARKit convention)
    -> priors imported, blind SfM skipped, trains and delivers; with
    enableMultiGpu the trainer runs data-parallel on the CPU mesh."""
    img_dir, images, viewmats = capture
    frames = []
    for i in range(N_VIEWS):
        c2w = np.linalg.inv(viewmats[i]).astype(np.float64)
        frames.append({
            "file_path": f"images/frame_{i:04d}.png",
            "transform_matrix": _opencv_c2w_to_arkit(c2w).tolist(),
        })
    transforms = {"fl_x": FX, "fl_y": FX, "cx": W / 2, "cy": H / 2,
                  "w": W, "h": H, "frames": frames}
    zip_path = tmp_path / "nerfcapture.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for i in range(N_VIEWS):
            zf.write(os.path.join(img_dir, f"frame_{i:04d}.png"),
                     f"images/frame_{i:04d}.png")
        zf.writestr("transforms.json", json.dumps(transforms))

    out_dir = tmp_path / "out"
    cfg = job_config_from_json({
        "uuid": "pose-prior-test",
        "inputPath": str(zip_path),
        "outputPath": str(out_dir),
        "imageProcessing": {"filterBlurryImages": False},
        "sfm": {
            "enable": True,
            "posePriors": {
                "usePosePriorTransformJson": {
                    "enable": True,
                    "sourceCoordinateName": "arkit",
                    "poseIsWorldToCam": False,
                },
            },
        },
        "training": {"enable": True, "maxSteps": 60, "enableMultiGpu": True,
                     "rotateSplat": True},
    })
    from tpu_splat.pipeline.runner import run_job

    result = run_job(cfg)
    assert result.status == "Complete"
    assert "ply" in result.artifacts and "spz" in result.artifacts
    assert os.path.exists(result.artifacts["spz"])
    # priors registered every frame (blind SfM on 12 tiny views would not)
    assert result.timings.get("Process-Pose-Priors", 0) >= 0
    assert "Image-Undistorter" in result.timings
    assert result.metrics["num_gaussians"] > 100


def test_pose_prior_colmap_model_job(capture, tmp_path):
    """Zip carrying a COLMAP text model (sparse/0) -> poses read from the
    model, fixed-pose triangulation, training completes."""
    img_dir, images, viewmats = capture
    from tpu_splat.sfm.colmap_io import write_colmap_model

    n = N_VIEWS
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n,), FX), fy=jnp.full((n,), FX),
        cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        distortion=jnp.zeros((n, 4)), width=W, height=H,
    )
    scene = SfMScene(
        cameras=cams, points=jnp.zeros((0, 3)), point_colors=jnp.zeros((0, 3)),
        point_errors=jnp.zeros((0,)), track_counts=jnp.zeros((0,), jnp.int32),
        registered=jnp.ones((n,), bool),
    )
    model_dir = tmp_path / "model"
    write_colmap_model(scene, str(model_dir),
                       image_names=[f"frame_{i:04d}.png" for i in range(n)])

    zip_path = tmp_path / "colmap_capture.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for i in range(n):
            zf.write(os.path.join(img_dir, f"frame_{i:04d}.png"),
                     f"images/frame_{i:04d}.png")
        for name in ("cameras.txt", "images.txt", "points3D.txt"):
            zf.write(str(model_dir / name), f"sparse/0/{name}")

    out_dir = tmp_path / "out"
    cfg = job_config_from_json({
        "uuid": "colmap-prior-test",
        "inputPath": str(zip_path),
        "outputPath": str(out_dir),
        "imageProcessing": {"filterBlurryImages": False},
        "sfm": {"enable": True,
                "posePriors": {"usePosePriorColmapModelFiles": True}},
        "training": {"enable": True, "maxSteps": 40},
    })
    from tpu_splat.pipeline.runner import run_job

    result = run_job(cfg)
    assert result.status == "Complete"
    assert result.metrics["num_gaussians"] > 100


def test_undistorter_runs_on_radial_model():
    """A prior model with k1 != 0 triggers the undistortion remap."""
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _undistort

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ctx = PipelineContext(cfg=None, out_dir="")
    ctx["images"] = imgs
    ctx["prior_intrin"] = (60.0, 60.0, 32.0, 32.0)
    ctx["prior_distortion"] = np.array([0.1, 0.0, 0.0, 0.0])
    _undistort(ctx)
    assert not np.allclose(ctx["images"], imgs), "undistorter was a no-op"
    assert np.all(ctx["prior_distortion"] == 0)

    # pinhole input: untouched
    ctx2 = PipelineContext(cfg=None, out_dir="")
    ctx2["images"] = imgs
    ctx2["prior_intrin"] = (60.0, 60.0, 32.0, 32.0)
    ctx2["prior_distortion"] = np.zeros(4)
    _undistort(ctx2)
    np.testing.assert_array_equal(ctx2["images"], imgs)


def test_remove_human_subject_component():
    """removeHumanSubject produces complement masks and blanks the subject."""
    from tpu_splat.core.config import JobConfig
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _remove_human_subject

    # frames with an obvious centered "person": a high-contrast blob on a
    # flat background, so the person-segmentation stack fires
    rng = np.random.default_rng(0)
    images = np.full((3, 96, 96, 3), 0.65, np.float32)
    yy, xx = np.mgrid[0:96, 0:96]
    blob = ((yy - 48) ** 2 / 900 + (xx - 48) ** 2 / 250) < 1.0
    for i in range(3):
        images[i][blob] = rng.uniform(0.0, 0.25, (blob.sum(), 3))
    ctx = PipelineContext(cfg=JobConfig(uuid="t"), out_dir="")
    ctx["images"] = images
    _remove_human_subject(ctx)
    masks = ctx["masks"]
    assert masks.shape == images.shape[:3]
    assert masks.min() >= 0 and masks.max() <= 1
    # the subject region was removed -> some pixels zeroed
    assert (masks < 0.5).mean() > 0.01
    removed = ctx["images"][masks < 0.5]
    assert np.abs(removed).max() < 1e-6


def test_remove_human_subject_external_masks(tmp_path):
    """When the capture ships a masks/ directory, removeHumanSubject applies
    it through the invert->Otsu contract instead of running detection
    (remove_object_using_mask.py:147-166 pairs mask files with frames)."""
    import cv2

    from tpu_splat.core.config import JobConfig
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _remove_human_subject

    rng = np.random.default_rng(1)
    n, h, w = 3, 64, 64
    images = rng.uniform(0.3, 1.0, (n, h, w, 3)).astype(np.float32)
    raw = tmp_path / "frames"
    raw.mkdir()
    mask_dir = tmp_path / "frames" / "masks"
    mask_dir.mkdir()
    for i in range(n):
        m = np.zeros((h, w), np.uint8)
        m[20:40, 10 + i : 30 + i] = 255  # subject square, drifting
        cv2.imwrite(str(mask_dir / f"frame_{i:04d}.png"), m)
    ctx = PipelineContext(cfg=JobConfig(uuid="t"), out_dir="")
    ctx["images"] = images
    ctx["raw_dir"] = str(raw)
    ctx["image_names"] = [f"frame_{i:04d}.png" for i in range(n)]
    _remove_human_subject(ctx)
    masks = ctx["masks"]
    assert masks.shape == (n, h, w)
    for i in range(n):
        assert masks[i, 30, 15 + i] == 0.0  # subject removed
        assert masks[i, 5, 5] == 1.0  # background kept
        assert np.abs(ctx["images"][i, 30, 15 + i]).max() == 0.0


def test_portrait_rotation_delivery(tmp_path):
    """Portrait captures (H > W frames) deliver with the extra -90° y rotation
    (reference Rotation-Pre-SPZ hook, main.py:2201-2240) so the splat stands
    upright; landscape keeps the standard x:270,y:180 + mirror chain."""
    from tpu_splat.core.config import JobConfig
    from tpu_splat.core.types import GaussianCloud
    from tpu_splat.core import spz as spz_codec
    from tpu_splat.export.transforms import mirror_splat, rotate_splat
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _export_spz

    rng = np.random.default_rng(2)
    n = 64
    cloud = GaussianCloud(
        means=jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32),
        scales=jnp.asarray(np.log(rng.uniform(0.01, 0.1, (n, 3))), jnp.float32),
        quats=jnp.concatenate(
            [jnp.ones((n, 1)), jnp.zeros((n, 3))], axis=1),
        opacities=jnp.asarray(rng.normal(size=n), jnp.float32),
        sh0=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        shN=jnp.zeros((n, 0, 3)),
    )

    def deliver(images_shape, sub):
        cfg = JobConfig(uuid="portrait-test")
        assert cfg.training.rotate_splat
        ctx = PipelineContext(cfg=cfg, out_dir=str(tmp_path / sub))
        ctx["cfg"] = cfg
        ctx["splat"] = cloud
        ctx["images"] = np.zeros(images_shape, np.float32)
        _export_spz(ctx)
        return np.asarray(spz_codec.load_spz(ctx["artifacts"]["spz"]).means)

    landscape = deliver((3, 64, 96, 3), "land")
    portrait = deliver((3, 96, 64, 3), "port")
    exp_land = mirror_splat(rotate_splat(cloud, "x:270,y:180"), "x")
    exp_port = mirror_splat(rotate_splat(cloud, "x:270,y:90"), "x")
    # SPZ quantizes to 12 fractional bits -> tolerance well above that
    np.testing.assert_allclose(landscape, np.asarray(exp_land.means), atol=2e-3)
    np.testing.assert_allclose(portrait, np.asarray(exp_port.means), atol=2e-3)
    assert np.abs(landscape - portrait).max() > 0.1


def test_train_splat_distributed(capture):
    """train_splat(distributed=True) runs on the 8-device CPU mesh and returns
    a cloud (the enableMultiGpu dispatch target)."""
    import jax

    assert len(jax.devices()) == 8
    _, images, viewmats = capture
    from tpu_splat.gs.pipeline import train_splat

    n = N_VIEWS
    rng = np.random.default_rng(0)
    cams = Cameras(
        camtoworlds=jnp.asarray(np.linalg.inv(viewmats)),
        fx=jnp.full((n,), FX), fy=jnp.full((n,), FX),
        cx=jnp.full((n,), W / 2), cy=jnp.full((n,), H / 2),
        distortion=jnp.zeros((n, 4)), width=W, height=H,
    )
    pts = rng.uniform(-1.2, 1.2, (300, 3)).astype(np.float32)
    scene = SfMScene(
        cameras=cams, points=jnp.asarray(pts),
        point_colors=jnp.asarray(rng.uniform(0, 1, (300, 3)), jnp.float32),
        point_errors=jnp.zeros((300,)), track_counts=jnp.full((300,), 3),
        registered=jnp.ones((n,), bool),
    )
    cloud, metrics = train_splat(scene, images, max_steps=48, distributed=True)
    assert cloud.num_points > 100
    assert np.isfinite(metrics["psnr"])


def test_distributed_checkpoint_roundtrip(tmp_path):
    """DistributedTrainer checkpoints save and restore (docstring promise)."""
    from tpu_splat.gs.params import init_params_from_points
    from tpu_splat.gs.strategy import DensifyConfig
    from tpu_splat.gs.trainer import TrainConfig
    from tpu_splat.mesh.trainer import DistributedTrainer

    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    params = init_params_from_points(pts, rng.uniform(0, 1, (100, 3)),
                                     capacity=256, sh_degree=0)
    viewmats = ring_cameras(n_views=4)
    intrin = np.tile([50.0, 50.0, 32.0, 32.0], (4, 1)).astype(np.float32)
    images = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    cfg = TrainConfig(max_steps=20, sh_degree=0, max_per_tile=128,
                      random_background=False,
                      densify=DensifyConfig(refine_start=10**9),
                      eval_every=10**9)
    tr = DistributedTrainer(params, images, viewmats, intrin, 2.0, cfg)
    tr.run(6)
    tr.save_checkpoint(str(tmp_path))
    saved = {k: np.asarray(v) for k, v in tr.host_params().items()}

    tr2 = DistributedTrainer(params, images, viewmats, intrin, 2.0, cfg)
    tr2.load_checkpoint(str(tmp_path))
    assert tr2.step == 6
    for k in saved:
        np.testing.assert_array_equal(np.asarray(tr2.host_params()[k]), saved[k])
    tr2.run(2)
    assert tr2.step == 8


def test_selfcal_distortion_undistorts_after_sfm():
    """A scene whose cameras carry self-calibrated k1 triggers the post-SfM
    undistortion of frames (+ masks) and zeroes the scene's distortion, so
    training always runs pinhole."""
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _undistort_selfcal

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (2, 64, 64)) > 0.5).astype(np.float32)
    n = 2
    cams = Cameras(
        camtoworlds=jnp.tile(jnp.eye(4), (n, 1, 1)),
        fx=jnp.full((n,), 60.0), fy=jnp.full((n,), 60.0),
        cx=jnp.full((n,), 32.0), cy=jnp.full((n,), 32.0),
        distortion=jnp.tile(jnp.array([[-0.12, 0.0, 0.0, 0.0]]), (n, 1)),
        width=64, height=64,
    )
    scene = SfMScene(
        cameras=cams, points=jnp.zeros((4, 3)), point_colors=jnp.zeros((4, 3)),
        point_errors=jnp.zeros(4), track_counts=jnp.ones(4),
        registered=jnp.ones(n, bool),
    )
    ctx = PipelineContext(cfg=None, out_dir="")
    ctx["scene"] = scene
    ctx["images"] = imgs
    ctx["masks"] = masks
    _undistort_selfcal(ctx)
    assert not np.allclose(ctx["images"], imgs), "frames were not undistorted"
    assert not np.allclose(ctx["masks"], masks), "masks were not undistorted"
    assert np.all(np.asarray(ctx["scene"].cameras.distortion) == 0)

    # pinhole scene: everything untouched
    ctx2 = PipelineContext(cfg=None, out_dir="")
    ctx2["scene"] = scene.replace(
        cameras=cams.replace(distortion=jnp.zeros((n, 4))))
    ctx2["images"] = imgs
    _undistort_selfcal(ctx2)
    np.testing.assert_array_equal(ctx2["images"], imgs)


def test_sfm_model_export_artifacts(tmp_path):
    """_export_sfm_model delivers the COLMAP sparse model (text+binary) and
    registers transforms.json as an artifact (reference workflow-output
    parity: colmap_to_nerfstudio_cam.py + the sparse model upload)."""
    import os

    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _export_sfm_model

    n = 3
    cams = Cameras(
        camtoworlds=jnp.tile(jnp.eye(4), (n, 1, 1)),
        fx=jnp.full((n,), 60.0), fy=jnp.full((n,), 60.0),
        cx=jnp.full((n,), 32.0), cy=jnp.full((n,), 32.0),
        distortion=jnp.zeros((n, 4)), width=64, height=64,
    )
    scene = SfMScene(
        cameras=cams, points=jnp.zeros((5, 3)), point_colors=jnp.zeros((5, 3)),
        point_errors=jnp.zeros(5), track_counts=jnp.ones(5),
        registered=jnp.ones(n, bool),
    )
    ctx = PipelineContext(cfg=None, out_dir=str(tmp_path))
    ctx["scene"] = scene
    ctx["image_names"] = [f"img_{i}.png" for i in range(n)]
    _export_sfm_model(ctx, np.ones(n, bool))
    sparse = os.path.join(tmp_path, "colmap", "sparse", "0")
    for f in ("cameras.txt", "images.txt", "points3D.txt",
              "cameras.bin", "images.bin", "points3D.bin"):
        assert os.path.exists(os.path.join(sparse, f)), f
    tj = ctx["artifacts"]["transforms_json"]
    assert os.path.exists(tj)
    import json as _json
    with open(tj) as f:
        data = _json.load(f)
    assert len(data["frames"]) == n
    assert data["frames"][0]["file_path"].endswith("img_0.png")


def test_pipeline_log_bridge_forwards_and_restores():
    """Component internals log through logging.getLogger("tpu_splat.pipeline");
    run_job must forward those records to its log_fn (or a long SfM looks
    hung — no progress line survived the default WARNING root config) and
    restore the logger state afterward."""
    import logging

    from tpu_splat.pipeline.runner import _bridge_pipeline_logs

    lg = logging.getLogger("tpu_splat.pipeline")
    before = (lg.level, lg.propagate, list(lg.handlers))
    lines = []
    with _bridge_pipeline_logs(lines.append):
        lg.info("features: 10 images")
        lg.debug("too detailed")      # below INFO: not forwarded
    lg.info("after the block")        # bridge removed: not forwarded
    assert lines == ["features: 10 images"]
    assert (lg.level, lg.propagate, list(lg.handlers)) == before
    # no-op path
    with _bridge_pipeline_logs(None):
        lg.info("nothing to catch")
    assert lines == ["features: 10 images"]
