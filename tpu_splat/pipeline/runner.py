"""Job runner: assembles and executes the full reconstruction pipeline from a
JobConfig — the main.py driver equivalent (main.py:483-2276), with the
reference's component graph mapped to in-process stages:

  resolve-input -> video-to-images | extract-archive -> filter-blurry-images
  -> [remove-background] -> [spherical-to-perspective] -> sfm (features/match/
  map/BA) -> train-stage-1 (3DGS) -> export-ply -> rotate-pre-spz ->
  mirror-pre-spz -> spz-export -> [estimate-scale -> floorplan -> object-layer]
  -> artifact-export

Quality gates mirror main.py:2031-2087 (frames >= 10 & points >= 50 for
splatfacto, >= 3/>= 3 otherwise); the delivery orientation dance mirrors
main.py:1479-1595 (the .spz is rotated x:270,y:180 + mirrored across x, while
the delivered .ply keeps the reconstruction orientation).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from tpu_splat.core.config import JobConfig
from tpu_splat.core.errors import PipelineError
from tpu_splat.core.ply import save_ply
from tpu_splat.core import spz as spz_codec
from tpu_splat.pipeline.component import ComponentType, Pipeline, PipelineContext
from tpu_splat.pipeline.sink import ArtifactSink


@dataclass
class JobResult:
    uuid: str
    status: str
    artifacts: Dict[str, str] = field(default_factory=dict)
    timings: Dict[str, float] = field(default_factory=dict)
    metrics: Dict[str, float] = field(default_factory=dict)
    error: Optional[str] = None


class JobStore:
    """Local job-state store (the DynamoDB table analog, workflow_trigger.py:179).

    One JSON file per job under <root>/jobs/."""

    def __init__(self, root: str):
        self.root = os.path.join(root, "jobs")
        os.makedirs(self.root, exist_ok=True)

    def update(self, uuid: str, **fields):
        path = os.path.join(self.root, f"{uuid}.json")
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data.update(fields)
        with open(path, "w") as f:
            json.dump(data, f, indent=2, default=str)

    def get(self, uuid: str) -> dict:
        path = os.path.join(self.root, f"{uuid}.json")
        with open(path) as f:
            return json.load(f)


def run_job(cfg: JobConfig, log_fn=None) -> JobResult:
    """Execute a reconstruction job end to end. Returns the JobResult; raises
    PipelineError with a taxonomy code on failure (after recording it)."""
    cfg.validate()
    out_dir = os.path.abspath(cfg.output_path)
    os.makedirs(out_dir, exist_ok=True)
    store = JobStore(out_dir)
    store.update(cfg.uuid, status="In-Progress", start=time.time(), config=cfg.uuid)

    pipe = Pipeline(name="3DGS-Pipeline", uuid=cfg.uuid, log_fn=log_fn)
    _register_components(pipe, cfg, out_dir)

    t0 = time.time()
    try:
        ctx = pipe.run(PipelineContext(cfg=cfg, out_dir=out_dir))
    except PipelineError as e:
        store.update(cfg.uuid, status="Error", end=time.time(),
                     elapsed=time.time() - t0, error=str(e), code=e.code)
        raise
    result = JobResult(
        uuid=cfg.uuid,
        status="Complete",
        artifacts=ctx.get("artifacts", {}),
        timings=pipe.timings(),
        metrics=ctx.get("metrics", {}),
    )
    store.update(
        cfg.uuid, status="Complete", end=time.time(), elapsed=time.time() - t0,
        artifacts=result.artifacts, metrics=result.metrics, timings=result.timings,
    )
    return result


# ---------------------------------------------------------------------------
# component registration (the conditional graph of main.py:659-1840)
# ---------------------------------------------------------------------------


def _register_components(pipe: Pipeline, cfg: JobConfig, out_dir: str):
    pipe.create_component("Resolve-Input", ComponentType.LOADER, _resolve_input, 705)
    pipe.create_component("Media-To-Images", ComponentType.LOADER, _media_to_images, 730)
    pipe.create_component(
        "Filter-Blurry-Images", ComponentType.FILTER, _filter_blurry, 795,
        enabled=cfg.image_processing.filter_blurry_images,
    )
    pipe.create_component(
        "Remove-Background", ComponentType.FILTER, _remove_background, 740,
        enabled=cfg.segmentation.remove_background,
    )
    pipe.create_component(
        "Spherical-To-Perspective", ComponentType.TRANSFORM, _spherical, 735,
        enabled=cfg.spherical_camera.enable,
    )
    pipe.create_component("SfM", ComponentType.TRANSFORM, _sfm, 755,
                          enabled=cfg.sfm.enable)
    pipe.create_component("Quality-Gate", ComponentType.FILTER, _quality_gate, 795,
                          enabled=cfg.sfm.enable and cfg.training.enable)
    pipe.create_component("Train-Stage1", ComponentType.RENDERER, _train, 770,
                          enabled=cfg.training.enable)
    pipe.create_component("Export-Splat", ComponentType.EXPORTER, _export_ply, 780,
                          enabled=cfg.training.enable)
    pipe.create_component(
        "Rotate-Mirror-SPZ-Export", ComponentType.EXPORTER, _export_spz, 783,
        enabled=cfg.training.enable,
    )
    pipe.create_component(
        "Estimate-Scale", ComponentType.EXPORTER, _estimate_scale, 795,
        enabled=cfg.measurement.reference_type != "none",
    )
    pipe.create_component(
        "Extract-Floorplan", ComponentType.EXPORTER, _floorplan, 795,
        enabled=cfg.measurement.reference_type != "none",
    )
    pipe.create_component(
        "Extract-Object-Layer", ComponentType.EXPORTER, _object_layer, 795,
        enabled=cfg.semantic.enable_object_layer,
    )
    pipe.create_component("Artifact-Export", ComponentType.EXPORTER, _artifact_export, 786)


def _resolve_input(ctx: PipelineContext):
    cfg: JobConfig = ctx["cfg"]
    path = cfg.input_path
    from tpu_splat.ingest.video import IMAGE_EXTENSIONS, VIDEO_EXTENSIONS

    # Multi-video property scans: comma-separated video list -> merged SfM.
    if "," in (path or ""):
        parts = [p.strip() for p in path.split(",") if p.strip()]
        for p in parts:
            if not os.path.exists(p):
                raise PipelineError(710, f"input not found: {p!r}")
            if os.path.splitext(p)[1].lower() not in VIDEO_EXTENSIONS:
                raise PipelineError(705, f"multi-input only supports videos: {p!r}")
        ctx["input_kind"] = "multi_video"
        ctx["input_path"] = parts
        return
    if not path or not os.path.exists(path):
        raise PipelineError(710, f"input not found: {path!r}")
    ext = os.path.splitext(path)[1].lower()
    if os.path.isdir(path):
        vids = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith(VIDEO_EXTENSIONS)
        )
        if len(vids) > 1:
            ctx["input_kind"] = "multi_video"
            ctx["input_path"] = vids
            return
        if len(vids) == 1:
            ctx["input_kind"] = "video"
            ctx["input_path"] = vids[0]
            return
        ctx["input_kind"] = "dir"
    elif ext in VIDEO_EXTENSIONS:
        ctx["input_kind"] = "video"
    elif ext == ".zip":
        ctx["input_kind"] = "zip"
    elif ext in IMAGE_EXTENSIONS:
        raise PipelineError(705, "a single image cannot be reconstructed")
    else:
        raise PipelineError(705, f"unsupported input type {ext!r}")
    ctx["input_path"] = path


def _media_to_images(ctx: PipelineContext):
    from tpu_splat.ingest.video import extract_frames, extract_zip, load_images_from_dir

    cfg: JobConfig = ctx["cfg"]
    kind = ctx["input_kind"]
    max_images = cfg.video_processing.max_num_images
    resize = 3840  # resize-to-4K rule (main.py:97-157)
    if kind == "video":
        images = extract_frames(ctx["input_path"], max_frames=max(max_images * 2, 60),
                                resize_max_dim=resize)
    elif kind == "multi_video":
        # merged SfM over several captures of the same property: frames from all
        # videos share one image set; exhaustive/retrieval matching links them
        import numpy as _np

        paths = ctx["input_path"]
        per = max(max_images * 2 // len(paths), 30)
        segs, stacks = [], []
        for p in paths:
            frames = extract_frames(p, max_frames=per, resize_max_dim=resize)
            segs.append(len(frames))
            stacks.append(frames)
        h = min(s.shape[1] for s in stacks)
        w = min(s.shape[2] for s in stacks)
        images = _np.concatenate([s[:, :h, :w] for s in stacks])
        ctx["segments"] = segs
    elif kind == "zip":
        img_dir = os.path.join(ctx["out_dir"], "images_raw")
        extract_zip(ctx["input_path"], img_dir)
        images, _ = load_images_from_dir(img_dir, resize_max_dim=resize)
    else:
        images, _ = load_images_from_dir(ctx["input_path"], resize_max_dim=resize)
    if len(images) < 3:
        raise PipelineError(705, f"need >= 3 frames, got {len(images)}")
    ctx["images"] = images


def _filter_blurry(ctx: PipelineContext):
    from tpu_splat.ingest.blur import filter_blurry_images

    cfg: JobConfig = ctx["cfg"]
    images = ctx.require("images")
    target = min(cfg.video_processing.max_num_images, len(images))
    selected, idx = filter_blurry_images(images, target_count=target)
    ctx["images"] = selected
    ctx["frame_indices"] = idx


def _remove_background(ctx: PipelineContext):
    from tpu_splat.matting.remove import remove_background_batch

    cfg: JobConfig = ctx["cfg"]
    images, masks = remove_background_batch(
        ctx.require("images"),
        model=cfg.segmentation.background_removal_model,
        threshold=cfg.segmentation.mask_threshold,
    )
    ctx["images"] = images
    ctx["masks"] = masks


def _spherical(ctx: PipelineContext):
    from tpu_splat.spherical.pipeline import expand_equirectangular_captures

    cfg: JobConfig = ctx["cfg"]
    ctx["images"] = expand_equirectangular_captures(
        ctx.require("images"), cfg.spherical_camera
    )


def _sfm(ctx: PipelineContext):
    from tpu_splat.sfm.features import FeatureConfig
    from tpu_splat.sfm.mapper import MapperConfig, run_sfm

    cfg: JobConfig = ctx["cfg"]
    images = ctx.require("images")
    mcfg = MapperConfig(
        feature=FeatureConfig(
            max_features=cfg.sfm.max_features_per_image,
            upsample_first=cfg.sfm.enable_enhanced_feature_extraction,
        ),
        matching_method=cfg.sfm.matching_method,
        exhaustive_max_images=cfg.sfm.exhaustive_matching_max_images,
    )
    try:
        if cfg.sfm.software_name in ("glomap", "global"):
            from tpu_splat.sfm.global_mapper import run_global_sfm

            scene = run_global_sfm(images, mcfg, log_fn=pipe_logger(ctx))
        else:
            scene = run_sfm(images, mcfg, log_fn=pipe_logger(ctx))
    except RuntimeError as e:
        raise PipelineError(755, str(e)) from e
    ctx["scene"] = scene
    reg = np.asarray(scene.registered)
    ctx["images"] = images[reg]
    if ctx.get("masks") is not None:
        ctx["masks"] = ctx["masks"][reg]


def _quality_gate(ctx: PipelineContext):
    """Pre-training sufficiency checks (main.py:2031-2087)."""
    cfg: JobConfig = ctx["cfg"]
    scene = ctx.require("scene")
    n_frames = int(np.asarray(scene.registered).sum())
    n_points = scene.num_points
    min_frames, min_points = (10, 50) if cfg.training.model.startswith("splatfacto") else (3, 3)
    if n_frames < min_frames:
        raise PipelineError(
            755, f"SfM failed to converge: not enough registered frames "
                 f"({n_frames} < {min_frames})"
        )
    if n_points < min_points:
        raise PipelineError(
            755, f"SfM failed to converge: not enough sparse points "
                 f"({n_points} < {min_points})"
        )


def _train(ctx: PipelineContext):
    from tpu_splat.gs.pipeline import train_splat

    cfg: JobConfig = ctx["cfg"]
    cloud, metrics = train_splat(
        ctx.require("scene"),
        ctx.require("images"),
        model=cfg.training.model,
        max_steps=cfg.training.max_steps,
        downscale_factor=cfg.training.downscale_factor,
        masks=ctx.get("masks"),
        checkpoint_dir=os.path.join(ctx["out_dir"], "checkpoints"),
        resume=True,
        log_fn=pipe_logger(ctx),
    )
    ctx["splat"] = cloud
    ctx.setdefault("metrics", {}).update(metrics)


def _export_ply(ctx: PipelineContext):
    out = os.path.join(ctx["out_dir"], "exports")
    os.makedirs(out, exist_ok=True)
    ply_path = os.path.join(out, "splat.ply")
    save_ply(ctx.require("splat"), ply_path)
    ctx.setdefault("artifacts", {})["ply"] = ply_path


def _export_spz(ctx: PipelineContext):
    """Delivery orientation dance (main.py:1479-1595): the .spz artifact is
    rotated x:270,y:180 and mirrored across x for web viewers; the .ply keeps
    reconstruction orientation."""
    from tpu_splat.export.transforms import mirror_splat, rotate_splat

    cfg: JobConfig = ctx["cfg"]
    cloud = ctx.require("splat")
    if cfg.training.rotate_splat:
        cloud = rotate_splat(cloud, "x:270,y:180")
        cloud = mirror_splat(cloud, "x")
    out = os.path.join(ctx["out_dir"], "exports")
    os.makedirs(out, exist_ok=True)
    spz_path = os.path.join(out, "splat.spz")
    spz_codec.save_spz(cloud, spz_path)
    ctx.setdefault("artifacts", {})["spz"] = spz_path


def _estimate_scale(ctx: PipelineContext):
    from tpu_splat.export.measurement import estimate_scale_from_tripod

    cfg: JobConfig = ctx["cfg"]
    scene = ctx.require("scene")
    result = estimate_scale_from_tripod(
        np.asarray(ctx.require("splat").means),
        np.asarray(scene.cameras.camtoworlds),
        tripod_height_m=cfg.measurement.tripod_height_m,
    )
    path = os.path.join(ctx["out_dir"], "exports", "measurement.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    ctx.setdefault("artifacts", {})["measurement"] = path
    ctx["scale_m_per_unit"] = result.get("metersPerModelUnit", 0.0)


def _floorplan(ctx: PipelineContext):
    from tpu_splat.export.floorplan import extract_floorplan

    out = os.path.join(ctx["out_dir"], "exports")
    arts = extract_floorplan(
        np.asarray(ctx.require("splat").means),
        scale_m_per_unit=ctx.get("scale_m_per_unit", 1.0),
        out_dir=out,
    )
    ctx.setdefault("artifacts", {}).update(arts)


def _object_layer(ctx: PipelineContext):
    from tpu_splat.export.objects import extract_object_layer

    cfg: JobConfig = ctx["cfg"]
    out = os.path.join(ctx["out_dir"], "exports")
    arts = extract_object_layer(
        np.asarray(ctx.require("splat").means),
        scale_m_per_unit=ctx.get("scale_m_per_unit", 1.0),
        min_object_area_m2=cfg.semantic.min_object_area_m2,
        out_dir=out,
    )
    ctx.setdefault("artifacts", {}).update(arts)


def _artifact_export(ctx: PipelineContext):
    """Copy artifacts to the configured sink (graceful skip of missing optional
    artifacts, main.py:2250-2266 parity)."""
    cfg: JobConfig = ctx["cfg"]
    root = cfg.s3.bucket_name or ctx["out_dir"]
    prefix = cfg.s3.output_prefix or "workflow-output"
    sink = ArtifactSink(root)
    delivered = {}
    for name, path in ctx.get("artifacts", {}).items():
        if not os.path.exists(path):
            continue  # graceful skip
        delivered[name] = sink.put(path, os.path.join(prefix, cfg.uuid,
                                                      os.path.basename(path)))
    ctx["artifacts"] = delivered


def pipe_logger(ctx: PipelineContext):
    import logging

    lg = logging.getLogger("tpu_splat.pipeline")
    return lambda s: lg.info(s)
