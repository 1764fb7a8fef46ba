"""Job-JSON schema parity tests."""

import pytest

from tpu_splat.core.config import JobConfig, job_config_from_json, job_config_to_json
from tpu_splat.core.errors import PipelineError


REFERENCE_JOB = {
    "uuid": "11111111-2222-3333-4444-555555555555",
    "instanceType": "ml.g5.4xlarge",
    "logVerbosity": "info",
    "s3": {
        "bucketName": "my-bucket",
        "inputPrefix": "workflow-input",
        "inputKey": "capture.mp4",
        "outputPrefix": "workflow-output",
    },
    "videoProcessing": {"maxNumImages": 150},
    "imageProcessing": {"filterBlurryImages": "true"},
    "sfm": {
        "enable": "true",
        "softwareName": "glomap",
        "enableEnhancedFeatureExtraction": "false",
        "matchingMethod": "sequential",
        "posePriors": {
            "usePosePriorColmapModelFiles": "false",
            "usePosePriorTransformJson": {
                "enable": "false",
                "sourceCoordinateName": "arkit",
                "poseIsWorldToCam": "true",
            },
        },
    },
    "training": {
        "enable": "true",
        "maxSteps": 5000,
        "model": "splatfacto",
        "enableMultiGpu": "false",
        "rotateSplat": "true",
    },
    "sphericalCamera": {
        "enable": "false",
        "cubeFacesToRemove": "",
        "optimizeSequentialFrameOrder": "true",
    },
    "segmentation": {
        "removeBackground": "false",
        "backgroundRemovalModel": "u2net",
        "maskThreshold": 0.6,
        "removeHumanSubject": "false",
    },
}


def test_parse_reference_job_json():
    cfg = job_config_from_json(REFERENCE_JOB)
    assert cfg.uuid == REFERENCE_JOB["uuid"]
    assert cfg.video_processing.max_num_images == 150
    assert cfg.image_processing.filter_blurry_images is True
    assert cfg.sfm.matching_method == "sequential"
    assert cfg.sfm.enable_enhanced_feature_extraction is False
    assert cfg.training.max_steps == 5000
    assert cfg.s3.bucket_name == "my-bucket"
    assert cfg.segmentation.mask_threshold == 0.6


def test_roundtrip_json():
    cfg = job_config_from_json(REFERENCE_JOB)
    again = job_config_from_json(job_config_to_json(cfg))
    assert again == cfg


def test_mutually_exclusive_pose_priors():
    bad = dict(REFERENCE_JOB)
    bad["sfm"] = {
        "posePriors": {
            "usePosePriorColmapModelFiles": True,
            "usePosePriorTransformJson": {"enable": True},
        }
    }
    with pytest.raises(PipelineError) as ei:
        job_config_from_json(bad)
    assert ei.value.code == 715


def test_unknown_model_rejected():
    bad = dict(REFERENCE_JOB)
    bad["training"] = {"model": "does-not-exist"}
    with pytest.raises(PipelineError) as ei:
        job_config_from_json(bad)
    assert ei.value.code == 765


def test_defaults_match_reference_config_json():
    cfg = JobConfig()
    assert cfg.video_processing.max_num_images == 300
    assert cfg.training.max_steps == 30000
    assert cfg.training.model == "splatfacto"
    assert cfg.sfm.matching_method == "sequential"
    assert cfg.segmentation.mask_threshold == 0.6
    assert cfg.sfm.exhaustive_matching_max_images == 20
