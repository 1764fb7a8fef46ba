"""Ingest tests: blur scoring/selection, zip handling, alpha compositing."""

import io
import zipfile

import numpy as np
import pytest

from tpu_splat.core.errors import PipelineError
from tpu_splat.ingest.blur import (
    filter_blurry_images,
    laplacian_variance,
    reduce_equidistant,
    select_sharp_frames,
)
from tpu_splat.ingest.video import composite_alpha, extract_zip


def test_laplacian_variance_ranks_sharpness(rng):
    import cv2

    sharp = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    blurred = cv2.GaussianBlur(sharp, (11, 11), 3.0)
    scores = laplacian_variance(np.stack([sharp, blurred]))
    assert scores[0] > scores[1] * 5


def test_select_frames_spread(rng):
    scores = rng.uniform(0, 1, 100)
    idx = select_sharp_frames(scores, 10)
    assert len(idx) == 10
    assert np.all(np.diff(idx) > 0)
    # coverage: selections should span the sequence
    assert idx[0] < 20 and idx[-1] > 80


def test_filter_blurry_prefers_sharp(rng):
    import cv2

    base = rng.uniform(0, 1, (20, 48, 48)).astype(np.float32)
    images = base.copy()
    blurry = [3, 7, 11, 15]
    for i in blurry:
        images[i] = cv2.GaussianBlur(images[i], (9, 9), 3.0)
    selected, idx = filter_blurry_images(images, target_count=10)
    assert len(idx) == 10
    # at most one blurry frame sneaks in via the coverage phase
    assert sum(1 for i in idx if i in blurry) <= 1


def test_subject_aware_blur_beats_global_sharpness():
    """The reference's core subject-aware case (filter_blurry_images.py
    compute_laplacian_variance_u2net, :205-338): frames whose SUBJECT is sharp
    must outrank frames that are globally sharper because of a busy
    background. Full-frame scoring prefers the sharp-background frames; the
    saliency-weighted scorer must invert that."""
    import cv2

    from tpu_splat.matting.matnet import bundled_weights_path
    from tpu_splat.ingest.blur import saliency_laplacian_variance

    if bundled_weights_path() is None:
        pytest.skip("matnet weights not bundled in this build")

    r = np.random.default_rng(11)
    n, h, w = 8, 128, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    subj = (((xx - w / 2) / 24) ** 2 + ((yy - h / 2) / 30) ** 2 < 1).astype(
        np.float32)
    # high-texture layers: background texture is stronger, so full-frame
    # Laplacian is dominated by the background's focus, not the subject's
    bg_tex = r.uniform(0, 1, (h, w, 3)).astype(np.float32)
    fg_tex = (0.5 + 0.5 * np.sin(xx / 2.5)[..., None]
              * np.ones((1, 1, 3))).astype(np.float32)
    fg_tex = (0.6 * fg_tex + 0.4 * r.uniform(0, 1, (h, w, 3))).astype(
        np.float32) * np.array([1.0, 0.6, 0.3], np.float32)
    frames = np.zeros((n, h, w, 3), np.float32)
    subject_sharp = []
    for i in range(n):
        fg = fg_tex
        bg = bg_tex * 0.35  # darker background: the subject stays salient
        if i % 2 == 0:  # subject sharp, background defocused
            bg = cv2.GaussianBlur(bg, (13, 13), 4.0)
            subject_sharp.append(i)
        else:  # background razor sharp, subject defocused
            fg = cv2.GaussianBlur(fg, (13, 13), 4.0)
        frames[i] = bg * (1 - subj[..., None]) + fg * subj[..., None]

    full = laplacian_variance(frames)
    weighted = saliency_laplacian_variance(frames, decay_frames=0.0)
    # the trap: global scoring prefers the sharp-background (subject-blurred)
    # frames...
    assert np.mean(full[1::2]) > np.mean(full[0::2])
    # ...the subject-aware scorer must prefer every subject-sharp frame
    assert np.min(weighted[0::2]) > np.max(weighted[1::2]), (
        f"subject-sharp scores {weighted[0::2]} vs {weighted[1::2]}")


def test_reduce_equidistant():
    idx = np.arange(0, 100, 2)
    out = reduce_equidistant(idx, 10)
    assert len(out) == 10
    assert out[0] == 0 and out[-1] == 98


def test_extract_zip_no_images_raises(tmp_path):
    zpath = tmp_path / "bad.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("readme.txt", "hello")
    with pytest.raises(PipelineError) as ei:
        extract_zip(str(zpath), str(tmp_path / "out"))
    assert ei.value.code == 790


def test_extract_zip_images(tmp_path, rng):
    import cv2

    zpath = tmp_path / "imgs.zip"
    img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".png", img)
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("a.png", buf.tobytes())
        zf.writestr("__MACOSX/._a.png", b"junk")
        zf.writestr("notes.txt", "x")
    out = extract_zip(str(zpath), str(tmp_path / "out"))
    assert len(out) == 1 and out[0].endswith("a.png")


def test_composite_alpha():
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 2] = 200  # red channel in BGR
    img[..., 3] = 128  # half alpha
    out = composite_alpha(img)
    assert out.shape == (4, 4, 3)
    assert abs(int(out[0, 0, 2]) - 100) <= 1
