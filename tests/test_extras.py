"""Measurement / floorplan / object-layer / matting tests on synthetic geometry."""

import json
import os

import numpy as np
import pytest

from tpu_splat.export.floorplan import extract_floorplan
from tpu_splat.export.measurement import estimate_scale_from_tripod
from tpu_splat.export.objects import extract_object_layer
from tpu_splat.matting.remove import clean_mask, remove_background_batch


def room_scene(rng, n_floor=4000, n_wall=2000):
    """A 4x3 'room': floor at y=0 plus walls, cameras at tripod height 1.5 units."""
    floor = np.stack([
        rng.uniform(0, 4, n_floor), np.zeros(n_floor) + rng.normal(0, 0.01, n_floor),
        rng.uniform(0, 3, n_floor),
    ], axis=1)
    walls = []
    for _ in range(n_wall):
        side = rng.integers(4)
        y = rng.uniform(-2.0, 0)
        if side == 0:
            walls.append([0, y, rng.uniform(0, 3)])
        elif side == 1:
            walls.append([4, y, rng.uniform(0, 3)])
        elif side == 2:
            walls.append([rng.uniform(0, 4), y, 0])
        else:
            walls.append([rng.uniform(0, 4), y, 3])
    pts = np.concatenate([floor, np.array(walls)]).astype(np.float32)
    cams = np.tile(np.eye(4, dtype=np.float32), (6, 1, 1))
    for i in range(6):
        cams[i, :3, 3] = [0.5 + 0.5 * i, -1.5, 1.5]  # 1.5 units above floor (-y up)
    return pts, cams


class TestMeasurement:
    def test_scale_recovery(self, rng):
        pts, cams = room_scene(rng)
        # tripod height 1.2 m at 1.5 model units -> 0.8 m/unit
        out = estimate_scale_from_tripod(pts, cams, tripod_height_m=1.2)
        assert out["valid"], out
        assert abs(out["metersPerModelUnit"] - 0.8) < 0.05
        assert out["confidence"] in ("high", "medium")

    def test_invalid_without_height(self, rng):
        pts, cams = room_scene(rng)
        out = estimate_scale_from_tripod(pts, cams, tripod_height_m=0.0)
        assert not out["valid"]


class TestFloorplan:
    def test_room_area(self, rng, tmp_path):
        pts, cams = room_scene(rng)
        arts = extract_floorplan(pts, scale_m_per_unit=0.8, out_dir=str(tmp_path))
        assert "floorplan_meta" in arts
        with open(arts["floorplan_meta"]) as f:
            meta = json.load(f)
        assert meta["valid"], meta
        # 4x3 units at 0.8 m/unit -> 3.2 x 2.4 m = 7.68 m^2
        assert abs(meta["areaM2"] - 7.68) < 1.8, meta
        assert os.path.exists(arts["floorplan_svg"])
        assert os.path.exists(arts["floorplan_png"])
        assert os.path.exists(arts["floorplan_geojson"])

    def test_no_plane(self, rng, tmp_path):
        pts = rng.normal(0, 1, (50, 3)).astype(np.float32)  # unstructured blob
        arts = extract_floorplan(pts, out_dir=str(tmp_path))
        assert "floorplan_meta" in arts


class TestObjectLayer:
    def test_detects_box_above_floor(self, rng, tmp_path):
        pts, cams = room_scene(rng)
        # add a 1x1-unit box 0.2-1.0 units above the floor (y negative = up)
        n_box = 1500
        box = np.stack([
            1.0 + rng.uniform(0, 1.0, n_box),
            -rng.uniform(0.2, 1.0, n_box),
            1.0 + rng.uniform(0, 1.0, n_box),
        ], axis=1).astype(np.float32)
        allpts = np.concatenate([pts, box])
        arts = extract_object_layer(allpts, scale_m_per_unit=0.8,
                                    min_object_area_m2=0.1, out_dir=str(tmp_path))
        with open(arts["objects_geojson"]) as f:
            geo = json.load(f)
        assert len(geo["features"]) >= 1
        areas = [f["properties"]["footprintAreaM2"] for f in geo["features"]]
        # box footprint: 0.8 x 0.8 m = 0.64 m^2
        assert any(abs(a - 0.64) < 0.4 for a in areas), areas


class TestMatting:
    def test_clean_mask_keeps_largest(self):
        m = np.zeros((64, 64), np.float32)
        m[10:40, 10:40] = 1.0  # big blob
        m[55:58, 55:58] = 1.0  # small noise
        out = clean_mask(m)
        assert out[20, 20] == 1.0
        assert out[56, 56] == 0.0

    def test_saliency_fallback_finds_center_object(self, rng):
        img = np.full((8, 96, 96, 3), 0.2, np.float32)
        # bright textured object at the center
        tex = rng.uniform(0.6, 1.0, (8, 32, 32, 3)).astype(np.float32)
        img[:, 32:64, 32:64] = tex
        masked, masks = remove_background_batch(img, model="u2net", threshold=0.5)
        inside = masks[:, 40:56, 40:56].mean()
        outside = masks[:, :16, :16].mean()
        assert inside > 0.5, f"inside {inside}"
        assert outside < 0.3, f"outside {outside}"

    def test_apply_mask_images_otsu_contract(self, rng):
        """External masks binarize via the reference's invert->Otsu contract
        (remove_object_using_mask.py:28-169): white marks the object to
        remove, anti-aliased gray values split at the Otsu threshold, and the
        object's core stays removed regardless of mask bit depth."""
        from tpu_splat.matting.remove import apply_mask_images

        img = rng.uniform(0.2, 1.0, (2, 48, 48, 3)).astype(np.float32)
        # 8-bit anti-aliased mask: white square (remove), soft 1px edge ramp
        m8 = np.zeros((48, 48), np.float32)
        m8[16:32, 16:32] = 255.0
        m8[15, 16:32] = m8[32, 16:32] = 140.0  # soft edge, above Otsu split
        m8[14, 16:32] = 30.0  # faint halo, below split -> kept
        # 16-bit variant of the same mask
        m16 = (m8 * 257.0).astype(np.uint16)
        masked, keeps = apply_mask_images(img, np.stack([m8, m16]))
        for k in keeps:
            assert k[20, 20] == 0.0  # object core removed
            assert k[15, 20] == 0.0  # strong AA edge removed (Otsu)
            assert k[14, 20] == 1.0  # faint halo kept
            assert k[5, 5] == 1.0  # background kept
        assert np.all(masked[0][keeps[0] == 0.0] == 0.0)
        # constant all-black mask (nothing to remove) keeps everything
        _, keep_none = apply_mask_images(img[:1], np.zeros((1, 48, 48)))
        assert keep_none.min() == 1.0

    def test_sam2_propagation_mode(self, rng):
        img = np.full((6, 64, 64, 3), 0.1, np.float32)
        img[:, 20:44, 20:44] = 0.9
        masked, masks = remove_background_batch(img, model="sam2", threshold=0.5,
                                                keyframe_every=3)
        assert masks.shape == (6, 64, 64)
        assert masks[1:, 28:36, 28:36].mean() > 0.4
