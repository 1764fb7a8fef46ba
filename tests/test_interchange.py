"""COLMAP/Nerfstudio interchange + pose-prior conversion tests."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_splat.core.types import Cameras, SfMScene
from tpu_splat.sfm.colmap_io import (
    count_points3d,
    qvec_to_rotmat,
    read_colmap_model,
    update_camera_model_to_pinhole,
    write_colmap_model,
    write_transforms_json,
)
from tpu_splat.sfm.pose_priors import (
    CONVENTIONS,
    convert_pose,
    load_transforms_json,
    normalize_poses,
)


def make_scene(rng, n_cams=4, n_pts=20):
    from tpu_splat.sfm.geometry import exp_so3

    c2w = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    for i in range(n_cams):
        c2w[i, :3, :3] = np.asarray(exp_so3(jnp.asarray([0.1 * i, 0.0, 0.05 * i])))
        c2w[i, :3, 3] = [i * 0.5, 0, -3]
    cams = Cameras(
        camtoworlds=jnp.asarray(c2w), fx=jnp.full((n_cams,), 100.0),
        fy=jnp.full((n_cams,), 100.0), cx=jnp.full((n_cams,), 64.0),
        cy=jnp.full((n_cams,), 48.0), distortion=jnp.zeros((n_cams, 4)),
        width=128, height=96,
    )
    return SfMScene(
        cameras=cams,
        points=jnp.asarray(rng.uniform(-1, 1, (n_pts, 3)), jnp.float32),
        point_colors=jnp.asarray(rng.uniform(0, 1, (n_pts, 3)), jnp.float32),
        point_errors=jnp.zeros(n_pts),
        track_counts=jnp.full((n_pts,), 3),
        registered=jnp.ones(n_cams, bool),
    )


class TestColmapIO:
    def test_model_roundtrip(self, rng, tmp_path):
        scene = make_scene(rng)
        write_colmap_model(scene, str(tmp_path))
        cameras, images, pts, cols = read_colmap_model(str(tmp_path))
        assert cameras[1]["model"] == "PINHOLE"
        assert cameras[1]["params"][0] == 100.0
        assert len(images) == 4
        np.testing.assert_allclose(pts, np.asarray(scene.points), atol=1e-5)
        # pose roundtrip: qvec/tvec reproduce w2c
        w2c = np.asarray(scene.cameras.worldtocams)
        for i, (name, im) in enumerate(sorted(images.items())):
            R = qvec_to_rotmat(im["qvec"])
            np.testing.assert_allclose(R, w2c[i, :3, :3], atol=1e-5)
            np.testing.assert_allclose(im["tvec"], w2c[i, :3, 3], atol=1e-5)

    def test_count_points3d(self, rng, tmp_path):
        scene = make_scene(rng, n_pts=33)
        write_colmap_model(scene, str(tmp_path))
        assert count_points3d(str(tmp_path)) == 33

    def test_binary_model_roundtrip(self, rng, tmp_path):
        """Binary write -> auto-detected binary read must agree with the text
        model of the same scene (the real COLMAP writes .bin by default)."""
        from tpu_splat.sfm.colmap_io import write_colmap_model_binary

        scene = make_scene(rng, n_pts=9)
        tdir, bdir = tmp_path / "text", tmp_path / "bin"
        write_colmap_model(scene, str(tdir))
        write_colmap_model_binary(scene, str(bdir))
        assert not (bdir / "cameras.txt").exists()
        ct, it_, pt, colt = read_colmap_model(str(tdir))
        cb, ib, pb, colb = read_colmap_model(str(bdir))
        assert cb[1]["model"] == ct[1]["model"] == "PINHOLE"
        np.testing.assert_allclose(cb[1]["params"], ct[1]["params"])
        assert cb[1]["width"] == ct[1]["width"]
        assert sorted(ib) == sorted(it_)
        for name in ib:
            np.testing.assert_allclose(ib[name]["qvec"], it_[name]["qvec"],
                                       atol=1e-12)
            np.testing.assert_allclose(ib[name]["tvec"], it_[name]["tvec"],
                                       atol=1e-12)
            assert ib[name]["camera_id"] == it_[name]["camera_id"]
        np.testing.assert_allclose(pb, pt, atol=1e-12)
        np.testing.assert_allclose(colb, colt)
        assert count_points3d(str(bdir)) == 9

    def test_binary_simple_pinhole_and_empty_points(self, rng, tmp_path):
        from tpu_splat.sfm.colmap_io import write_colmap_model_binary

        scene = make_scene(rng, n_pts=1)
        write_colmap_model_binary(scene, str(tmp_path),
                                  camera_model="SIMPLE_PINHOLE")
        cams, _, _, _ = read_colmap_model(str(tmp_path))
        assert cams[1]["model"] == "SIMPLE_PINHOLE"
        assert len(cams[1]["params"]) == 3
        import os as _os
        _os.remove(tmp_path / "points3D.bin")
        _, _, pts, _ = read_colmap_model(str(tmp_path))
        assert pts.shape[0] == 0
        assert count_points3d(str(tmp_path)) == 0

    def test_update_camera_model(self, tmp_path):
        p = tmp_path / "cameras.txt"
        p.write_text("# comment\n1 SIMPLE_RADIAL 640 480 500 320 240 0.05\n")
        update_camera_model_to_pinhole(str(p))
        line = [l for l in p.read_text().splitlines() if not l.startswith("#")][0]
        assert "SIMPLE_PINHOLE" in line
        assert len(line.split()) == 7  # k1 dropped

    def test_transforms_json(self, rng, tmp_path):
        scene = make_scene(rng)
        path = str(tmp_path / "transforms.json")
        data = write_transforms_json(scene, path)
        assert data["fl_x"] == 100.0
        assert len(data["frames"]) == 4
        # OpenGL convention: camera forward is -z; the OpenCV c2w forward (+z
        # column) must equal minus the OpenGL matrix's z column
        m = np.array(data["frames"][0]["transform_matrix"])
        c2w = np.asarray(scene.cameras.camtoworlds)[0]
        np.testing.assert_allclose(m[:3, 2], -c2w[:3, 2], atol=1e-6)
        np.testing.assert_allclose(m[:3, 3], c2w[:3, 3], atol=1e-6)


class TestPosePriors:
    def test_opencv_identity(self):
        m = np.eye(4)
        m[:3, 3] = [1, 2, 3]
        out = convert_pose(m, "opencv", is_world_to_cam=False)
        np.testing.assert_allclose(out, m)

    def test_world_to_cam_inversion(self):
        m = np.eye(4)
        m[:3, 3] = [0, 0, 5]
        out = convert_pose(m, "opencv", is_world_to_cam=True)
        np.testing.assert_allclose(out[:3, 3], [0, 0, -5])

    def test_arkit_axes(self):
        """ARKit camera looks down -z with +y up; converted c2w must look down +z
        in OpenCV convention with +y down."""
        out = convert_pose(np.eye(4), "arkit", is_world_to_cam=False)
        np.testing.assert_allclose(out, np.diag([1.0, -1.0, -1.0, 1.0]) @ np.eye(4) @ np.diag([1.0, -1.0, -1.0, 1.0]).T)

    def test_all_conventions_proper(self):
        for name, T in CONVENTIONS.items():
            assert abs(abs(np.linalg.det(T[:3, :3])) - 1) < 1e-12, name
            out = convert_pose(np.eye(4), name, False)
            R = out[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)

    def test_normalize_poses(self, rng):
        c2ws = np.tile(np.eye(4), (5, 1, 1))
        c2ws[:, :3, 3] = rng.uniform(50, 100, (5, 3))
        out, centroid, scale = normalize_poses(c2ws)
        centers = out[:, :3, 3]
        np.testing.assert_allclose(centers.mean(0), 0, atol=1e-9)
        assert np.max(np.abs(centers)) <= 1.0

    def test_load_transforms_json(self, tmp_path):
        data = {
            "fl_x": 500.0, "fl_y": 500.0, "cx": 320.0, "cy": 240.0,
            "w": 640, "h": 480,
            "frames": [
                {"file_path": "images/a.png",
                 "transform_matrix": np.eye(4).tolist()},
                {"file_path": "images/b.png",
                 "transform_matrix": (np.diag([1.0, 1, 1, 1])).tolist()},
            ],
        }
        p = tmp_path / "transforms-in.json"
        p.write_text(json.dumps(data))
        c2ws, intrin, names = load_transforms_json(str(p), "opencv", False)
        assert c2ws.shape == (2, 4, 4)
        assert intrin["fx"] == 500.0
        assert names == ["a.png", "b.png"]
