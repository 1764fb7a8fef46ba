"""Mesh export tests: marching tetrahedra on an analytic field, splat-to-mesh
end to end, and the glb/obj/ply writers (the nerfacto mesh-export capability,
main.py:1388-1468 + obj_to_glb :230-246)."""

import json
import struct

import numpy as np

from tpu_splat.export.mesh import (
    export_mesh_artifacts,
    extract_mesh,
    marching_tetrahedra,
    save_mesh_glb,
)


def test_marching_tetrahedra_sphere():
    """Iso-surface of an analytic radial field is a sphere of the right radius."""
    r = 48
    ax = np.arange(r) - r / 2
    x, y, z = np.meshgrid(ax, ax, ax, indexing="ij")
    dist = np.sqrt(x**2 + y**2 + z**2)
    density = np.clip(20.0 - dist, 0, None)  # iso at 8 -> radius 12
    verts, faces = marching_tetrahedra(density, iso=8.0)
    assert len(verts) > 500 and len(faces) > 1000
    rad = np.linalg.norm(verts - r / 2, axis=1)
    assert abs(np.median(rad) - 12.0) < 0.5
    assert rad.std() < 0.5
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
    # consistent outward orientation: normals point away from the center
    tri = verts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = np.sum(nrm * (tri.mean(axis=1) - r / 2), axis=1)
    assert (outward > 0).mean() > 0.98


def _sphere_cloud(n=4000, radius=1.0, seed=0):
    import jax.numpy as jnp

    from tpu_splat.core.types import GaussianCloud

    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    means = dirs * radius
    return GaussianCloud(
        means=jnp.asarray(means, jnp.float32),
        scales=jnp.full((n, 3), np.log(0.05), jnp.float32),
        quats=jnp.asarray(
            np.concatenate([np.ones((n, 1)), np.zeros((n, 3))], 1), jnp.float32
        ),
        opacities=jnp.full((n,), 3.0, jnp.float32),
        sh0=jnp.asarray(np.tile([[1.0, -0.5, 0.0]], (n, 1)), jnp.float32),
        shN=jnp.zeros((n, 0, 3), jnp.float32),
    )


def test_extract_mesh_from_splats():
    cloud = _sphere_cloud()
    verts, faces, colors = extract_mesh(cloud, resolution=64)
    assert len(verts) > 200 and len(faces) > 400
    rad = np.linalg.norm(verts, axis=1)
    # the shell of splats at radius 1 produces a surface near radius 1
    assert 0.7 < np.median(rad) < 1.3
    assert colors.shape == (len(verts), 3)
    # color from sh0 [1, -0.5, 0] -> rgb (0.78, 0.36, 0.50): r > b > g
    assert colors[:, 0].mean() > colors[:, 2].mean() > colors[:, 1].mean()


def test_mesh_writers(tmp_path):
    cloud = _sphere_cloud(n=1500)
    arts = export_mesh_artifacts(cloud, str(tmp_path), resolution=48)
    assert arts["n_faces"] > 100

    # glb: valid binary glTF container, parseable JSON chunk, sane accessors
    with open(arts["mesh_glb"], "rb") as f:
        data = f.read()
    magic, version, total = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    js_len, js_type = struct.unpack_from("<II", data, 12)
    assert js_type == 0x4E4F534A
    gltf = json.loads(data[20:20 + js_len])
    assert gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"] == 0
    assert gltf["accessors"][0]["count"] == arts["n_vertices"]
    assert gltf["accessors"][2]["count"] == arts["n_faces"] * 3

    # obj: v lines with colors + f lines
    with open(arts["mesh_obj"]) as f:
        obj = f.read()
    assert obj.count("\nf ") + obj.startswith("f ") == arts["n_faces"]
    first_v = obj.splitlines()[0].split()
    assert first_v[0] == "v" and len(first_v) == 7

    # ply: header + counts
    with open(arts["mesh_ply"]) as f:
        ply = f.read()
    assert f"element vertex {arts['n_vertices']}" in ply
    assert f"element face {arts['n_faces']}" in ply


def test_runner_mesh_component(tmp_path):
    """model=nerfacto registers Mesh-Export and ships the mesh artifacts."""
    from tpu_splat.core.config import job_config_from_json
    from tpu_splat.pipeline.component import PipelineContext
    from tpu_splat.pipeline.runner import _export_mesh

    cfg = job_config_from_json(
        {"uuid": "m1", "inputPath": "x", "training": {"model": "nerfacto"}}
    )
    assert cfg.training.model == "nerfacto"
    from tpu_splat.gs.trainer import TrainConfig

    TrainConfig.for_model("nerfacto")  # accepted, maps to the base config

    ctx = PipelineContext(cfg=cfg, out_dir=str(tmp_path))
    ctx["splat"] = _sphere_cloud(n=1500)
    _export_mesh(ctx)
    arts = ctx["artifacts"]
    import os

    for key in ("mesh_ply", "mesh_obj", "mesh_glb"):
        assert os.path.exists(arts[key]), key
