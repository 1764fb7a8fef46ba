"""Mesh export from a trained gaussian splat: density grid -> marching
tetrahedra -> vertex-colored .ply/.obj/.glb.

The delivery-format analog of the reference's nerfacto mesh path
(main.py:1388-1468: ns-export poisson -> texture -> obj_to_glb at :230-246).
The capability is re-designed for this framework's representation: instead of
screened Poisson over a NeRF's SDF samples (an external binary there), the
trained splats themselves define an opacity-weighted density field, polygonized
by marching tetrahedra — table-free (cases derived from first principles at
import), fully vectorized numpy, no external meshing dependency.
"""

from __future__ import annotations

import json
import struct
from typing import Tuple

import numpy as np

from tpu_splat.core.types import GaussianCloud

SH_C0 = 0.282095

# 6-tetrahedra cube decomposition, all sharing the 0-6 diagonal (consistent
# orientation). Corner order: bit0=x, bit1=y, bit2=z.
_TETS = np.array([
    (0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
    (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
], np.int32)
# Corners ordered as the classic MC cube walk: the xy ring, then the +z ring.
_CORNER_OFF = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)


def _tet_case_table():
    """For each 4-bit inside-mask: list of triangles, each a triple of edges,
    each edge a (corner_a, corner_b) pair within the tetrahedron."""
    cases = []
    for mask in range(16):
        inside = [i for i in range(4) if mask >> i & 1]
        outside = [i for i in range(4) if not mask >> i & 1]
        tris = []
        if len(inside) in (1, 3):
            solo, others = (
                (inside[0], outside) if len(inside) == 1 else (outside[0], inside)
            )
            e = [(solo, o) for o in others]
            tris = [(e[0], e[1], e[2])]
        elif len(inside) == 2:
            a1, a2 = inside
            b1, b2 = outside
            e = [(a1, b1), (a1, b2), (a2, b2), (a2, b1)]
            tris = [(e[0], e[1], e[2]), (e[0], e[2], e[3])]
        cases.append(tris)
    return cases


_CASES = _tet_case_table()


def splat_density_grid(
    cloud: GaussianCloud, resolution: int = 128, pad: float = 0.05,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Opacity-weighted density + color grids from the splat cloud.

    Each splat deposits its opacity over a trilinear footprint scaled by its
    mean extent (isotropic approximation of the anisotropic gaussian — the
    grid is for meshing, not rendering). Returns (density (R,R,R),
    rgb (R,R,R,3), origin (3,), cell_size)."""
    means = np.asarray(cloud.means, np.float64)
    opac = 1.0 / (1.0 + np.exp(-np.asarray(cloud.opacities, np.float64)))
    scales = np.exp(np.asarray(cloud.scales, np.float64)).mean(axis=1)
    rgb = np.clip(0.5 + SH_C0 * np.asarray(cloud.sh0, np.float64), 0, 1)

    # robust bounds: ignore far-out floaters
    lo = np.percentile(means, 1, axis=0)
    hi = np.percentile(means, 99, axis=0)
    span = float(np.max(hi - lo))
    lo = lo - pad * span
    hi = hi + pad * span
    cell = float(np.max(hi - lo)) / (resolution - 1)
    origin = lo

    density = np.zeros((resolution,) * 3, np.float64)
    color = np.zeros((resolution,) * 3 + (3,), np.float64)

    # deposit over a (2r+1)^3 neighborhood; r from splat scale in cells
    g = (means - origin) / cell
    r_cells = np.clip(np.round(scales / cell).astype(np.int64), 0, 2)
    base = np.floor(g).astype(np.int64)
    frac = g - base
    for rr in range(3):  # group splats by footprint radius for vectorization
        sel = r_cells == rr
        if not sel.any():
            continue
        b = base[sel]
        f = frac[sel]
        w_op = opac[sel]
        col = rgb[sel]
        offs = np.arange(-rr, rr + 2)
        sig2 = max(rr, 0.6) ** 2
        for dx in offs:
            for dy in offs:
                for dz in offs:
                    d2 = ((dx - f[:, 0]) ** 2 + (dy - f[:, 1]) ** 2
                          + (dz - f[:, 2]) ** 2)
                    w = w_op * np.exp(-0.5 * d2 / sig2)
                    ix = np.clip(b[:, 0] + dx, 0, resolution - 1)
                    iy = np.clip(b[:, 1] + dy, 0, resolution - 1)
                    iz = np.clip(b[:, 2] + dz, 0, resolution - 1)
                    np.add.at(density, (ix, iy, iz), w)
                    np.add.at(color, (ix, iy, iz), w[:, None] * col)
    color = color / np.maximum(density[..., None], 1e-9)
    return density, color, origin, cell


def marching_tetrahedra(
    density: np.ndarray, iso: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Polygonize the iso-surface. Returns (verts (V,3) in grid coords,
    faces (F,3) int32), vertices deduplicated, triangles oriented with
    normals pointing toward decreasing density (outward)."""
    r = density.shape[0]
    n = r - 1
    # corner values for every cube: (n, n, n, 8)
    cx, cy, cz = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij")
    cube_base = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (C, 3)
    corner_idx = cube_base[:, None, :] + _CORNER_OFF[None, :, :]  # (C, 8, 3)
    vals = density[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]

    # keep only cubes the surface crosses
    crosses = (vals.max(axis=1) > iso) & (vals.min(axis=1) <= iso)
    cube_base = cube_base[crosses]
    corner_idx = corner_idx[crosses]
    vals = vals[crosses]
    if len(cube_base) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    tri_pts = []
    for tet in _TETS:
        tv = vals[:, tet]  # (C, 4)
        tp = corner_idx[:, tet, :].astype(np.float64)  # (C, 4, 3)
        mask = ((tv > iso) << np.arange(4)).sum(axis=1)  # (C,)
        for case in range(1, 15):
            sel = mask == case
            if not sel.any():
                continue
            v = tv[sel]
            p = tp[sel]
            for tri in _CASES[case]:
                pts = []
                for (a, b) in tri:
                    t = (iso - v[:, a]) / np.where(
                        np.abs(v[:, b] - v[:, a]) < 1e-12, 1e-12,
                        v[:, b] - v[:, a],
                    )
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    pts.append(p[:, a] * (1 - t) + p[:, b] * t)
                tri_pts.append(np.stack(pts, axis=1))  # (M, 3, 3)
    tris = np.concatenate(tri_pts, axis=0)  # (F, 3, 3)

    # orient: normal should point from inside (high density) to outside —
    # compare against the density gradient at the triangle centroid
    cen = tris.mean(axis=1)
    ci = np.clip(np.round(cen).astype(np.int64), 1, r - 2)
    grad = np.stack([
        density[ci[:, 0] + 1, ci[:, 1], ci[:, 2]]
        - density[ci[:, 0] - 1, ci[:, 1], ci[:, 2]],
        density[ci[:, 0], ci[:, 1] + 1, ci[:, 2]]
        - density[ci[:, 0], ci[:, 1] - 1, ci[:, 2]],
        density[ci[:, 0], ci[:, 1], ci[:, 2] + 1]
        - density[ci[:, 0], ci[:, 1], ci[:, 2] - 1],
    ], axis=1)
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    flip = np.sum(nrm * grad, axis=1) > 0  # normal along +gradient = inward
    tris[flip] = tris[flip][:, ::-1]

    # dedup vertices (quantized — interpolated points are shared across tets)
    flat = tris.reshape(-1, 3)
    quant = np.round(flat * 4096.0).astype(np.int64)
    _, uniq_idx, inv = np.unique(
        quant, axis=0, return_index=True, return_inverse=True
    )
    verts = flat[uniq_idx].astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts, faces[good]


def extract_mesh(
    cloud: GaussianCloud,
    resolution: int = 128,
    iso_quantile: float = 0.6,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Splat -> (verts (V,3) world coords, faces (F,3), colors (V,3) [0,1])."""
    density, color, origin, cell = splat_density_grid(cloud, resolution)
    occupied = density[density > 1e-4]
    if occupied.size == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))
    iso = float(np.quantile(occupied, iso_quantile))
    verts_g, faces = marching_tetrahedra(density, iso)
    if len(verts_g) == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32))
    vi = np.clip(np.round(verts_g).astype(np.int64), 0, resolution - 1)
    colors = color[vi[:, 0], vi[:, 1], vi[:, 2]].astype(np.float32)
    verts = (verts_g * cell + origin).astype(np.float32)
    return verts, faces, colors


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def save_mesh_ply(path: str, verts, faces, colors):
    """ASCII ply with vertex colors (the poisson_mesh.ply analog)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        c8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
        for v, c in zip(verts, c8):
            f.write(f"{v[0]:.5f} {v[1]:.5f} {v[2]:.5f} {c[0]} {c[1]} {c[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def save_mesh_obj(path: str, verts, faces, colors):
    """Wavefront obj with per-vertex colors (the common xyzrgb extension)."""
    with open(path, "w") as f:
        for v, c in zip(verts, colors):
            f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f} "
                    f"{c[0]:.4f} {c[1]:.4f} {c[2]:.4f}\n")
        for tri in faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def save_mesh_glb(path: str, verts, faces, colors, y_up: bool = True):
    """Binary glTF 2.0 with POSITION + COLOR_0 + indices (obj_to_glb analog,
    main.py:230-246 — including its -90 deg x rotation to the glTF y-up
    convention)."""
    verts = np.asarray(verts, np.float32)
    if y_up and len(verts):  # -90 deg about x: (x, y, z) -> (x, z, -y)
        verts = np.ascontiguousarray(
            np.stack([verts[:, 0], verts[:, 2], -verts[:, 1]], 1), np.float32
        )
    colors = np.asarray(colors, np.float32)
    idx = np.asarray(faces, np.uint32).reshape(-1)

    def pad4(b: bytes, fill=b"\x00") -> bytes:
        return b + fill * ((4 - len(b) % 4) % 4)

    bin_pos = verts.tobytes()
    bin_col = colors.tobytes()
    bin_idx = idx.tobytes()
    off_pos, off_col, off_idx = 0, len(bin_pos), len(bin_pos) + len(bin_col)
    binary = pad4(bin_pos + bin_col + bin_idx)

    mins = verts.min(axis=0).tolist() if len(verts) else [0, 0, 0]
    maxs = verts.max(axis=0).tolist() if len(verts) else [0, 0, 0]
    gltf = {
        "asset": {"version": "2.0", "generator": "tpu-splat"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "COLOR_0": 1},
                "indices": 2,
                "mode": 4,
            }]
        }],
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off_pos, "byteLength": len(bin_pos),
             "target": 34962},
            {"buffer": 0, "byteOffset": off_col, "byteLength": len(bin_col),
             "target": 34962},
            {"buffer": 0, "byteOffset": off_idx, "byteLength": len(bin_idx),
             "target": 34963},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts),
             "type": "VEC3", "min": mins, "max": maxs},
            {"bufferView": 1, "componentType": 5126, "count": len(colors),
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5125, "count": len(idx),
             "type": "SCALAR"},
        ],
    }
    js = pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")
    total = 12 + 8 + len(js) + 8 + len(binary)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))  # glTF magic
        f.write(struct.pack("<II", len(js), 0x4E4F534A))  # JSON chunk
        f.write(js)
        f.write(struct.pack("<II", len(binary), 0x004E4942))  # BIN chunk
        f.write(binary)


def export_mesh_artifacts(cloud: GaussianCloud, out_dir: str,
                          resolution: int = 128) -> dict:
    """Produce the reference's mesh deliverable set: poisson_mesh.ply,
    textured/mesh.obj, textured/mesh.glb."""
    import os

    verts, faces, colors = extract_mesh(cloud, resolution=resolution)
    tex_dir = os.path.join(out_dir, "textured")
    os.makedirs(tex_dir, exist_ok=True)
    ply = os.path.join(out_dir, "poisson_mesh.ply")
    obj = os.path.join(tex_dir, "mesh.obj")
    glb = os.path.join(tex_dir, "mesh.glb")
    save_mesh_ply(ply, verts, faces, colors)
    save_mesh_obj(obj, verts, faces, colors)
    save_mesh_glb(glb, verts, faces, colors)
    return {"mesh_ply": ply, "mesh_obj": obj, "mesh_glb": glb,
            "n_vertices": len(verts), "n_faces": len(faces)}
