"""Triangle-mesh IO: OBJ and STL load, OBJ/PLY save.

Replaces the reference's vendored tinyobjloader + STL reader
(tinyobj_loader_wrapper.cu, testbed_sdf.cu:1363-1447 load path) with
numpy parsing. Loading normalizes into the unit cube like the
reference's SDF setup (scale into [0,1]³ with margin).
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def load_obj(path) -> np.ndarray:
    """Parse OBJ → triangle soup (N, 3, 3) float32 (fan-triangulated)."""
    verts = []
    faces = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = tok.split("/")[0]
                    idx.append(int(i))
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(verts, np.float32)
    f_arr = np.asarray(faces, np.int64)
    f_arr = np.where(f_arr > 0, f_arr - 1, len(v) + f_arr)
    return v[f_arr]


def load_stl(path) -> np.ndarray:
    data = Path(path).read_bytes()
    if data[:5].lower() == b"solid" and b"facet" in data[:500]:
        # ASCII STL
        tris = []
        cur = []
        for line in data.decode(errors="ignore").splitlines():
            line = line.strip()
            if line.startswith("vertex"):
                parts = line.split()
                cur.append((float(parts[1]), float(parts[2]), float(parts[3])))
                if len(cur) == 3:
                    tris.append(cur)
                    cur = []
        return np.asarray(tris, np.float32)
    n = struct.unpack("<I", data[80:84])[0]
    arr = np.frombuffer(data, np.uint8, n * 50, 84).reshape(n, 50)
    tris = arr[:, 12:48].copy().view(np.float32).reshape(n, 3, 3)
    return np.ascontiguousarray(tris)


def load_mesh(path) -> np.ndarray:
    path = Path(path)
    if path.suffix.lower() == ".obj":
        tris = load_obj(path)
    elif path.suffix.lower() == ".stl":
        tris = load_stl(path)
    else:
        raise ValueError(f"unsupported mesh format {path.suffix}")
    return tris


def normalize_to_unit_cube(tris: np.ndarray, margin: float = 0.1):
    """Scale+center into [margin, 1-margin]³ (reference load_mesh
    normalization, testbed_sdf.cu:1402-1412). Returns (tris, scale,
    offset) so results can be mapped back: world = mesh*scale+offset."""
    lo = tris.reshape(-1, 3).min(0)
    hi = tris.reshape(-1, 3).max(0)
    size = (hi - lo).max()
    scale = (1.0 - 2 * margin) / size
    center = (lo + hi) / 2
    out = (tris - center) * scale + 0.5
    return out.astype(np.float32), scale, (0.5 - center * scale)


def save_obj(path, vertices: np.ndarray, faces: np.ndarray, colors=None):
    with open(path, "w") as f:
        if colors is not None:
            for v, c in zip(vertices, colors):
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for v in vertices:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")


def save_ply(path, vertices: np.ndarray, faces: np.ndarray, colors=None):
    n_v, n_f = len(vertices), len(faces)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0", f"element vertex {n_v}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green", "property uchar blue"]
        header += [f"element face {n_f}", "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            c8 = np.clip(colors * 255.0 + 0.5, 0, 255).astype(np.uint8)
            for v, c in zip(vertices.astype("<f4"), c8):
                f.write(v.tobytes() + c.tobytes())
        else:
            f.write(vertices.astype("<f4").tobytes())
        counts = np.full((n_f, 1), 3, np.uint8)
        fo = faces.astype("<i4")
        for i in range(n_f):
            f.write(counts[i].tobytes() + fo[i].tobytes())


def save_obj_unwrapped(path, vertices: np.ndarray, faces: np.ndarray,
                       colors=None, quad_res: int = 8):
    """OBJ export with a generated per-triangle UV atlas + baked
    texture (the reference's "unwrap_it" path, marching_cubes.cu:
    806-930: triangle pairs occupy (quadresy+3)×quadresy texel quads in
    a ~square grid; faces reference v/vt/vn). The texture bakes the
    mesh's vertex colors per face (the reference writes a placeholder
    hash-color texture) so downstream DCC tools see a usable material.
    """
    import imageio.v2 as imageio

    path = str(path)
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    n_tri = len(faces)
    numquads = (n_tri + 1) // 2
    numquadsx = max(int(np.sqrt(numquads) + 4) & ~3, 4)
    numquadsy = (numquads + numquadsx - 1) // numquadsx
    qy = quad_res
    qx = qy + 3
    texw, texh = qx * numquadsx, qy * numquadsy

    # per-triangle texel-space corners (reference index pattern:
    # tri 2q uses (0,0),(d,d),(0,d); tri 2q+1 uses (3,0),(3+d,0),(3+d,d))
    d = qy - 1
    uv = np.zeros((n_tri, 3, 2), np.float64)
    for i in range(n_tri):
        q = i // 2
        x0 = (q % numquadsx) * qx
        y0 = (q // numquadsx) * qy
        if i % 2 == 0:
            corners = [(x0, y0), (x0 + d, y0 + d), (x0, y0 + d)]
        else:
            corners = [(x0 + 3, y0), (x0 + 3 + d, y0), (x0 + 3 + d, y0 + d)]
        for k, (cx, cy) in enumerate(corners):
            uv[i, k] = ((cx + 0.5) / texw, 1.0 - (cy + 0.5) / texh)

    # bake vertex colors into the atlas
    tex = np.full((texh, texw, 3), 128, np.uint8)
    if colors is not None:
        colors = np.clip(np.asarray(colors, np.float32), 0.0, 1.0)
        for i in range(n_tri):
            q = i // 2
            x0 = (q % numquadsx) * qx
            y0 = (q // numquadsx) * qy
            c = (colors[faces[i]].mean(0) * 255.0 + 0.5).astype(np.uint8)
            if i % 2 == 0:
                tex[y0 : y0 + qy, x0 : x0 + qy] = c
            else:
                tex[y0 : y0 + qy, x0 + 3 : x0 + 3 + qy] = c

    base = path.rsplit(".", 1)[0]
    imageio.imwrite(base + ".png", tex)
    mtl = base + ".mtl"
    import os

    with open(mtl, "w") as f:
        f.write("newmtl ngp\nKa 1 1 1\nKd 1 1 1\n"
                f"map_Kd {os.path.basename(base)}.png\n")

    # vertex normals from area-weighted face normals
    nrm = np.zeros_like(vertices)
    tri = vertices[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for k in range(3):
        np.add.at(nrm, faces[:, k], fn)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)

    with open(path, "w") as f:
        f.write(f"mtllib {os.path.basename(mtl)}\n")
        if colors is not None:
            for v, c in zip(vertices, colors):
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f} "
                        f"{c[0]:.3f} {c[1]:.3f} {c[2]:.3f}\n")
        else:
            for v in vertices:
                f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
        for n in nrm:
            f.write(f"vn {n[0]:.5f} {n[1]:.5f} {n[2]:.5f}\n")
        for i in range(n_tri):
            for k in range(3):
                f.write(f"vt {uv[i, k, 0]:.6f} {uv[i, k, 1]:.6f}\n")
        f.write("usemtl ngp\n")
        for i, face in enumerate(faces):
            t = i * 3
            f.write(
                f"f {face[0]+1}/{t+1}/{face[0]+1} "
                f"{face[1]+1}/{t+2}/{face[1]+1} "
                f"{face[2]+1}/{t+3}/{face[2]+1}\n")
