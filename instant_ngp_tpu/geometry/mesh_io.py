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
