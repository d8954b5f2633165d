"""Tests for the exact 256-case marching cubes extractor
(geometry/marching_cubes.py: derived tables, welded vertices)."""

import numpy as np
import pytest

from instant_ngp_tpu.geometry.marching_cubes import (
    MC_MAX_TRIS,
    _MC_CASES,
    marching_cubes,
    marching_tetrahedra,
)


def sphere_field(res, r=0.35, c=0.5):
    xs = (np.arange(res) + 0.5) / res
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt((gx - c) ** 2 + (gy - c) ** 2 + (gz - c) ** 2) - r


def edge_use_counts(faces):
    """Map undirected edge → (count, directed balance)."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    lo = np.minimum(e[:, 0], e[:, 1]).astype(np.int64)
    hi = np.maximum(e[:, 0], e[:, 1]).astype(np.int64)
    key = lo * (faces.max() + 1) + hi
    sign = np.where(e[:, 0] < e[:, 1], 1, -1)
    counts = {}
    balance = {}
    for k, s in zip(key, sign):
        counts[k] = counts.get(k, 0) + 1
        balance[k] = balance.get(k, 0) + s
    return counts, balance


class TestDerivedTables:
    def test_case_structure(self):
        assert len(_MC_CASES) == 256
        assert _MC_CASES[0] == [] and _MC_CASES[255] == []
        # single-corner cases: 1 triangle
        for i in range(8):
            assert len(_MC_CASES[1 << i]) == 1
            assert len(_MC_CASES[255 ^ (1 << i)]) == 1
        # opposite single corners: complementary configs triangle counts
        assert MC_MAX_TRIS <= 6  # classic MC ≤ 5; isolate-rule ≤ 6

    def test_all_two_cell_stitches_are_crack_free(self):
        """Random 2×1×1-cell fields: the shared face must produce
        identical segment topology from both cells — the welded mesh of
        any 3×2×2 grid whose boundary is all-outside is closed."""
        rng = np.random.default_rng(7)
        for _ in range(300):
            # all-outside boundary, random INTERIOR corner signs: the
            # surface cannot exit the grid, so any open edge is a crack
            vals = np.full((5, 4, 4), 1.0)
            vals[1:4, 1:3, 1:3] = rng.choice([-1.0, 1.0], size=(3, 2, 2))
            verts, faces = marching_cubes(vals, 0.0)
            if len(faces) == 0:
                continue
            counts, balance = edge_use_counts(faces)
            assert all(c == 2 for c in counts.values()), "open edge"
            assert all(b == 0 for b in balance.values()), "inconsistent winding"

    def test_random_fields_closed_and_oriented(self):
        rng = np.random.default_rng(3)
        for _ in range(20):
            vals = np.full((6, 6, 6), 1.0)
            vals[1:-1, 1:-1, 1:-1] = rng.normal(size=(4, 4, 4))
            verts, faces = marching_cubes(vals, 0.0)
            if len(faces) == 0:
                continue
            counts, balance = edge_use_counts(faces)
            assert all(c == 2 for c in counts.values())
            assert all(b == 0 for b in balance.values())


class TestSphere:
    def test_sphere_topology_and_geometry(self):
        res = 32
        field = sphere_field(res)
        verts, faces = marching_cubes(field, 0.0)
        assert len(verts) > 500
        # closed, consistently wound
        counts, balance = edge_use_counts(faces)
        assert all(c == 2 for c in counts.values())
        assert all(b == 0 for b in balance.values())
        # Euler characteristic of a sphere: V - E + F = 2
        V, F, E = len(verts), len(faces), len(counts)
        assert V - E + F == 2
        # vertices lie on the sphere (within a cell diagonal)
        w = (verts + 0.5) / res
        r = np.linalg.norm(w - 0.5, axis=-1)
        np.testing.assert_allclose(r, 0.35, atol=2.0 / res)
        # outward orientation: signed volume ≈ +4/3 π r³
        tri = w[faces]
        vol = np.sum(np.einsum("ij,ij->i", tri[:, 0],
                               np.cross(tri[:, 1], tri[:, 2]))) / 6.0
        # divergence-theorem volume; sign > 0 ⇔ outward normals
        expect = 4.0 / 3.0 * np.pi * 0.35**3
        assert vol == pytest.approx(expect, rel=0.05)
        # surface area close to analytic
        area = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1).sum()
        assert area == pytest.approx(4.0 * np.pi * 0.35**2, rel=0.08)

    def test_matches_tets_area(self):
        """Same surface as the marching-tets stand-in (unsigned area —
        the tets extractor's winding is not globally consistent, which
        is one of the reasons exact MC replaces it)."""
        res = 24
        field = sphere_field(res)
        vc, fc = marching_cubes(field, 0.0)
        vt, ft = marching_tetrahedra(field, 0.0)

        def area(v, f):
            w = (v + 0.5) / res
            tri = w[f]
            return 0.5 * np.linalg.norm(
                np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]),
                axis=-1).sum()

        assert area(vc, fc) == pytest.approx(area(vt, ft), rel=0.05)
        # MC has fewer triangles than 6-tet marching for the same field
        assert len(fc) < len(ft)


class TestUnwrappedExport:
    def test_save_obj_unwrapped(self, tmp_path):
        from instant_ngp_tpu.geometry.mesh_io import save_obj_unwrapped

        field = sphere_field(16)
        verts, faces = marching_cubes(field, 0.0)
        colors = np.tile(np.array([[0.8, 0.3, 0.1]], np.float32),
                         (len(verts), 1))
        out = tmp_path / "mesh.obj"
        save_obj_unwrapped(out, verts, faces, colors)
        txt = out.read_text()
        assert "mtllib" in txt and "usemtl" in txt
        assert txt.count("\nvt ") == 3 * len(faces)
        assert (tmp_path / "mesh.png").exists()
        assert (tmp_path / "mesh.mtl").exists()
        # uv coords in [0,1]
        vts = np.asarray([
            [float(x) for x in line.split()[1:3]]
            for line in txt.splitlines() if line.startswith("vt ")])
        assert (vts >= 0).all() and (vts <= 1).all()
