"""Triangle octree: sparse occupancy hierarchy over a mesh surface.

Counterpart of the reference's TriangleOctree (triangle_octree.cuh:
47-200): used to restrict SDF sphere tracing / sampling to the surface
neighborhood and to host the Takikawa (NGLOD) feature encoding.

TPU-native recast: instead of pointer-linked dual nodes, each level l
is a dense boolean occupancy grid of resolution 2^l (small: ≤ 2MB up
to level 7 packed as bool) plus, for Takikawa, a dense vertex-index map
(res+1)³ → feature slot. Occupancy is built on the host by uniformly
sampling the triangle soup (area-weighted) and splatting samples, then
dilating one cell — conservative enough for tracing restriction.
"""

from __future__ import annotations

import numpy as np


class TriangleOctree:
    def __init__(self, triangles: np.ndarray, depth: int = 7, samples_per_area: float = 4e6):
        """triangles: (N, 3, 3) in [0,1]³. depth: finest level (res 2^depth)."""
        self.depth = depth
        self.levels: list[np.ndarray] = []  # occupancy per level, (res,res,res) bool

        # area-weighted surface samples
        e1 = triangles[:, 1] - triangles[:, 0]
        e2 = triangles[:, 2] - triangles[:, 0]
        areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        total_area = float(areas.sum())
        n_samples = min(int(samples_per_area * max(total_area, 1e-6)), 4_000_000)
        n_samples = max(n_samples, 100_000)
        rng = np.random.default_rng(0)
        cdf = np.cumsum(areas) / max(total_area, 1e-12)
        ti = np.searchsorted(cdf, rng.random(n_samples))
        ti = np.clip(ti, 0, len(triangles) - 1)
        b1 = rng.random(n_samples)
        b2 = rng.random(n_samples)
        flip = b1 + b2 > 1
        b1 = np.where(flip, 1 - b1, b1)
        b2 = np.where(flip, 1 - b2, b2)
        t = triangles[ti]
        pts = t[:, 0] + e1[ti] * b1[:, None] + e2[ti] * b2[:, None]

        res = 1 << depth
        idx = np.clip((pts * res).astype(np.int64), 0, res - 1)
        fine = np.zeros((res, res, res), bool)
        fine[idx[:, 0], idx[:, 1], idx[:, 2]] = True
        # dilate one cell (conservative coverage of sparse sampling)
        fine = _dilate(fine)

        levels = [None] * (depth + 1)
        levels[depth] = fine
        for l in range(depth - 1, -1, -1):
            r = 1 << l
            prev = levels[l + 1]
            levels[l] = prev.reshape(r, 2, r, 2, r, 2).any(axis=(1, 3, 5))
        self.levels = levels

    def n_nodes(self, level: int) -> int:
        return int(self.levels[level].sum())

    def contains(self, points: np.ndarray, level: int | None = None) -> np.ndarray:
        level = self.depth if level is None else level
        res = 1 << level
        idx = np.clip((np.asarray(points) * res).astype(np.int64), 0, res - 1)
        return self.levels[level][idx[..., 0], idx[..., 1], idx[..., 2]]


def _dilate(grid: np.ndarray) -> np.ndarray:
    out = grid.copy()
    for axis in range(3):
        out |= np.roll(grid, 1, axis) | np.roll(grid, -1, axis)
    return out
