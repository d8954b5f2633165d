"""Takikawa (NGLOD-style) feature-octree encoding.

Counterpart of the reference's takikawa_encoding.cuh (SURVEY.md §2.4,
configs/sdf/takikawa.json): features live at the vertices of occupied
octree nodes; a query point gathers+trilerps the 8 vertex features of
its containing node at every level in [start_level, depth] and
concatenates per-level features.

TPU recast: per level, a dense (res+1)³ → slot int32 vertex-index map
(−1 for vertices of unoccupied space) lives in HBM; lookups are the
same gather+trilerp machinery as the hash grid with the map providing
the indirection, and out-of-octree queries contribute zeros. Gradients
reach the vertex tables through the gathers (autodiff scatter-add).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.octree import TriangleOctree


@dataclasses.dataclass(frozen=True)
class TakikawaLevel:
    level: int
    resolution: int
    n_vertices: int
    offset: int  # into the flat vertex-feature table


class TakikawaEncoding:
    """Built from a TriangleOctree; not a frozen dataclass because it
    owns device-resident index maps."""

    n_dims_to_encode = 3

    def __init__(self, octree: TriangleOctree, n_features_per_level: int = 4,
                 start_level: int = 2):
        self.octree = octree
        self.F = n_features_per_level
        self.start_level = start_level
        self.levels: list[TakikawaLevel] = []
        self.vertex_maps: list[jax.Array] = []  # per level (res+1)³ int32 slots

        offset = 0
        for l in range(start_level, octree.depth + 1):
            res = 1 << l
            occ = octree.levels[l]
            # vertices of occupied cells: mark the 8 corners of each cell
            vmask = np.zeros((res + 1, res + 1, res + 1), bool)
            cells = np.argwhere(occ)
            for dx, dy, dz in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                               (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]:
                vmask[cells[:, 0] + dx, cells[:, 1] + dy, cells[:, 2] + dz] = True
            n_v = int(vmask.sum())
            vmap = np.full(vmask.shape, -1, np.int32)
            vmap[vmask] = np.arange(n_v, dtype=np.int32) + offset
            self.levels.append(TakikawaLevel(l, res, n_v, offset))
            self.vertex_maps.append(jnp.asarray(vmap.reshape(-1)))
            offset += n_v
        self.n_entries = offset

    @property
    def n_params(self) -> int:
        return self.n_entries * self.F

    @property
    def n_output_dims(self) -> int:
        return len(self.levels) * self.F

    def init(self, key: jax.Array) -> jax.Array:
        return jax.random.uniform(key, (self.n_entries, self.F), jnp.float32, -1e-4, 1e-4)

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        N = x.shape[0]
        xs = [x[:, d] for d in range(3)]
        outs = []
        for lv, vmap in zip(self.levels, self.vertex_maps):
            res = lv.resolution
            pos = [jnp.clip(xd, 0.0, 1.0 - 1e-6) * res for xd in xs]
            floor = [jnp.floor(p) for p in pos]
            frac = [p - f for p, f in zip(pos, floor)]
            grid = [f.astype(jnp.int32) for f in floor]
            side = res + 1
            acc = None
            for c in range(8):
                bits = [(c >> d) & 1 for d in range(3)]
                vx = grid[0] + bits[0]
                vy = grid[1] + bits[1]
                vz = grid[2] + bits[2]
                flat = (vx * side + vy) * side + vz
                slot = jnp.take(vmap, flat)
                valid = slot >= 0
                feats = jnp.take(params, jnp.maximum(slot, 0), axis=0)
                w = None
                for d in range(3):
                    wd = frac[d] if bits[d] else (1.0 - frac[d])
                    w = wd if w is None else w * wd
                w = jnp.where(valid, w, 0.0)
                term = feats * w[:, None].astype(params.dtype)
                acc = term if acc is None else acc + term
            outs.append(acc)
        out = jnp.concatenate(outs, axis=-1)
        return out.astype(compute_dtype)
