"""NeRF occupancy ("density") grid — TPU-native dense layout.

Behavior parity with the reference grid pipeline (testbed_nerf.cu):
  * 128³ cells × (max_cascade+1) cascades, each cascade doubling extent
    around the scene center (nerf_device.cuh:25-30, 317-329)
  * float EMA grid updated every 16 steps from density-MLP probes:
    all cells for the first 256 steps, then ¼ uniform + ¼ occupied cells
    (training_prep_nerf, testbed_nerf.cu:2476-2592)
  * update = max(prev·decay, probe) with decay 0.95; culled cells stay
    negative (ema_grid_samples_nerf :316-338)
  * bitfield threshold min(0.01, mean_density); mip chain via centered
    2× max-pool up to NERF_CASCADES levels (grid_to_bitfield :348,
    bitfield_max_pool :376)
  * mark_untrained culling of cells seen by no camera (:87-162)

TPU departures: the grid is dense [mip, x, y, z] (no Morton — Morton
order is only reconstructed when writing reference-compatible
snapshots); splat-max is a scatter-max; the mip chain is a
reduce-window; everything is one jit program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    MIN_CONE_STEPSIZE,
    NERF_CASCADES,
    NERF_GRIDSIZE,
    NERF_MIN_OPTICAL_THICKNESS,
    network_to_density,
)

G = NERF_GRIDSIZE


@dataclasses.dataclass
class OccupancyGridState:
    """Pytree of grid buffers."""

    density: jax.Array  # (n_cascades, G, G, G) float32; negative = culled
    bitfield: jax.Array  # (NERF_CASCADES, G, G, G) bool
    mean_density: jax.Array  # () float32
    ema_step: jax.Array  # () int32


jax.tree_util.register_dataclass(
    OccupancyGridState,
    data_fields=["density", "bitfield", "mean_density", "ema_step"],
    meta_fields=[],
)


def init_grid(n_cascades: int) -> OccupancyGridState:
    return OccupancyGridState(
        density=jnp.zeros((n_cascades, G, G, G), jnp.float32),
        bitfield=jnp.zeros((NERF_CASCADES, G, G, G), bool),
        mean_density=jnp.zeros((), jnp.float32),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cell_center(ix, iy, iz, mip, jitter=None):
    """Position of (jittered) cell in world [0,1]³ space for cascade mip."""
    p = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
    if jitter is not None:
        p = p + jitter
    else:
        p = p + 0.5
    scale = jnp.exp2(mip.astype(jnp.float32))[..., None]
    return (p / G - 0.5) * scale + 0.5


def occupied_at(bitfield: jax.Array, pos: jax.Array, mip: jax.Array) -> jax.Array:
    """Vectorized density_grid_occupied_at (nerf_device.cuh:331-337).
    bitfield: (NERF_CASCADES, G, G, G) bool; pos: (...,3); mip: (...)."""
    mip_scale = jnp.exp2(-mip.astype(jnp.float32))
    p = (pos - 0.5) * mip_scale[..., None] + 0.5
    i = jnp.floor(p * G).astype(jnp.int32)
    inb = jnp.all((i >= 0) & (i < G), axis=-1)
    i = jnp.clip(i, 0, G - 1)
    flat = ((mip * G + i[..., 0]) * G + i[..., 1]) * G + i[..., 2]
    vals = jnp.take(bitfield.reshape(-1), flat, axis=0)
    return vals & inb


def density_at(density_grid: jax.Array, pos: jax.Array, mip: jax.Array) -> jax.Array:
    """cascaded_grid_at (float grid), 0 outside."""
    n_casc = density_grid.shape[0]
    mip = jnp.clip(mip, 0, n_casc - 1)
    mip_scale = jnp.exp2(-mip.astype(jnp.float32))
    p = (pos - 0.5) * mip_scale[..., None] + 0.5
    i = jnp.floor(p * G).astype(jnp.int32)
    inb = jnp.all((i >= 0) & (i < G), axis=-1)
    i = jnp.clip(i, 0, G - 1)
    flat = ((mip * G + i[..., 0]) * G + i[..., 1]) * G + i[..., 2]
    vals = jnp.take(density_grid.reshape(-1), flat, axis=0)
    return jnp.where(inb, vals, 0.0)


def _bitfield_from_density(density: jax.Array, mean_density: jax.Array) -> jax.Array:
    """Threshold + centered max-pool mip chain (testbed_nerf.cu:348-397)."""
    n_casc = density.shape[0]
    thresh = jnp.minimum(NERF_MIN_OPTICAL_THICKNESS, mean_density)
    bits = density > thresh  # (n_casc, G, G, G)
    levels = []
    prev = None
    for mip in range(NERF_CASCADES):
        cur = bits[mip] if mip < n_casc else jnp.zeros((G, G, G), bool)
        if prev is not None:
            pooled = jax.lax.reduce_window(
                prev, False, jax.lax.bitwise_or, (2, 2, 2), (2, 2, 2), "VALID"
            )  # (G/2,)*3
            q = G // 4
            cur = cur.at[q : q + G // 2, q : q + G // 2, q : q + G // 2].max(pooled)
        levels.append(cur)
        prev = cur
    return jnp.stack(levels)


def update_grid(
    state: OccupancyGridState,
    density_fn,
    key: jax.Array,
    step: jax.Array,
    decay: float = 0.95,
    density_activation=None,
    full: bool = False,
) -> OccupancyGridState:
    """One grid update (reference update_density_grid_nerf).

    density_fn: (N,3) world positions in [0,1] (AABB-warped by caller's
    convention) → (N,) raw density logits.
    full: probe every cell (warm-up phase, step < 256); else ¼ uniform +
    ¼ occupied-weighted cells per cascade.
    """
    n_casc = state.density.shape[0]
    n_cells = G**3
    k1, k2, k3 = jax.random.split(key, 3)

    if full:
        mips = jnp.repeat(jnp.arange(n_casc, dtype=jnp.int32), n_cells)
        idx = jnp.tile(jnp.arange(n_cells, dtype=jnp.int32), n_casc)
    else:
        n_uniform = n_cells // 4 * n_casc
        # uniform cells
        u_idx = jax.random.randint(k1, (n_uniform,), 0, n_cells, jnp.int32)
        u_mip = jax.random.randint(k1, (n_uniform,), 0, n_casc, jnp.int32)
        # occupied cells: rejection-resample 10 candidates like the
        # reference (generate_grid_samples_nerf_nonuniform :218-256)
        o_mip = jax.random.randint(k2, (n_uniform,), 0, n_casc, jnp.int32)
        cand = jax.random.randint(k2, (n_uniform, 10), 0, n_cells, jnp.int32)
        flat_grid = state.density.reshape(n_casc, -1)
        occ = jnp.take_along_axis(
            flat_grid[o_mip], cand, axis=1
        ) > NERF_MIN_OPTICAL_THICKNESS
        first = jnp.argmax(occ, axis=1)
        o_idx = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
        mips = jnp.concatenate([u_mip, o_mip])
        idx = jnp.concatenate([u_idx, o_idx])

    ix = idx // (G * G)
    iy = (idx // G) % G
    iz = idx % G
    jitter = jax.random.uniform(k3, (idx.shape[0], 3))
    pos = cell_center(ix, iy, iz, mips, jitter=jitter - 0.0)  # jitter in [0,1) cell

    logits = density_fn(pos)
    dens = network_to_density(logits.astype(jnp.float32), density_activation)
    optical_thickness = dens * MIN_CONE_STEPSIZE

    # splat max into tmp grid
    flat_idx = mips * n_cells + idx
    tmp = jnp.zeros((n_casc * n_cells,), jnp.float32)
    tmp = tmp.at[flat_idx].max(optical_thickness)
    tmp = tmp.reshape(state.density.shape)

    # EMA-max merge; culled (negative) cells stay culled
    prev = state.density
    new_density = jnp.where(prev < 0.0, prev, jnp.maximum(prev * decay, tmp))

    mean_density = jnp.mean(jnp.maximum(new_density[0], 0.0))
    bitfield = _bitfield_from_density(new_density, mean_density)
    return OccupancyGridState(
        density=new_density,
        bitfield=bitfield,
        mean_density=mean_density,
        ema_step=state.ema_step + 1,
    )


def mark_untrained_cells(
    n_cascades: int,
    resolution: tuple[int, int],
    focal_lengths: np.ndarray,
    xforms: np.ndarray,
    principal_points: np.ndarray,
) -> jax.Array:
    """Initial visibility culling (reference mark_untrained_density_grid,
    testbed_nerf.cu:87-162): a cell is trainable iff at least one camera
    sees one of its corners. Returns (n_cascades, G, G, G) float32 grid
    of 0 (trainable) / -1 (culled).

    TPU recast: batched projection of all cell corners against all
    cameras inside one jit, chunked over cells.
    """
    w, h = resolution
    fx = jnp.asarray(focal_lengths[:, 0])
    fy = jnp.asarray(focal_lengths[:, 1])
    R = jnp.asarray(xforms[:, :, :3])  # (I,3,3) columns x,y,z axes
    t = jnp.asarray(xforms[:, :, 3])  # (I,3)
    pp = jnp.asarray(principal_points)  # (I,2)

    ii = jnp.arange(G)
    gx, gy, gz = jnp.meshgrid(ii, ii, ii, indexing="ij")
    base = jnp.stack([gx, gy, gz], -1).reshape(-1, 3).astype(jnp.float32)  # (n_cells,3)

    @jax.jit
    def visible_for_mip(mip):
        scale = jnp.exp2(mip.astype(jnp.float32))
        voxel = scale / G
        pos = (base / G - 0.5) * scale + 0.5  # (n,3) cell min corner

        corners = pos[:, None, :] + voxel * jnp.asarray(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
             [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]], jnp.float32
        )[None]  # (n, 8, 3)

        def body(i, seen):
            rel = corners - t[i]  # (n,8,3)
            # camera space: local = R^T·rel; forward is column 2
            local = jnp.einsum("nkc,cr->nkr", rel, R[i])
            z = local[..., 2]
            infront = z > 1e-4
            u = local[..., 0] / jnp.maximum(z, 1e-6) * fx[i] / w + pp[i, 0]
            v = local[..., 1] / jnp.maximum(z, 1e-6) * fy[i] / h + pp[i, 1]
            vis = infront & (u > 0) & (u < 1) & (v > 0) & (v < 1)
            return seen | jnp.any(vis, axis=-1)

        seen = jax.lax.fori_loop(
            0, R.shape[0], body, jnp.zeros((base.shape[0],), bool)
        )
        return jnp.where(seen, 0.0, -1.0)

    grids = [visible_for_mip(jnp.int32(m)).reshape(G, G, G) for m in range(n_cascades)]
    return jnp.stack(grids)
