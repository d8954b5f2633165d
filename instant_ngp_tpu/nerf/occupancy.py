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
    # Empty-cascade chain counts (TPU-first; see _skip_chain): per cell
    # the number of consecutive empty cascades starting at this one.
    # 0 = occupied. Lets the marcher decide occupancy AND the best skip
    # cascade with ONE gather instead of the reference's per-step mip
    # ascent probes (if_unoccupied_advance_to_next_occupied_voxel,
    # nerf_device.cuh:462-495). float32 because f32 rows gather ~2×
    # faster than narrow int dtypes on v5e (scripts/bench_gather_tpu).
    skipmip: jax.Array  # (NERF_CASCADES, G, G, G) float32
    mean_density: jax.Array  # () float32
    ema_step: jax.Array  # () int32


jax.tree_util.register_dataclass(
    OccupancyGridState,
    data_fields=["density", "bitfield", "skipmip", "mean_density", "ema_step"],
    meta_fields=[],
)


def _skip_chain(bitfield: jax.Array) -> jax.Array:
    """Per-cell consecutive-empty-cascade counts (float32).

    A[m, c] = 0 if cascade m is occupied at cell c, else
    1 + A[m+1, parent(c)] — i.e. the number of nested cascades (each 2×
    the extent, same 128³ resolution) that are all empty around this
    position. The marcher turns this into an occupancy test (A == 0)
    and a maximal safe DDA skip (cascade m + A − 1) with a single
    gather. Safe because the bitfield mip chain OR-pools children into
    parents (_bitfield_from_density): an empty parent cell implies all
    contained child cells are empty.

    parent(c): cascade m's full extent maps onto the center half of
    cascade m+1, so cell i's parent is G/4 + i//2 per axis.
    """
    q = G // 4
    out = [None] * NERF_CASCADES
    a_next = None
    for m in reversed(range(NERF_CASCADES)):
        empty = ~bitfield[m]
        if a_next is None:
            a = empty.astype(jnp.float32)
        else:
            up = a_next[q : 3 * q, q : 3 * q, q : 3 * q]
            for axis in range(3):
                up = jnp.repeat(up, 2, axis=axis)
            a = jnp.where(empty, 1.0 + up, 0.0)
        out[m] = a
        a_next = a
    return jnp.stack(out)


def init_grid(n_cascades: int) -> OccupancyGridState:
    bitfield = jnp.zeros((NERF_CASCADES, G, G, G), bool)
    return OccupancyGridState(
        density=jnp.zeros((n_cascades, G, G, G), jnp.float32),
        bitfield=bitfield,
        skipmip=_skip_chain(bitfield),
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


def skip_at(skipmip: jax.Array, pos: jax.Array, mip: jax.Array) -> jax.Array:
    """Gather the empty-chain count at (mip, cell(pos)) — the marcher's
    single probe. Returns (...,) float32: 0 = occupied at cascade mip;
    a > 0 = cascades mip..mip+a−1 are all empty here (skip at the
    largest). Out-of-grid positions return 1 (skip one voxel)."""
    mip_scale = jnp.exp2(-mip.astype(jnp.float32))
    p = (pos - 0.5) * mip_scale[..., None] + 0.5
    i = jnp.floor(p * G).astype(jnp.int32)
    inb = jnp.all((i >= 0) & (i < G), axis=-1)
    i = jnp.clip(i, 0, G - 1)
    flat = ((mip * G + i[..., 0]) * G + i[..., 1]) * G + i[..., 2]
    vals = jnp.take(skipmip.reshape(-1), flat, axis=0)
    return jnp.where(inb, vals, 1.0)


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
        # The reference probes G³/4 uniform + G³/4 occupied per cascade
        # (training_prep_nerf). On TPU each probe costs a full encoding
        # (tens of gather rows) and the update was 35% of the whole
        # train step — probe half as many cells per update instead
        # (G³/8 + G³/8); cells are refreshed half as often on average,
        # which the EMA-max (decay 0.95/update) tolerates.
        n_uniform = n_cells // 8 * n_casc
        k1a, k1b = jax.random.split(k1)
        # uniform cells
        u_idx = jax.random.randint(k1a, (n_uniform,), 0, n_cells, jnp.int32)
        u_mip = jax.random.randint(k1b, (n_uniform,), 0, n_casc, jnp.int32)
        # occupied cells: rejection-resample candidates (reference
        # generate_grid_samples_nerf_nonuniform :218-256 tries 10 with
        # early break; vectorized TPU lanes pay EVERY try as a gather
        # row — 4 tries keeps ~97% of the hit rate at warm grids for
        # 60% less gather traffic)
        k2a, k2b = jax.random.split(k2)
        o_mip = jax.random.randint(k2a, (n_uniform,), 0, n_casc, jnp.int32)
        cand = jax.random.randint(k2b, (n_uniform, 4), 0, n_cells, jnp.int32)
        flat_grid = state.density.reshape(-1)
        occ = (
            jnp.take(flat_grid, o_mip[:, None] * n_cells + cand)
            > NERF_MIN_OPTICAL_THICKNESS
        )
        first = jnp.argmax(occ, axis=1)
        o_idx = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
        mips = jnp.concatenate([u_mip, o_mip])
        idx = jnp.concatenate([u_idx, o_idx])

    # probe densities in bounded chunks (lax.map over rank-1 cell ids) —
    # a full-grid update is n_cascades·128³ ≈ 6.3M positions; both one
    # giant call and a materialized (N,3) position array (which TPU
    # tile-padding would inflate ~42×) are avoided.
    n = idx.shape[0]
    chunk = 1 << 18

    def probe(args):
        idx_c, mips_c, key_c = args
        ix = (idx_c // (G * G)).astype(jnp.float32)
        iy = ((idx_c // G) % G).astype(jnp.float32)
        iz = (idx_c % G).astype(jnp.float32)
        scale = jnp.exp2(mips_c.astype(jnp.float32))
        jit3 = jax.random.uniform(key_c, (3, idx_c.shape[0]))
        px = ((ix + jit3[0]) / G - 0.5) * scale + 0.5
        py = ((iy + jit3[1]) / G - 0.5) * scale + 0.5
        pz = ((iz + jit3[2]) / G - 0.5) * scale + 0.5
        return density_fn(jnp.stack([px, py, pz], axis=-1))

    if n > chunk:
        n_pad = (n + chunk - 1) // chunk * chunk
        idx_p = jnp.pad(idx, (0, n_pad - n)).reshape(-1, chunk)
        mips_p = jnp.pad(mips, (0, n_pad - n)).reshape(-1, chunk)
        keys = jax.random.split(k3, n_pad // chunk)
        logits = jax.lax.map(probe, (idx_p, mips_p, keys)).reshape(-1)[:n]
    else:
        logits = probe((idx, mips, k3))
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
        skipmip=_skip_chain(bitfield),
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
    n_images = xforms.shape[0]

    corner_offsets = [
        (0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
        (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1),
    ]

    @functools.partial(jax.jit, static_argnums=())
    def visible_chunk(bx, by, bz, mip):
        """(n,) integer cell coords per axis → (n,) bool visibility.
        Rank-1 math throughout: on TPU an (n,3) f32 array tile-pads its
        trailing dim to 128 lanes (~42× memory); component arrays keep
        n in the lane dimension."""
        scale = jnp.exp2(mip.astype(jnp.float32))
        voxel = scale / G
        px = (bx / G - 0.5) * scale + 0.5
        py = (by / G - 0.5) * scale + 0.5
        pz = (bz / G - 0.5) * scale + 0.5

        def body(i, seen):
            Ri = R[i]  # (3,3), columns are camera axes
            ti = t[i]
            vis_any = jnp.zeros_like(seen)
            for c in range(8):
                ox, oy, oz = corner_offsets[c]
                rx = px + voxel * ox - ti[0]
                ry = py + voxel * oy - ti[1]
                rz = pz + voxel * oz - ti[2]
                # camera-space coordinates: local_k = rel · R[:,k]
                z = rx * Ri[0, 2] + ry * Ri[1, 2] + rz * Ri[2, 2]
                lx = rx * Ri[0, 0] + ry * Ri[1, 0] + rz * Ri[2, 0]
                ly = rx * Ri[0, 1] + ry * Ri[1, 1] + rz * Ri[2, 1]
                zi = 1.0 / jnp.maximum(z, 1e-6)
                u = lx * zi * fx[i] / w + pp[i, 0]
                v = ly * zi * fy[i] / h + pp[i, 1]
                vis_any = vis_any | (
                    (z > 1e-4) & (u > 0) & (u < 1) & (v > 0) & (v < 1)
                )
            return seen | vis_any

        return jax.lax.fori_loop(0, n_images, body, jnp.zeros(bx.shape[0], bool))

    ii = np.arange(G)
    gx, gy, gz = np.meshgrid(ii, ii, ii, indexing="ij")
    bx = gx.reshape(-1).astype(np.float32)
    by = gy.reshape(-1).astype(np.float32)
    bz = gz.reshape(-1).astype(np.float32)
    chunk = 1 << 19
    grids = []
    for m in range(n_cascades):
        out = np.empty(bx.shape[0], np.float32)
        for i in range(0, bx.shape[0], chunk):
            vis = visible_chunk(
                jnp.asarray(bx[i : i + chunk]),
                jnp.asarray(by[i : i + chunk]),
                jnp.asarray(bz[i : i + chunk]),
                jnp.int32(m),
            )
            out[i : i + chunk] = np.where(np.asarray(vis), 0.0, -1.0)
        grids.append(out.reshape(G, G, G))
    return jnp.asarray(np.stack(grids))
