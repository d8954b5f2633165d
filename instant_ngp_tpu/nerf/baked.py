"""Baked sparse-cell render cache — the TPU answer to the reference's
fused render megakernel (testbed_nerf.cu:1928-2002, render_nerf.cuh).

Why this exists: on v5e every XLA gather row costs ~7-15 ns regardless
of shape, and the full NeRF model needs ~50 gathered rows per sample
(L8F4 hash levels x corners + MLP weights are free, the gathers are
not).  The CUDA reference solves the same economics with a JIT
megakernel that keeps the whole model in registers; Mosaic exposes no
usable dynamic-gather primitive (docs/ROUND3_NOTES.md "Gather
economics"), so the TPU-native move is to *restructure the data*: bake
the field into a sparse table of packed per-cell records and render
with ONE 64-byte bf16 table row per sample (bf16 gathers are
width-free up to 64 B — the record is sized to exactly that).

Record layout (one row per occupied cell, (8 corners, 4 ch) bf16 =
64 B): activated [r, g, b, sigma] at the cell's 8 lattice corners.
Sampling = 1 int32 index gather + 1 row gather + in-register trilinear
(pure VPU).  ~25-30 ns/sample vs ~300 ns for the full model — the
difference between 0.05 and >1 M rays/s.

View dependence: colors are baked with a fixed direction by default
(diffuse bake) or, when `origin` is given, with the per-corner
direction from that camera origin — exact for primary rays up to the
angular size of one cell, i.e. frame-accurate for static-camera
renders (the SNeRG-style deferred-specular split is a possible later
refinement; this per-frame bake needs no extra channels).

Cascades: one index block per occupancy cascade (same geometry as
occupancy.py: cascade m spans (pos-0.5)*2^-m + 0.5 in [0,1]), finest
cascade baked at `res0` (default 256 = 2x the occupancy grid), outer
cascades at 128.  All index blocks live in one flat buffer with
per-mip offsets so the per-sample mip stays a traced value.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import NERF_GRIDSIZE, network_to_density, network_to_rgb, warp_direction
from ..ops.raymarch import mip_from_pos

G = NERF_GRIDSIZE

# direction used for fixed-direction (diffuse) bakes
FIXED_BAKE_DIR = np.float32([0.5774, 0.5774, 0.5774])


@dataclasses.dataclass
class BakedCache:
    """Pytree: flat per-cascade cell index + packed corner-record table."""

    index: jax.Array    # (sum_m N_m^3,) int32; row id or -1 = empty
    table: jax.Array    # (rows_cap, 32) bf16; (8 corners, [r,g,b,sigma])
    offsets: jax.Array  # (n_cascades,) int32 flat offset of each mip block
    res: jax.Array      # (n_cascades,) int32 bake resolution per mip
    n_cascades: int     # static
    n_rows: int         # static (actual occupied cells; <= table rows)


jax.tree_util.register_dataclass(
    BakedCache,
    data_fields=["index", "table", "offsets", "res"],
    meta_fields=["n_cascades", "n_rows"],
)


def query(cache: BakedCache, pos: jax.Array) -> jax.Array:
    """Sample the baked field at world positions pos (M, 3).

    Returns (M, 4) float32 activated [r, g, b, sigma]; zero outside
    occupied cells.  Two gathers per sample; everything else is VPU.
    """
    mip = mip_from_pos(pos, cache.n_cascades - 1)          # (M,) int32
    n = jnp.take(cache.res, mip)                           # (M,) int32
    nf = n.astype(jnp.float32)
    p = (pos - 0.5) * jnp.exp2(-mip.astype(jnp.float32))[:, None] + 0.5
    inb = jnp.all((p >= 0.0) & (p < 1.0), axis=-1)
    u = p * nf[:, None]
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, (n - 1)[:, None])
    f = jnp.clip(u - i.astype(jnp.float32), 0.0, 1.0)
    flat = jnp.take(cache.offsets, mip) + (i[:, 0] * n + i[:, 1]) * n + i[:, 2]
    idx = jnp.take(cache.index, flat)                      # gather 1 (int32)
    row = jnp.take(cache.table, jnp.maximum(idx, 0), axis=0)  # gather 2 (64 B)
    row = row.astype(jnp.float32).reshape(-1, 8, 4)
    # trilinear weights, corner c = 4*dx + 2*dy + dz (bake order below)
    wx = jnp.stack([1.0 - f[:, 0], f[:, 0]], -1)
    wy = jnp.stack([1.0 - f[:, 1], f[:, 1]], -1)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], -1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)
    out = jnp.einsum("mc,mcf->mf", w, row)
    return jnp.where(((idx >= 0) & inb)[:, None], out, 0.0)


def bake(
    model,
    params: dict,
    bitfield: np.ndarray,
    n_cascades: int,
    aabb_min,
    aabb_max,
    rgb_activation,
    density_activation,
    origin: np.ndarray | None = None,
    res0: int = 256,
    max_rows_log2: int = 22,
    chunk: int = 1 << 18,
    bricks=None,
    eval_fn=None,
) -> BakedCache:
    """Bake the model into a BakedCache.

    bitfield: (>=n_cascades, G, G, G) bool occupancy (the training
    grid's bitfield) — cells occupied there get records; the marcher
    only emits samples inside them, so coverage is exact for rendering.
    origin: camera position for a per-frame view-dependent bake; None
    bakes a fixed-direction (diffuse) cache.
    """
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)

    def occ_at(occ, n):
        """Occupancy resampled to n³: repeat up, OR-pool down (safe:
        a pooled cell is occupied if ANY child was)."""
        if n >= occ.shape[0]:
            rep = n // occ.shape[0]
            return occ.repeat(rep, 0).repeat(rep, 1).repeat(rep, 2)
        f = occ.shape[0] // n
        return occ.reshape(n, f, n, f, n, f).any((1, 3, 5))

    # choose per-mip resolutions: requested res0 for the finest mip, G
    # for the rest — degraded until the row cap fits, so a dense
    # early-training grid bakes coarse instead of silently dropping
    # cells (which would hole the render). Outer cascades degrade
    # BEFORE mip0: the subject lives in the unit cube, the outer mips
    # are background, and coarsening mip0 is what blurs renders.
    occs = [np.asarray(bitfield[m]) for m in range(n_cascades)]
    max_rows = 1 << max_rows_log2
    base = [res0 if m == 0 else G for m in range(n_cascades)]
    for k0, ko in sorted(
        ((a, b) for a in range(6) for b in range(6)),
        key=lambda p: (p[0], p[1]),
    ):
        res = [max(base[0] >> k0, 32)] + [
            max(b >> ko, 32) for b in base[1:]
        ]
        if sum(int(occ_at(occs[m], res[m]).sum())
               for m in range(n_cascades)) <= max_rows:
            break

    cells, mips = [], []
    for m in range(n_cascades):
        ijk = np.argwhere(occ_at(occs[m], res[m])).astype(np.int32)
        cells.append(ijk)
        mips.append(np.full((len(ijk),), m, np.int32))
    cells = np.concatenate(cells) if cells else np.zeros((0, 3), np.int32)
    mips = np.concatenate(mips) if mips else np.zeros((0,), np.int32)
    if len(cells) > max_rows:  # backstop (cap unreachable even at 32³)
        cells, mips = cells[:max_rows], mips[:max_rows]
    n_rows = len(cells)

    # flat index buffer: one block per cascade
    sizes = [r ** 3 for r in res]
    offsets = np.zeros(n_cascades, np.int64)
    offsets[1:] = np.cumsum(sizes)[:-1]
    index = np.full(int(np.sum(sizes)), -1, np.int32)
    # per-row flat position (res varies by mip; vectorized via lookup)
    res_arr = np.asarray(res, np.int64)
    n_per = res_arr[mips]
    flat = offsets[mips] + ((cells[:, 0].astype(np.int64) * n_per
                             + cells[:, 1]) * n_per + cells[:, 2])
    index[flat] = np.arange(n_rows, dtype=np.int32)

    # corner evaluation: 8 corners per cell, corner positions and
    # directions built ON DEVICE (the first bake did this in host
    # numpy and it dominated the bake time), chunked through one
    # jitted program; results fetched once at the end
    if eval_fn is None:
        eval_fn = make_bake_eval(model, rgb_activation, density_activation)
    cells_per_chunk = max(chunk // 8, 1)
    n_chunks = max((n_rows + cells_per_chunk - 1) // cells_per_chunk, 1)
    pad = n_chunks * cells_per_chunk - n_rows
    cells_d = jnp.asarray(np.pad(cells, ((0, pad), (0, 0))))
    mips_d = jnp.asarray(np.pad(mips, (0, pad)))
    origin_d = (jnp.asarray(origin, jnp.float32) if origin is not None
                else jnp.asarray(FIXED_BAKE_DIR))
    res_d = jnp.asarray(res, jnp.int32)
    aabb = (jnp.asarray(aabb_min), jnp.asarray(aabb_max))
    outs = [
        eval_fn(params, bricks, cells_d[s : s + cells_per_chunk],
                mips_d[s : s + cells_per_chunk], res_d, aabb, origin_d,
                origin is not None)
        for s in range(0, n_chunks * cells_per_chunk, cells_per_chunk)
    ]
    table = np.asarray(jnp.concatenate(outs))[:n_rows]  # ONE device fetch

    rows_cap = max(1024, 1 << int(np.ceil(np.log2(max(n_rows, 1)))))
    table = np.pad(table, ((0, rows_cap - n_rows), (0, 0), (0, 0)))
    return BakedCache(
        index=jnp.asarray(index),
        table=jnp.asarray(table.reshape(rows_cap, 32), jnp.bfloat16),
        offsets=jnp.asarray(offsets, jnp.int32),
        res=jnp.asarray(res, jnp.int32),
        n_cascades=n_cascades,
        n_rows=n_rows,
    )


def make_bake_eval(model, rgb_activation, density_activation):
    """Jitted per-chunk corner evaluator (cells → activated records).
    Built once per model and reused across bakes (see NerfTask.bake) —
    rebuilding it per bake() recompiles every time."""

    @functools.partial(jax.jit, static_argnums=(7,))
    def eval_chunk(params, bricks, cells, mips, res, aabb, origin_or_dir,
                   use_origin: bool):
        aabb_min, aabb_max = aabb
        n_per = jnp.take(res, mips).astype(jnp.float32)  # (C,)
        dc = jnp.asarray(
            [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)],
            jnp.float32)  # matches query's 4*dx+2*dy+dz corner order
        # corner world positions: ((i+dc)/N - 0.5) * 2^m + 0.5
        corner = (cells.astype(jnp.float32)[:, None, :] + dc[None]
                  ) / n_per[:, None, None]
        world = ((corner - 0.5)
                 * jnp.exp2(mips.astype(jnp.float32))[:, None, None] + 0.5
                 ).reshape(-1, 3)
        pos_w = (world - aabb_min) / (aabb_max - aabb_min)
        if use_origin:
            d = world - origin_or_dir
            d = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        else:
            d = jnp.broadcast_to(origin_or_dir, world.shape)
        out = model(params, pos_w, warp_direction(d), bricks=bricks)
        rgb = network_to_rgb(out[:, :3].astype(jnp.float32), rgb_activation)
        sigma = network_to_density(out[:, 3].astype(jnp.float32),
                                   density_activation)
        return jnp.concatenate([rgb, sigma[:, None]], -1).reshape(-1, 8, 4)

    return eval_chunk
