"""NeRF ray sampling: occupancy-guided exponential marching, TPU-native.

The reference generates training samples with a per-thread while-loop
and atomic compaction (generate_training_samples_nerf,
testbed_nerf.cu:691-849). The TPU recast (SURVEY.md §5 "long-context"
note): a fixed-iteration lax.scan marches all rays in lockstep —
occupied steps emit a t-value, unoccupied steps take an analytic DDA
skip — then a dense top-k compaction gathers each ray's first K emitted
samples into a fixed (R, K) bucket with a validity mask. No atomics, no
dynamic shapes; XLA pipelines the whole thing.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..common import MAX_DEPTH, NERF_GRIDSIZE
from ..ops.raymarch import (
    advance_n_steps,
    advance_to_next_voxel,
    calc_dt,
    from_stepping_space,
    mip_from_dt,
    mip_from_pos,
    ray_intersect_aabb,
    to_stepping_space,
)
from .occupancy import occupied_at


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    n_march_iters: int = 192  # lockstep scan iterations (occupied + skips)
    max_samples_per_ray: int = 48  # K: per-ray sample bucket
    cone_angle: float = 1.0 / 256.0
    min_mip: int = 0
    max_mip: int = 0  # max cascade index (set from dataset aabb_scale)


def march_rays(
    o: jax.Array,
    d: jax.Array,
    bitfield: jax.Array,
    aabb_min: jax.Array,
    aabb_max: jax.Array,
    t_start_jitter: jax.Array,
    cfg: MarchConfig,
    t_init: jax.Array | None = None,
):
    """March rays through the occupancy bitfield.

    Args:
      o, d: (R, 3) origins and *normalized* directions (world units).
      bitfield: (NERF_CASCADES, G, G, G) bool.
      aabb_min/max: (3,) training AABB.
      t_start_jitter: (R,) uniform [0,1) start offset in stepping space
        (reference startt = advance_n_steps(tmin, cone, rand)).
      t_init: optional (R,) explicit start distances (rendering resume);
        overrides the AABB entry point.

    Returns:
      ts: (R, K) sample distances (0 where invalid)
      dts: (R, K) step sizes
      valid: (R, K) bool
      t_exit: (R,) marching position after the scan (for windowed
        rendering: resume from here)
      n_valid: (R,) int32 number of emitted samples
    """
    R = o.shape[0]
    K = cfg.max_samples_per_ray
    ca = cfg.cone_angle

    tmin, tmax = ray_intersect_aabb(o, d, aabb_min, aabb_max)
    if t_init is None:
        t0 = advance_n_steps(tmin, ca, t_start_jitter)
    else:
        t0 = t_init
    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)

    inside = lambda pos: jnp.all((pos >= aabb_min) & (pos <= aabb_max), axis=-1)

    def step(carry, _):
        t, n_emitted = carry
        pos = o + t[:, None] * d
        ok = inside(pos) & (t < MAX_DEPTH) & (n_emitted < K)

        dt = calc_dt(t, ca)
        mip = jnp.clip(
            mip_from_dt(dt, pos, cfg.max_mip), cfg.min_mip, cfg.max_mip
        )
        occ = occupied_at(bitfield, pos, mip)

        # ascend to the largest empty surrounding voxel for a max skip
        # (reference if_unoccupied_advance_to_next_occupied_voxel)
        skip_mip = mip
        for _ in range(cfg.max_mip):
            above_occ = occupied_at(bitfield, pos, jnp.minimum(skip_mip + 1, cfg.max_mip))
            skip_mip = jnp.where(
                (~occ) & (skip_mip < cfg.max_mip) & (~above_occ), skip_mip + 1, skip_mip
            )

        emit = ok & occ
        t_next_occ = t + dt
        t_next_skip = advance_to_next_voxel(t, ca, pos, d, idir, skip_mip)
        t_next = jnp.where(ok, jnp.where(occ, t_next_occ, t_next_skip), t)

        out_t = jnp.where(emit, t, 0.0)
        out_dt = jnp.where(emit, dt, 0.0)
        return (t_next, n_emitted + emit.astype(jnp.int32)), (out_t, out_dt, emit)

    (t_exit, n_valid), (all_t, all_dt, all_emit) = jax.lax.scan(
        step, (t0, jnp.zeros((R,), jnp.int32)), None, length=cfg.n_march_iters
    )
    # (M, R) → (R, M)
    all_t = all_t.T
    all_dt = all_dt.T
    all_emit = all_emit.T

    # Compact the first K emitted samples per ray: rank emitted samples
    # by iteration order using top_k on (emit, -index).
    M = cfg.n_march_iters
    order = jnp.arange(M, dtype=jnp.float32)
    score = jnp.where(all_emit, M - order, -1.0)  # earlier → larger score
    _, top_idx = jax.lax.top_k(score, K)  # (R, K) indices into M, ordered
    ts = jnp.take_along_axis(all_t, top_idx, axis=1)
    dts = jnp.take_along_axis(all_dt, top_idx, axis=1)
    valid = jnp.take_along_axis(all_emit, top_idx, axis=1)
    ts = jnp.where(valid, ts, 0.0)
    dts = jnp.where(valid, dts, 0.0)
    return ts, dts, valid, t_exit, n_valid
