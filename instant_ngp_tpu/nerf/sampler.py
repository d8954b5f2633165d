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
from ..common import NERF_CASCADES
from .occupancy import skip_at


@dataclasses.dataclass(frozen=True)
class MarchConfig:
    n_march_iters: int = 192  # lockstep scan iterations (occupied + skips)
    max_samples_per_ray: int = 48  # K: per-ray sample bucket
    cone_angle: float = 1.0 / 256.0
    min_mip: int = 0
    max_mip: int = 0  # max cascade index (set from dataset aabb_scale)
    # step-size multiplier: baked-cache rendering steps at the cache's
    # cell size (the baked field is trilinear per cell — sub-cell steps
    # buy no detail, only more table gathers)
    dt_scale: float = 1.0


def march_rays(
    o: jax.Array,
    d: jax.Array,
    skipfield: jax.Array,
    aabb_min: jax.Array,
    aabb_max: jax.Array,
    t_start_jitter: jax.Array,
    cfg: MarchConfig,
    t_init: jax.Array | None = None,
):
    """March rays through the occupancy grid.

    Args:
      o, d: (R, 3) origins and *normalized* directions (world units).
      skipfield: (NERF_CASCADES, G, G, G) float32 empty-cascade chain
        counts (OccupancyGridState.skipmip; occupancy.py _skip_chain).
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

    TPU-first notes (this loop is gather-bound; XLA's gather issues
    ~1 row per ~7 ns on v5e regardless of op shape):
      * ONE grid probe per iteration: the skipfield value is both the
        occupancy test (0 = occupied) and the maximal safe skip
        cascade, replacing the reference's probe-per-mip ascent
        (nerf_device.cuh:462-495) — 1 gather/iter instead of
        1+max_mip.
      * Emitted samples land in their (ray, slot) bucket via a dense
        one-hot select over the K axis (pure VPU) instead of a
        per-iteration scatter.
      * Step sizes are not buffered: dt is an analytic function of t
        (calc_dt), recomputed vectorized after the loop.
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
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)

    # NB: a lax.while_loop with a data-dependent condition, writing
    # emitted samples straight into the (R, K) buckets. A scan of
    # static length here gets fully unrolled by the TPU compiler
    # (hundreds of gathers → pathological compile times) and would need
    # a top-k compaction afterwards; the while formulation avoids both
    # and exits early once every ray has terminated.
    def cond(carry):
        t, n_emitted, ts_buf, it, active = carry
        return (it < cfg.n_march_iters) & active

    def body(carry):
        t, n_emitted, ts_buf, it, _ = carry
        pos = o + t[:, None] * d
        ok = inside(pos) & (t < MAX_DEPTH) & (n_emitted < K)

        dt = calc_dt(t, ca) * cfg.dt_scale
        mip = jnp.clip(
            mip_from_dt(dt, pos, cfg.max_mip), cfg.min_mip, cfg.max_mip
        )
        chain = skip_at(skipfield, pos, mip)  # 0 = occupied
        occ = chain == 0.0
        skip_mip = jnp.minimum(
            mip + jnp.maximum(chain - 1.0, 0.0).astype(jnp.int32),
            NERF_CASCADES - 1,
        )

        emit = ok & occ
        slot = jnp.clip(n_emitted, 0, K - 1)
        write = emit[:, None] & (slot_iota == slot[:, None])
        ts_buf = jnp.where(write, t[:, None], ts_buf)

        t_next_occ = t + dt
        t_next_skip = advance_to_next_voxel(t, ca, pos, d, idir, skip_mip)
        t_next = jnp.where(ok, jnp.where(occ, t_next_occ, t_next_skip), t)
        n_emitted = n_emitted + emit.astype(jnp.int32)
        active = jnp.any(ok)
        return (t_next, n_emitted, ts_buf, it + 1, active)

    init = (
        t0,
        jnp.zeros((R,), jnp.int32),
        jnp.zeros((R, K), jnp.float32),
        jnp.int32(0),
        jnp.bool_(True),
    )
    t_exit, n_valid, ts, _, _ = jax.lax.while_loop(cond, body, init)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (R, K), 1) < n_valid[:, None]
    )
    ts = jnp.where(valid, ts, 0.0)
    dts = jnp.where(valid, calc_dt(ts, ca) * cfg.dt_scale, 0.0)
    return ts, dts, valid, t_exit, n_valid
