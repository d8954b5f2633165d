"""Exponential-stepping ray-march math, vectorized for the TPU VPU.

Exact re-derivation of the reference's marching math
(nerf_device.cuh:370-495): the analytic stepping-space warp
to_stepping_space/from_stepping_space (piecewise linear/log/linear in
t), cone-angle dt, DDA distance-to-next-voxel, mip selection via
floating-point exponents, and the occupancy-skip advance.

Everything here is branch-free jnp (jnp.where instead of if) so it maps
onto 8×128 VPU lanes and can live inside lax.scan/pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import (
    MAX_CONE_STEPSIZE,
    MAX_DEPTH,
    MIN_CONE_STEPSIZE,
    NERF_CASCADES,
    NERF_GRIDSIZE,
)


def to_stepping_space(t, cone_angle):
    """nerf_device.cuh:378-399. cone_angle may be 0 (uniform steps)."""
    t = jnp.asarray(t, jnp.float32)
    ca = jnp.maximum(jnp.asarray(cone_angle, jnp.float32), 1e-10)
    log1p_c = jnp.log1p(ca)
    a = (jnp.log(MIN_CONE_STEPSIZE) - jnp.log(log1p_c)) / log1p_c
    b = (jnp.log(MAX_CONE_STEPSIZE) - jnp.log(log1p_c)) / log1p_c
    at = jnp.exp(a * log1p_c)
    bt = jnp.exp(b * log1p_c)
    exp_branch = jnp.log(jnp.maximum(t, 1e-30)) / log1p_c
    s = jnp.where(
        t <= at,
        (t - at) / MIN_CONE_STEPSIZE + a,
        jnp.where(t <= bt, exp_branch, (t - bt) / MAX_CONE_STEPSIZE + b),
    )
    return jnp.where(cone_angle <= 1e-5, t / MIN_CONE_STEPSIZE, s)


def from_stepping_space(n, cone_angle):
    """nerf_device.cuh:401-422 (inverse of the above)."""
    n = jnp.asarray(n, jnp.float32)
    ca = jnp.maximum(jnp.asarray(cone_angle, jnp.float32), 1e-10)
    log1p_c = jnp.log1p(ca)
    a = (jnp.log(MIN_CONE_STEPSIZE) - jnp.log(log1p_c)) / log1p_c
    b = (jnp.log(MAX_CONE_STEPSIZE) - jnp.log(log1p_c)) / log1p_c
    at = jnp.exp(a * log1p_c)
    bt = jnp.exp(b * log1p_c)
    t = jnp.where(
        n <= a,
        (n - a) * MIN_CONE_STEPSIZE + at,
        jnp.where(n <= b, jnp.exp(n * log1p_c), (n - b) * MAX_CONE_STEPSIZE + bt),
    )
    return jnp.where(cone_angle <= 1e-5, n * MIN_CONE_STEPSIZE, t)


def advance_n_steps(t, cone_angle, n):
    return from_stepping_space(to_stepping_space(t, cone_angle) + n, cone_angle)


def calc_dt(t, cone_angle):
    return advance_n_steps(t, cone_angle, 1.0) - t


def distance_to_next_voxel(pos, dir, idir, res):
    """DDA-like step distance (nerf_device.cuh:360-368).
    pos, dir, idir: (..., 3); res: scalar or (...) voxels across [0,1]."""
    res = jnp.asarray(res, jnp.float32)
    res_b = res[..., None] if res.ndim else res
    p = res_b * (pos - 0.5)
    sign_d = jnp.sign(dir)
    t_ax = (jnp.floor(p + 0.5 + 0.5 * sign_d) - p) * idir
    # Axis-aligned rays: the reference gets 0·inf=NaN which fminf
    # ignores; make that explicit (degenerate axes never bound the step).
    t_ax = jnp.where(jnp.abs(dir) < 1e-10, jnp.inf, t_ax)
    t = jnp.min(t_ax, axis=-1)
    return jnp.maximum(t / res, 0.0)


def advance_to_next_voxel(t, cone_angle, pos, dir, idir, mip):
    """nerf_device.cuh:429-440: analytic skip forward in stepping space
    (ceil of the stepping-space distance, min half a step)."""
    res = NERF_GRIDSIZE * jnp.exp2(-mip.astype(jnp.float32))
    t_target = t + distance_to_next_voxel(pos, dir, idir, res)
    s = to_stepping_space(t, cone_angle)
    s_target = to_stepping_space(t_target, cone_angle)
    return from_stepping_space(s + jnp.ceil(jnp.maximum(s_target - s, 0.5)), cone_angle)


def mip_from_pos(pos, max_cascade: int = NERF_CASCADES - 1):
    """nerf_device.cuh:442-447: smallest cascade containing pos."""
    maxval = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    _, exponent = jnp.frexp(jnp.maximum(maxval, 1e-30))
    return jnp.clip(exponent + 1, 0, max_cascade).astype(jnp.int32)


def mip_from_dt(dt, pos, max_cascade: int = NERF_CASCADES - 1):
    """nerf_device.cuh:449-459: at least the cascade whose cells are
    bigger than the local step size."""
    mip = mip_from_pos(pos, max_cascade)
    dt_scaled = dt * (2 * NERF_GRIDSIZE)
    _, exponent = jnp.frexp(jnp.maximum(dt_scaled, 1e-30))
    return jnp.where(
        dt_scaled < 1.0, mip, jnp.clip(jnp.maximum(mip, exponent), 0, max_cascade)
    ).astype(jnp.int32)


def ray_intersect_aabb(o, d, aabb_min, aabb_max):
    """Slab test → (tmin, tmax); tmin >= 0. o,d: (..., 3)."""
    idir = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    t0 = (aabb_min - o) * idir
    t1 = (aabb_max - o) * idir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin, tmax
