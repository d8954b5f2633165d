"""Decompose baked-render cost on fox (TPU).

Restores /tmp/fox_bakebench.ingp (train it first with
scripts/bench_baked.py), bakes once, then times each piece of a baked
round at R=2^18 with data-chained reps, and counts host rounds for a
full 1080p render. Prints one JSON line.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np

SNAP = "/tmp/fox_bakebench.ingp"


def main():
    import jax
    import jax.numpy as jnp

    from instant_ngp_tpu.testbed import Testbed

    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    assert Path(SNAP).exists(), "run scripts/bench_baked.py first"
    tb.load_snapshot(SNAP)
    task = tb.task
    ds = task.dataset
    v = 0
    xform = np.asarray(ds.xforms_start[v], np.float32)
    origin = xform[:, 3]
    cache = task._get_baked(origin=origin)
    out = {"step": task.training_step, "rows": cache.n_rows,
           "march_iters": task.render_march_iters,
           "K_baked": task.baked_samples_per_window}

    # rays for a 2^18 bucket: central crop of the 1080p frame
    R = 1 << 18
    w, h = ds.resolution
    fl = (ds.focal_lengths[v, 0] * 1920 / w, ds.focal_lengths[v, 1] * 1080 / h)
    ys, xs = np.divmod(np.arange(R), 1920)
    from instant_ngp_tpu.render.camera import uv_to_ray_cam
    from instant_ngp_tpu.nerf.task import _aabb_entry

    uv = np.stack([(xs + 0.5) / 1920, (ys + 270.5) / 1080], -1)
    dirs_cam, _ = uv_to_ray_cam(
        jnp.asarray(uv, jnp.float32), (1920, 1080),
        jnp.asarray(fl, jnp.float32),
        jnp.asarray([0.5, 0.5], jnp.float32))
    d = np.asarray(dirs_cam) @ xform[:, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(origin, d.shape).copy()
    o_d, d_d = jnp.asarray(o), jnp.asarray(d)
    aabb_min = jnp.asarray(task.aabb_min)
    aabb_max = jnp.asarray(task.aabb_max)
    tmin, tmax = _aabb_entry(o_d, d_d, aabb_min, aabb_max)
    alive = tmax > tmin
    grid_bits = task.state.grid.skipmip

    def chain_time(fn, state, n=8):
        """Data-chained reps: each rep consumes the previous state."""
        s = fn(state)  # warm
        t0 = time.time()
        for _ in range(n):
            s = fn(s)
        jax.block_until_ready(s)
        return (time.time() - t0) / n, s

    # (a) march window alone (chained through t)
    def march_once(state):
        t, = state
        ts, dts, valid, t_exit, n_valid = task._jit_march_window(
            grid_bits, o_d, d_d, t, alive, tmax,
            window=task.baked_samples_per_window)
        return (t_exit,)

    dt_march, _ = chain_time(march_once, (tmin,))
    out["march_ms"] = round(dt_march * 1e3, 1)

    # (b) baked table lookup alone on R*K positions (chained via pos)
    from instant_ngp_tpu.nerf.baked import query as baked_query
    K = task.baked_samples_per_window
    pos0 = jnp.asarray(
        np.random.default_rng(0).random((R * K, 3), np.float32))

    @jax.jit
    def lookup_once(pos):
        outv = baked_query(cache, pos)
        # chain: shift positions by a tiny function of the output
        return pos + outv[:, :1] * 1e-6

    dt_lookup, _ = chain_time(lambda s: (lookup_once(s[0]),), (pos0,))
    out["lookup_ms"] = round(dt_lookup * 1e3, 1)

    # (c) full baked2 dispatch (2 rounds) chained through ray state
    def round2_once(state):
        t, T, rgb, depth, al, cost = state
        return task._jit_render_round_baked2(
            cache, grid_bits, o_d, d_d, t, T, rgb, depth, al, tmax, cost,
            jnp.float32(task.min_transmittance))

    st0 = (tmin, jnp.ones((R,)), jnp.zeros((R, 3)), jnp.zeros((R,)),
           alive, jnp.zeros((R,)))
    dt_r2, _ = chain_time(round2_once, st0, n=4)
    out["baked2_ms"] = round(dt_r2 * 1e3, 1)

    # (d) full 1080p render with per-chunk round counting
    orig = task._jit_render_round_baked2
    counts = []

    class Counting:
        def __call__(self, *a, **k):
            counts.append(1)
            return orig(*a, **k)

    task._jit_render_round_baked2 = Counting()
    kw = dict(focal_length=fl, principal_point=tuple(ds.principal_points[v]),
              background=(0, 0, 0, 0), render_quality="baked")
    task.render(1920, 1080, xform, **kw)  # warm
    n_warm = len(counts)
    counts.clear()
    t0 = time.time()
    task.render(1920, 1080, xform, **kw)
    dt = time.time() - t0
    task._jit_render_round_baked2 = orig
    out["render_1080p_s"] = round(dt, 2)
    out["dispatches_1080p"] = len(counts)
    out["dispatches_warm"] = n_warm
    out["mrays_1080p"] = round(1920 * 1080 / dt / 1e6, 4)

    # quality: baked vs exact at 256² (the dt_scale + trilinear-cell
    # approximation cost, as image-space agreement)
    fl2 = (ds.focal_lengths[v, 0] * 256 / w, ds.focal_lengths[v, 1] * 256 / h)
    kw2 = dict(focal_length=fl2,
               principal_point=tuple(ds.principal_points[v]),
               background=(0, 0, 0, 0))
    exact_img = np.asarray(task.render(256, 256, xform, **kw2))
    baked_img = np.asarray(task.render(256, 256, xform,
                                       render_quality="baked", **kw2))
    mse = float(np.mean((np.clip(exact_img[..., :3], 0, 1)
                         - np.clip(baked_img[..., :3], 0, 1)) ** 2))
    out["baked_vs_exact_mae"] = round(float(np.mean(
        np.abs(exact_img - baked_img))), 4)
    out["baked_vs_exact_psnr"] = round(-10 * np.log10(max(mse, 1e-10)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
