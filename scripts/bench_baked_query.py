"""Micro-profile baked query() pieces + dt_scale quality ablation.

Uses /tmp/fox_bakebench.ingp. Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from instant_ngp_tpu.testbed import Testbed
    from instant_ngp_tpu.nerf import baked as B

    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    tb.load_snapshot("/tmp/fox_bakebench.ingp")
    task = tb.task
    ds = task.dataset
    v = 0
    xform = np.asarray(ds.xforms_start[v], np.float32)
    origin = xform[:, 3]
    cache = task._get_baked(origin=origin)
    out = {"rows": cache.n_rows, "n_casc": cache.n_cascades}

    M = 1 << 22
    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.random((M, 3), np.float32))

    def timeit(fn, arg, n=8):
        r = fn(arg)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(n):
            r = fn(arg)
        jax.block_until_ready(r)
        return (time.time() - t0) / n / M * 1e9  # ns per sample

    # full query
    f_full = jax.jit(lambda p: B.query(cache, p))
    out["full_ns"] = round(timeit(f_full, pos0), 1)

    # pieces
    from instant_ngp_tpu.ops.raymarch import mip_from_pos

    @jax.jit
    def f_mip(p):
        mip = mip_from_pos(p, cache.n_cascades - 1)
        n = jnp.take(cache.res, mip)
        return mip + n

    out["mip_ns"] = round(timeit(f_mip, pos0), 1)

    @jax.jit
    def f_index(p):
        mip = mip_from_pos(p, cache.n_cascades - 1)
        n = jnp.take(cache.res, mip)
        nf = n.astype(jnp.float32)
        q = (p - 0.5) * jnp.exp2(-mip.astype(jnp.float32))[:, None] + 0.5
        u = q * nf[:, None]
        i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, (n - 1)[:, None])
        flat = (jnp.take(cache.offsets, mip)
                + (i[:, 0] * n + i[:, 1]) * n + i[:, 2])
        return jnp.take(cache.index, flat)

    out["thru_index_ns"] = round(timeit(f_index, pos0), 1)

    idx0 = f_index(pos0)

    @jax.jit
    def f_row(idx):
        return jnp.take(cache.table, jnp.maximum(idx, 0), axis=0)

    r = f_row(idx0)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(8):
        r = f_row(idx0)
    jax.block_until_ready(r)
    out["row_gather_ns"] = round((time.time() - t0) / 8 / M * 1e9, 1)

    row0 = r

    @jax.jit
    def f_interp(row):
        rowf = row.astype(jnp.float32).reshape(-1, 8, 4)
        f = pos0 - jnp.floor(pos0 * 256) / 256  # stand-in fracs
        wx = jnp.stack([1.0 - f[:, 0], f[:, 0]], -1)
        wy = jnp.stack([1.0 - f[:, 1], f[:, 1]], -1)
        wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], -1)
        w = (wx[:, :, None, None] * wy[:, None, :, None]
             * wz[:, None, None, :]).reshape(-1, 8)
        return jnp.einsum("mc,mcf->mf", w, rowf)

    rr = f_interp(row0)
    jax.block_until_ready(rr)
    t0 = time.time()
    for _ in range(8):
        rr = f_interp(row0)
    jax.block_until_ready(rr)
    out["interp_ns"] = round((time.time() - t0) / 8 / M * 1e9, 1)

    # dt_scale quality ablation at 256²
    w, h = ds.resolution
    fl2 = (ds.focal_lengths[v, 0] * 256 / w, ds.focal_lengths[v, 1] * 256 / h)
    kw2 = dict(focal_length=fl2,
               principal_point=tuple(ds.principal_points[v]),
               background=(0, 0, 0, 0))
    exact_img = np.asarray(task.render(256, 256, xform, **kw2))

    for name, scale in [("dt1", 1.0), ("dt_cell", task.baked_dt_scale)]:
        task.baked_dt_scale = scale
        img = np.asarray(task.render(256, 256, xform,
                                     render_quality="baked", **kw2))
        mse = float(np.mean((np.clip(exact_img[..., :3], 0, 1)
                             - np.clip(img[..., :3], 0, 1)) ** 2))
        out[f"agree_{name}_db"] = round(-10 * np.log10(max(mse, 1e-10)), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
