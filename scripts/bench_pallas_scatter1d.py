"""Pallas scatter-add with a FLAT 1-D accumulator (no lane padding).

The (S, 2) f32 VMEM window padded lanes 2→128 (256 MB > VMEM). A flat
(S·F,) layout keeps the window at its true 4 MB. Indices stream through
SMEM in grid chunks; the scalar core does the RMW.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 1 << 20
S = 1 << 19
F = 2
CHUNK = 1 << 13
GRID = B // CHUNK


def scatter_kernel(idx_ref, val_ref, out_ref):
    # idx_ref: (CHUNK,) i32 SMEM; val_ref: (CHUNK*F,) f32 SMEM
    # out_ref: (S*F,) f32 VMEM (same block each step)
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        ix = idx_ref[i] * F
        out_ref[ix] = out_ref[ix] + val_ref[i * F]
        out_ref[ix + 1] = out_ref[ix + 1] + val_ref[i * F + 1]
        return 0

    lax.fori_loop(0, CHUNK, body, 0, unroll=1)


def run(idx, vals):
    kernel = pl.pallas_call(
        scatter_kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK * F,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((S * F,), lambda i: (0,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S * F,), jnp.float32),
    )
    return kernel(idx, vals.reshape(-1)).reshape(S, F)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (B,), 0, S, dtype=jnp.int32)
    vals = jax.random.normal(k2, (B, F), jnp.float32)

    fn = jax.jit(run)
    out = fn(idx, vals)
    jax.block_until_ready(out)
    ref = jnp.zeros((S, F)).at[idx].add(vals)
    print("max abs err:", float(jnp.max(jnp.abs(out - ref))))

    probe_idx = jnp.asarray(np.random.default_rng(0).integers(0, S * F, 65536), jnp.int32)

    def loop(iters):
        @jax.jit
        def go(v):
            def body(i, v):
                out = fn(idx, v)
                probe = jnp.sum(jnp.take(out.reshape(-1), probe_idx))
                return v + (probe * 1e-30).astype(v.dtype)
            return lax.fori_loop(0, iters, body, v)
        return go

    times = {}
    for iters in (2, 10):
        go = loop(iters)
        jax.block_until_ready(go(vals))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(go(vals))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per = (times[10] - times[2]) / 8
    print(f"pallas 1-D scatter: {per*1e3:.3f} ms  {per/B*1e9:.2f} ns/row")
