"""Pallas scatter-add microbench: VMEM-resident table, SMEM indices.

The hash-grid backward needs ~1M random-row accumulations per level
into a ≤4MB table. XLA's scatter runs ~11 ns/element on the scalar
core; this kernel tests whether Mosaic can beat that with the indices
prefetched into SMEM (scalar loads ~1 cycle) and the accumulator
resident in VMEM across grid steps.
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
CHUNK = 1 << 13  # indices per grid step (SMEM slice: 32 KB)
GRID = B // CHUNK


def scatter_kernel(idx_ref, val_ref, out_ref):
    # idx_ref: (CHUNK,) int32 in SMEM (scalar-prefetch slice)
    # val_ref: (CHUNK, F) f32 in VMEM
    # out_ref: (S, F) f32 in VMEM, same block every grid step
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        # manual 4-way unroll (Mosaic only supports unroll=1 or full)
        for k in range(4):
            ix = idx_ref[i * 4 + k]
            out_ref[ix, :] = out_ref[ix, :] + val_ref[i * 4 + k, :]
        return 0

    lax.fori_loop(0, CHUNK // 4, body, 0, unroll=1)


def run(idx, vals):
    kernel = pl.pallas_call(
        scatter_kernel,
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, F), jnp.float32),
    )
    return kernel(idx, vals)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (B,), 0, S, dtype=jnp.int32)
    vals = jax.random.normal(k2, (B, F), jnp.float32)

    fn = jax.jit(run)
    out = fn(idx, vals)
    jax.block_until_ready(out)
    # correctness
    ref = jnp.zeros((S, F)).at[idx].add(vals)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"max abs err vs XLA scatter: {err}")

    # slope timing: chain vals through a cheap dependency
    probe_idx = jnp.asarray(np.random.default_rng(0).integers(0, S, 65536), jnp.int32)

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
        o = go(vals); jax.block_until_ready(o)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(go(vals))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per = (times[10] - times[2]) / 8
    print(f"pallas scatter: {per*1e3:.3f} ms/call  {per/B*1e9:.2f} ns/row  "
          f"{B/per/1e6:.1f} M rows/s")
