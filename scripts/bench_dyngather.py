"""Measure tpu.dynamic_gather (Mosaic sublane gather) throughput.

Form: out[i,j] = x[idx[i,j], j] via jnp.take_along_axis(x, idx, axis=0)
inside a Pallas kernel, x/idx/out all (T, 128). If this runs at ~lane
throughput it enables VMEM-resident hash tables at ~0.01-1 ns/lookup —
vs XLA's ~8 ns/row HBM gather.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
ITERS = 16


def run_one(T, L=128, dtype=jnp.float32, reps=8):
    """One kernel call: REPS sequential gathers inside the kernel (data
    chained) to amortize call overhead."""
    x = jax.random.normal(key, (T, L), dtype)
    idx = jax.random.randint(key, (T, L), 0, T, jnp.int32)

    def kernel(x_ref, idx_ref, out_ref):
        v = x_ref[:]
        ix = idx_ref[:]
        def body(k, carry):
            g = jnp.take_along_axis(v, (ix + k) % T, axis=0)
            return carry + g
        out_ref[:] = lax.fori_loop(0, reps, body, jnp.zeros_like(v))

    @jax.jit
    def fn(x, idx):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, L), dtype),
        )(x, idx)

    try:
        out = fn(x, idx)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"T={T:7d} FAILED: {str(e)[:150]}", flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS / reps
    n = T * L
    print(f"T={T:7d} L={L} {dtype.__name__}: {dt*1e6:9.2f} us/gather "
          f"{dt/n*1e9:8.4f} ns/elem  ({n/dt/1e9:7.2f} G elem/s)", flush=True)


for T in (8, 64, 512, 4096, 32768):
    run_one(T)
run_one(4096, dtype=jnp.bfloat16)
