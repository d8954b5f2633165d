"""Microbenchmark: hash-table gather strategies on the v5e.

The render path's ceiling is the gather primitive: the L8F4 fox model
needs ~50 random table rows per sample (2 bricked dense + 6x8 hashed),
and XLA's row gather measured ~3.25 ns/row in round 2. This bench asks
whether a Pallas kernel with the table RESIDENT IN VMEM can beat that
(the table per level is 0.5-8 MB; VMEM is ~16 MB/core), and measures
the candidate lowerings:

  A. XLA jnp.take rows (baseline)             -- table in HBM
  B. Pallas: jnp.take inside kernel, VMEM table
  C. Pallas: one-hot bf16 MXU matmul gather (small tables)
  D. XLA one-hot matmul gather (small tables)
  E. XLA take with 16-wide rows (brick row)

Timing: on-device fori_loop with data chaining (see bench_primitives).
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
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20  # queries
ITERS = 8

key = jax.random.PRNGKey(0)


def bench(name, fn, idx, tab, unit=N, iters=ITERS):
    @jax.jit
    def run(carry):
        def body(i, c):
            out = fn(idx ^ (c & 1), tab)  # chain: idx depends on carry parity
            return (out.astype(jnp.float32).sum()).astype(jnp.int32) & 1

        return lax.fori_loop(0, iters, body, carry)

    try:
        out = run(jnp.int32(0))
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name:55s} FAILED: {str(e)[:120]}", flush=True)
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(0)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:55s} {dt*1e3:9.3f} ms  {dt/unit*1e9:8.3f} ns/row", flush=True)
    return dt


# ---------------------------------------------------------------- A/E: XLA
for logT, F, dtype in [(19, 4, jnp.float32), (19, 4, jnp.bfloat16),
                       (19, 16, jnp.bfloat16), (15, 4, jnp.float32),
                       (19, 32, jnp.bfloat16)]:
    T = 1 << logT
    tab = jax.random.normal(key, (T, F), dtype)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    bench(f"A xla take T=2^{logT} F={F} {dtype.__name__}",
          lambda i, t: jnp.take(t, i, axis=0), idx, tab)


# ---------------------------------------------------------------- B: pallas
def make_pallas_take(T, F, dtype, BN=8192, mode="take"):
    def kernel(idx_ref, tab_ref, out_ref):
        i = idx_ref[:]  # (BN,)
        if mode == "take":
            out_ref[:] = jnp.take(tab_ref[:], i, axis=0)
        elif mode == "dynslice":
            def body(k, _):
                out_ref[k, :] = tab_ref[i[k], :]
                return 0
            lax.fori_loop(0, BN, body, 0)

    def fn(idx, tab):
        return pl.pallas_call(
            kernel,
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec((BN,), lambda g: (g,), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, F), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BN, F), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, F), dtype),
        )(idx, tab)

    return fn


for logT, F, dtype in [(19, 4, jnp.float32), (19, 4, jnp.bfloat16),
                       (15, 4, jnp.float32)]:
    T = 1 << logT
    tab = jax.random.normal(key, (T, F), dtype)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    bench(f"B pallas take VMEM T=2^{logT} F={F} {dtype.__name__}",
          make_pallas_take(T, F, dtype), idx, tab)

# dynslice scalar loop variant, small block
T = 1 << 19
tab = jax.random.normal(key, (T, 4), jnp.float32)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
bench("B2 pallas dynslice loop T=2^19 F=4 f32",
      make_pallas_take(T, 4, jnp.float32, BN=2048, mode="dynslice"), idx, tab)


# ---------------------------------------------------------------- C/D: 1hot
def xla_onehot(i, t):
    oh = (i[:, None] == jnp.arange(t.shape[0], dtype=jnp.int32)[None, :])
    return jnp.dot(oh.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


for logT in (12, 14):
    T = 1 << logT
    tab = jax.random.normal(key, (T, 4), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    bench(f"D xla one-hot matmul T=2^{logT} F=4", xla_onehot, idx, tab)
