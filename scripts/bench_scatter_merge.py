"""Time scatter_add_merge on the real chip (single + batched levels)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from instant_ngp_tpu.ops.scatter import scatter_add_merge, scatter_add_xla, splat_dense

B = 1 << 20
S = 1 << 19
F = 2
L = 11
ITERS = 4


def bench(name, step, vals_shape, unit_count):
    @jax.jit
    def run(vals):
        def body(i, v):
            out = step(v)
            flat = out.reshape(-1)
            n = flat.shape[0]
            take = jnp.take(flat, jnp.arange(v.reshape(-1).shape[0]) % n)
            return v + 1e-30 * take.reshape(v.shape)

        return lax.fori_loop(0, ITERS, body, vals)

    vals = jax.random.normal(jax.random.PRNGKey(1), vals_shape, jnp.float32)
    out = run(vals)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(vals)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:42s} {dt*1e3:9.3f} ms  {dt/unit_count*1e9:7.2f} ns/row", flush=True)


if __name__ == "__main__":
    key = jax.random.PRNGKey(0)
    idx1 = jax.random.randint(key, (B,), 0, S, dtype=jnp.int32)
    idxL = jax.random.randint(key, (L, B), 0, S, dtype=jnp.int32)

    bench("merge 1 level (1M→512K)",
          lambda v: scatter_add_merge(idx1, v, S), (B, F), B)
    bench(f"merge {L} levels batched",
          lambda v: scatter_add_merge(idxL, v, S), (L, B, F), L * B)
    bench("xla flat 1 level",
          lambda v: scatter_add_xla(idx1, v, S), (B, F), B)

    # dense splat at realistic level sizes
    for R in (16, 32, 64):
        N = 1 << 17
        size = ((R**3 + 7) // 8) * 8
        grid = jax.random.randint(key, (N, 3), 0, R, dtype=jnp.int32)
        t = jax.random.uniform(key, (N, 3))
        bench(f"splat dense R={R} bf16 (N=131K)",
              lambda v, grid=grid, t=t, R=R, size=size: splat_dense(grid, t, v, R, size),
              (N, F), N)
