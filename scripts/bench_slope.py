"""Slope-method microbenchmarks: per-iteration device cost of each
candidate, free of harness overhead and dispatch artifacts.

For each candidate `step`, build run_k(v) = fori_loop of k data-chained
iterations (chain = gather 64K random elements of the output, reduced
to a scalar, folded back into v — dynamic indices defeat algebraic
simplification; the chain costs the same in every variant and cancels
in the slope). Cost = (T(10 iters) - T(2 iters)) / 8.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from instant_ngp_tpu.ops import scatter as sc

B = 1 << 20
S = 1 << 19
F = 2
NP_RNG = np.random.default_rng(0)
CHAIN_IDX = jnp.asarray(NP_RNG.integers(0, 1 << 30, 65536).astype(np.int32))

key = jax.random.PRNGKey(0)
IDX = jax.random.randint(key, (B,), 0, S, dtype=jnp.int32)


def measure(name, step, vals_shape):
    def make(iters):
        @jax.jit
        def run(v):
            def body(i, v):
                out = step(v)
                flat = out.reshape(-1)
                probe = jnp.take(flat, CHAIN_IDX % flat.shape[0])
                return v + (jnp.sum(probe) * 1e-30).astype(v.dtype)

            return lax.fori_loop(0, iters, body, v)

        return run

    v0 = jax.random.normal(jax.random.PRNGKey(1), vals_shape, jnp.float32)
    times = {}
    for iters in (2, 10):
        run = make(iters)
        out = run(v0)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(v0))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    per = (times[10] - times[2]) / 8
    print(f"{name:44s} {per*1e3:9.3f} ms/iter", flush=True)
    return per


if __name__ == "__main__":
    # full candidates
    measure("xla flat scatter (1M rows F=2)",
            lambda v: sc.scatter_add_xla(IDX, v, S), (B, F))
    measure("merge full (1M rows F=2)",
            lambda v: sc.scatter_add_merge(IDX, v, S), (B, F))

    # merge components
    def sort1(v):
        s = lax.sort((IDX, v[:, 0], v[:, 1]), num_keys=1)
        return jnp.stack(s[1:], -1)

    measure("  sort1: lax.sort 1M x3", sort1, (B, F))

    SIDX = jnp.sort(IDX)
    measure("  segscan: 20-pass run totals",
            lambda v: sc._segmented_run_totals(SIDX, v), (B, F))

    def sort2(v):
        keys2 = jnp.concatenate([SIDX, jnp.arange(S, dtype=jnp.int32)])
        tag = jnp.concatenate([jnp.zeros(B, jnp.int32), jnp.ones(S, jnp.int32)])
        t0c = jnp.concatenate([v[:, 0], jnp.zeros(S)])
        t1c = jnp.concatenate([v[:, 1], jnp.zeros(S)])
        m = lax.sort((keys2, tag, t0c, t1c), num_keys=2, is_stable=True)
        return jnp.stack(m[2:], -1)

    measure("  sort2: stable merge 1.5M x4", sort2, (B, F))

    def sort3(v):
        tag = (IDX > (S // 2)).astype(jnp.int32)
        ext = jnp.concatenate([v[:, 0], v[:, 0][: S]])
        tg = jnp.concatenate([tag, jnp.ones(S, jnp.int32)])
        ext1 = jnp.concatenate([v[:, 1], v[:, 1][: S]])
        p = lax.sort((tg, ext, ext1), num_keys=1, is_stable=True)
        return jnp.stack([p[1][:S], p[2][:S]], -1)

    measure("  sort3: 1-bit stable 1.5M x3", sort3, (B, F))

    # splat components at two level sizes
    for R in (16, 64):
        N = 1 << 17
        size = ((R**3 + 7) // 8) * 8
        grid = jax.random.randint(key, (N, 3), 0, R, dtype=jnp.int32)
        t = jax.random.uniform(key, (N, 3))

        measure(f"splat full R={R} bf16 (N=131K)",
                lambda v, g=grid, tt=t, R=R, sz=size: sc.splat_dense(g, tt, v, R, sz),
                (N, F))

        def splat_core(v, g=grid, tt=t, R=R):
            r = jnp.arange(R + 1, dtype=jnp.int32)[None, :]
            W = []
            for d in range(3):
                gd = g[:, d:d+1]
                td = tt[:, d:d+1]
                W.append(((r == gd) * (1 - td) + (r == gd + 1) * td).astype(jnp.bfloat16))
            gc = v.astype(jnp.bfloat16)
            U = (W[1][:, :, None] * W[0][:, None, :]).reshape(N, (R + 1) ** 2)
            V = (W[2][:, :, None] * gc[:, None, :]).reshape(N, (R + 1) * F)
            return jnp.einsum("nq,np->qp", V, U, preferred_element_type=jnp.float32)

        measure(f"  splat core einsum R={R}", splat_core, (N, F))

        def u_only(v, g=grid, tt=t, R=R):
            r = jnp.arange(R + 1, dtype=jnp.int32)[None, :]
            W = []
            for d in range(2):
                gd = g[:, d:d+1]
                td = tt[:, d:d+1]
                W.append(((r == gd) * (1 - td) + (r == gd + 1) * td).astype(jnp.bfloat16))
            U = (W[1][:, :, None] * W[0][:, None, :]).reshape(N, (R + 1) ** 2)
            return U * v[0, 0].astype(jnp.bfloat16)

        measure(f"  U build only R={R}", u_only, (N, F))
