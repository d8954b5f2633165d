"""Microbenchmark TPU primitive costs for the hash-grid backward redesign.

Timing harness: each candidate runs ITERS times inside an on-device
lax.fori_loop whose carry data-chains the full value stream (the next
iteration's inputs depend on the previous iteration's output through a
gather, not just a scalar), so neither XLA nor the async runtime can
elide or overlap reps. One dispatch, wall-clocked, minus a measured
loop/chain overhead baseline. Host-side scalar chaining measured
fantasy numbers on this tunneled device (0.25ms for an 86ms scatter).
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

N = 1 << 20          # ~1M updates (one hashed level, compacted batch)
S = 1 << 19          # hashed-level table rows
F = 2
ITERS = 8

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
IDX = jax.random.randint(k1, (N,), 0, S, dtype=jnp.int32)
VALS = jax.random.normal(k2, (N, F), jnp.float32)
SORTED_IDX = jnp.sort(IDX)


def bench(name, step, unit_count=None, iters=ITERS):
    """step: (vals (N,F)) -> (S,F)-or-(N,F)-or-anything; we chain by
    gathering the output back into vals."""

    @jax.jit
    def run(vals):
        def body(i, v):
            out = step(v)
            flat = out.reshape(-1)
            take = jnp.take(flat, (IDX % flat.shape[0]).astype(jnp.int32))
            return v + 1e-30 * take[:, None]

        return lax.fori_loop(0, iters, body, vals)

    out = run(VALS)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(VALS)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    dt_net = dt - bench.overhead
    per = f"  {dt_net / unit_count * 1e9:8.2f} ns/unit" if unit_count else ""
    print(f"{name:45s} {dt_net * 1e3:9.3f} ms{per}", flush=True)
    return dt_net


bench.overhead = 0.0


# ---- candidates ------------------------------------------------------
def baseline_chain(v):
    return v  # loop + chain-gather only


def scatter_scalar(v):
    flat_idx = (IDX[:, None] * F + jnp.arange(F, dtype=jnp.int32)[None, :]).reshape(-1)
    return jnp.zeros((S * F,), jnp.float32).at[flat_idx].add(v.reshape(-1))


def scatter_rows(v):
    return jnp.zeros((S, F), jnp.float32).at[IDX].add(v)


def seg_unsorted(v):
    return jax.ops.segment_sum(v, IDX, num_segments=S)


def seg_sorted(v):
    return jax.ops.segment_sum(v, SORTED_IDX, num_segments=S,
                               indices_are_sorted=True)


def gather_rows(v):
    return jnp.take(v, IDX % N, axis=0)


def cumsum_f32(v):
    return jnp.cumsum(v, axis=0)


def sort_kv(v):
    k, v0, v1 = lax.sort((IDX, v[:, 0], v[:, 1]), num_keys=1)
    return jnp.stack([v0, v1], -1)


def argsort_u32(v):
    p = jnp.argsort(IDX + v[0, 0].astype(jnp.int32))
    return p.astype(jnp.float32)


def searchsorted_n(v):
    q = (IDX + v[0, 0].astype(jnp.int32)) % N
    return jnp.searchsorted(SORTED_IDX, q).astype(jnp.float32)


def sort_then_boundary(v):
    k, v0, v1 = lax.sort((IDX, v[:, 0], v[:, 1]), num_keys=1)
    sv = jnp.stack([v0, v1], -1)
    csum = jnp.concatenate([jnp.zeros((1, F)), jnp.cumsum(sv, axis=0)], axis=0)
    ub = jnp.searchsorted(k, jnp.arange(S, dtype=jnp.int32), side="right")
    lb = jnp.concatenate([jnp.zeros((1,), ub.dtype), ub[:-1]])
    return jnp.take(csum, ub, axis=0) - jnp.take(csum, lb, axis=0)


def sort_then_segsum(v):
    k, v0, v1 = lax.sort((IDX, v[:, 0], v[:, 1]), num_keys=1)
    sv = jnp.stack([v0, v1], -1)
    return jax.ops.segment_sum(sv, k, num_segments=S, indices_are_sorted=True)


def splat_dense_bf16(v, R=64):
    n = 1 << 17
    pos = jnp.abs(v[:n, 0:1] * jnp.array([[1.0, 0.7, 0.3]])) % 1.0
    g = v[:n]
    p = pos * (R - 1)
    f = jnp.floor(p)
    fr = p - f
    gi = f.astype(jnp.int32)
    r = jnp.arange(R, dtype=jnp.int32)[None, :]

    def axis_mat(d):
        return ((r == gi[:, d:d+1]) * (1 - fr[:, d:d+1])
                + (r == gi[:, d:d+1] + 1) * fr[:, d:d+1])

    Wx, Wy, Wz = axis_mat(0), axis_mat(1), axis_mat(2)
    U = (Wy[:, :, None] * Wx[:, None, :]).reshape(n, R * R).astype(jnp.bfloat16)
    V = (Wz[:, :, None] * g[:, None, :]).reshape(n, R * F).astype(jnp.bfloat16)
    return jnp.einsum("nq,np->qp", V, U, preferred_element_type=jnp.float32)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print(f"N={N} updates, S={S} table rows, F={F}, iters={ITERS}", flush=True)
    bench.overhead = 0.0
    bench.overhead = max(bench("chain baseline (loop+gather only)", baseline_chain), 0.0)
    bench("scatter-add scalar flat (2N elems)", scatter_scalar, unit_count=N * F)
    bench("scatter-add rows (N rows)", scatter_rows, unit_count=N)
    bench("segment_sum unsorted", seg_unsorted, unit_count=N)
    bench("segment_sum pre-sorted ids", seg_sorted, unit_count=N)
    bench("gather rows", gather_rows, unit_count=N)
    bench("cumsum (N,2)", cumsum_f32, unit_count=N)
    bench("lax.sort u32 + 2 payloads", sort_kv, unit_count=N)
    bench("argsort u32", argsort_u32, unit_count=N)
    bench("searchsorted N into N", searchsorted_n, unit_count=N)
    bench("sort + boundary-gather to table", sort_then_boundary, unit_count=N)
    bench("sort + segsum(sorted) to table", sort_then_segsum, unit_count=N)
    bench("splat dense R=64 bf16 (N=131072)", splat_dense_bf16, unit_count=(1 << 17) * 8)
