"""Verify segment_sum-vs-scatter correctness + find why segment_sum is 100x faster."""
import time
import jax
import jax.numpy as jnp

N = 1 << 20
S = 1 << 19
F = 2
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
idx = jax.random.randint(k1, (N,), 0, S, dtype=jnp.int32)
vals = jax.random.normal(k2, (N, F), jnp.float32)


def scatter_rows(idx, vals):
    return jnp.zeros((S, F), jnp.float32).at[idx].add(vals)


def seg_unsorted(idx, vals):
    return jax.ops.segment_sum(vals, idx, num_segments=S)


a = jax.jit(scatter_rows)(idx, vals)
b = jax.jit(seg_unsorted)(idx, vals)
jax.block_until_ready((a, b))
print("max abs diff:", float(jnp.max(jnp.abs(a - b))))
print("scatter sum:", float(a.sum()), " segsum sum:", float(b.sum()))

# HLO compare
print("\n--- scatter_rows HLO (scatter lines) ---")
h1 = jax.jit(scatter_rows).lower(idx, vals).compile().as_text()
for line in h1.splitlines():
    if "scatter" in line or "sort" in line:
        print(line.strip()[:300])
print("\n--- segment_sum HLO (scatter lines) ---")
h2 = jax.jit(seg_unsorted).lower(idx, vals).compile().as_text()
for line in h2.splitlines():
    if "scatter" in line or "sort" in line:
        print(line.strip()[:300])

# timing again, data-chained, to be sure
for name, fn in [("scatter_rows", scatter_rows), ("seg_unsorted", seg_unsorted)]:
    f = jax.jit(fn)
    out = f(idx, vals)
    jax.block_until_ready(out)
    c = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(idx, vals + c)
        c = out[0, 0] * 1e-30
    jax.block_until_ready(c)
    print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.3f} ms")
