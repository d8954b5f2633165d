"""Static-shape sample compaction without scatters — TPU-native.

The reference compacts variable-length per-ray sample lists into a
dense buffer with atomic counters (generate_training_samples_nerf,
testbed_nerf.cu:691-849) and drops samples that overflow the buffer.
The TPU recast: a fixed-capacity prefix compaction built entirely from
cumsum + searchsorted + gather (no scatter anywhere, forward OR
backward), with the same overflow-drop semantics.

Why: the NeRF train step evaluates the network on (R, K) ray-window
samples of which only ~half are valid; every invalid sample still pays
full encoding-gather, MLP and (worst) hash-table scatter-backward cost.
Compacting to the valid prefix halves the whole network step.

The two gathers are custom-VJP pairs whose backward passes are ALSO
gathers (using the inverse map computed at trace time), because the
autodiff backward of a gather is a scatter — exactly the op this
module exists to avoid. This is exact: `src` is injective on kept
slots and `dest` is injective on kept samples, so the adjoint of each
gather is the gather along the inverse map.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompactionMaps(NamedTuple):
    """Index maps for a fixed-capacity valid-prefix compaction.

    src:  (Nc,) int32 — for compacted slot j, the source flat index
          (clamped; only meaningful for j < n_valid).
    dest: (M,) int32 — for source i, its compacted slot (clamped; only
          meaningful where kept).
    kept: (M,) bool — valid samples that fit in the capacity. Samples
          with valid=True but dest >= capacity are dropped (reference
          sample-buffer overflow drop).
    n_valid: () int32 — number of live compacted slots (≤ Nc).
    """

    src: jax.Array
    dest: jax.Array
    kept: jax.Array
    n_valid: jax.Array


def compaction_maps(valid: jax.Array, capacity: int) -> CompactionMaps:
    """Build compaction maps from a flat validity mask.

    valid: (M,) bool. capacity: static Nc.
    All vectorized: one cumsum + one searchsorted; no scatter.

    NB: searchsorted costs ~170 ns/query on v5e (log M gathers each) —
    for per-ray-prefix masks (the marcher's output) use
    prefix_compaction_maps instead, which builds `src` from one R-row
    scatter + a cummax (~10× cheaper at render/train sizes).
    """
    M = valid.shape[0]
    v = valid.astype(jnp.int32)
    cnt = jnp.cumsum(v)  # inclusive count of valid up to i
    dest = cnt - 1
    kept = valid & (dest < capacity)
    dest_c = jnp.clip(dest, 0, capacity - 1).astype(jnp.int32)
    # src[j] = index of the (j+1)-th valid sample = first i with cnt[i] == j+1
    j = jnp.arange(capacity, dtype=cnt.dtype)
    src = jnp.searchsorted(cnt, j + 1, side="left")
    src_c = jnp.clip(src, 0, M - 1).astype(jnp.int32)
    n_valid = jnp.minimum(cnt[-1], capacity)
    return CompactionMaps(src_c, dest_c, kept, n_valid)


def prefix_compaction_maps(n_valid: jax.Array, K: int, capacity: int) -> CompactionMaps:
    """Compaction maps for PER-RAY-PREFIX validity (the march layout):
    sample (r, k) is valid iff k < n_valid[r]; flat index i = r·K + k.

    Equivalent to compaction_maps(valid.reshape(-1), capacity) for such
    masks, but built CSR-style without searchsorted: the compacted slot
    of (r, k) is off[r] + k with off = exclusive-cumsum(n_valid), and
    the inverse ray-of-slot map comes from scattering each ray's start
    slot (R rows — tiny) and a cummax over capacity.
    """
    R = n_valid.shape[0]
    n = jnp.minimum(n_valid.astype(jnp.int32), K)
    cum = jnp.cumsum(n)
    off = cum - n  # (R,) exclusive offsets
    total = cum[-1]

    # dest/kept over the flat (R·K,) layout — pure VPU
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    dest2 = off[:, None] + k_iota
    kept2 = (k_iota < n[:, None]) & (dest2 < capacity)
    dest = jnp.clip(dest2, 0, capacity - 1).reshape(R * K)
    kept = kept2.reshape(R * K)

    # ray-of-slot: scatter each contributing ray's (start → ray+1),
    # then cummax fills the segment
    contrib = (n > 0) & (off < capacity)
    off_c = jnp.clip(off, 0, capacity - 1)
    r1 = jnp.where(contrib, jnp.arange(R, dtype=jnp.int32) + 1, 0)
    ray_start = jnp.zeros((capacity,), jnp.int32).at[off_c].max(r1)
    ray = jax.lax.cummax(ray_start) - 1  # (cap,) ray id per slot
    ray = jnp.clip(ray, 0, R - 1)
    src = ray * K + (jnp.arange(capacity, dtype=jnp.int32) - jnp.take(off, ray))
    src = jnp.clip(src, 0, R * K - 1)
    return CompactionMaps(src, dest, kept, jnp.minimum(total, capacity))


@partial(jax.custom_vjp, nondiff_argnums=())
def compact_gather(x, src, dest, kept):
    """y[j] = x[src[j]] — rows of x gathered to the compacted prefix.

    Backward is a gather by `dest` (masked by kept), not a scatter.
    """
    return jnp.take(x, src, axis=0)


def _compact_fwd(x, src, dest, kept):
    return jnp.take(x, src, axis=0), (src, dest, kept)


def _compact_bwd(res, g):
    src, dest, kept = res
    dx = jnp.take(g, dest, axis=0)
    mask = kept.reshape(kept.shape + (1,) * (dx.ndim - 1))
    dx = jnp.where(mask, dx, 0.0)
    zero = lambda a: jnp.zeros(a.shape, jax.dtypes.float0)
    return dx, zero(src), zero(dest), zero(kept)


compact_gather.defvjp(_compact_fwd, _compact_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def expand_gather(y, src, dest, kept, n_valid):
    """x[i] = y[dest[i]] for kept i, else 0 — compacted rows scattered
    back to their source positions, expressed as a gather.

    Backward is a gather by `src` (masked by slot liveness).
    """
    out = jnp.take(y, dest, axis=0)
    mask = kept.reshape(kept.shape + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, 0.0)


def _expand_fwd(y, src, dest, kept, n_valid):
    return expand_gather(y, src, dest, kept, n_valid), (y.shape[0], src, n_valid)


def _expand_bwd(res, g):
    nc, src, n_valid = res
    dy = jnp.take(g, src, axis=0)
    live = jnp.arange(nc) < n_valid
    mask = live.reshape(live.shape + (1,) * (dy.ndim - 1))
    dy = jnp.where(mask, dy, 0.0)
    M = g.shape[0]
    z_int = lambda shape: jnp.zeros(shape, jax.dtypes.float0)
    return dy, z_int((nc,)), z_int((M,)), z_int((M,)), z_int(())


expand_gather.defvjp(_expand_fwd, _expand_bwd)
