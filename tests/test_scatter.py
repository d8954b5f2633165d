"""Scatter-free reductions (ops/scatter.py) vs numpy ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.scatter import (
    scatter_add_merge,
    scatter_add_xla,
    splat_dense,
)


def _np_scatter(idx, vals, size):
    out = np.zeros((size, vals.shape[-1]), np.float64)
    np.add.at(out, idx, vals.astype(np.float64))
    return out.astype(np.float32)


@pytest.mark.parametrize("B,S,F", [(257, 64, 2), (1024, 128, 1), (511, 33, 4)])
def test_scatter_add_merge_matches_numpy(B, S, F):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, S, B).astype(np.int32)
    vals = rng.normal(size=(B, F)).astype(np.float32)
    out = np.asarray(scatter_add_merge(jnp.asarray(idx), jnp.asarray(vals), S))
    ref = _np_scatter(idx, vals, S)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_scatter_add_merge_heavy_collisions():
    rng = np.random.default_rng(1)
    B, S, F = 2048, 8, 2
    idx = rng.integers(0, S, B).astype(np.int32)
    vals = rng.normal(size=(B, F)).astype(np.float32)
    out = np.asarray(scatter_add_merge(jnp.asarray(idx), jnp.asarray(vals), S))
    ref = _np_scatter(idx, vals, S)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_scatter_add_merge_empty_rows_and_batch():
    rng = np.random.default_rng(2)
    L, B, S, F = 3, 200, 97, 2
    idx = rng.integers(0, 40, (L, B)).astype(np.int32)  # rows 40.. untouched
    vals = rng.normal(size=(L, B, F)).astype(np.float32)
    out = np.asarray(scatter_add_merge(jnp.asarray(idx), jnp.asarray(vals), S))
    assert out.shape == (L, S, F)
    for l in range(L):
        ref = _np_scatter(idx[l], vals[l], S)
        np.testing.assert_allclose(out[l], ref, rtol=1e-5, atol=1e-5)
    assert np.all(out[:, 40:] == 0)


def test_scatter_add_xla_matches_numpy():
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 50, 300).astype(np.int32)
    vals = rng.normal(size=(300, 2)).astype(np.float32)
    out = np.asarray(scatter_add_xla(jnp.asarray(idx), jnp.asarray(vals), 50))
    np.testing.assert_allclose(out, _np_scatter(idx, vals, 50), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D,R", [(3, 8), (3, 5), (2, 16)])
def test_splat_dense_matches_scatter(D, R):
    """Separable splat == brute-force corner scatter, including the
    corner-coordinate == R wraparound (% size) behavior."""
    rng = np.random.default_rng(4)
    N, F = 400, 2
    size = ((R**D + 7) // 8) * 8  # next multiple of 8, like GridLevelSpec
    grid = rng.integers(0, R, (N, D)).astype(np.int32)  # floor coords ≤ R-1
    t = rng.random((N, D)).astype(np.float32)
    g = rng.normal(size=(N, F)).astype(np.float32)

    # brute force: all 2^D corners through the dense index formula
    ref = np.zeros((size, F), np.float64)
    for c in range(1 << D):
        bits = [(c >> d) & 1 for d in range(D)]
        w = np.ones(N)
        flat = np.zeros(N, np.int64)
        for d in range(D):
            w = w * (t[:, d] if bits[d] else 1 - t[:, d])
            flat += (grid[:, d] + bits[d]).astype(np.int64) * R**d
        np.add.at(ref, flat % size, w[:, None] * g)

    out = np.asarray(
        splat_dense(jnp.asarray(grid), jnp.asarray(t), jnp.asarray(g), R, size,
                    compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(out, ref.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_splat_dense_bf16_close():
    rng = np.random.default_rng(5)
    N, D, R, F = 1000, 3, 16, 2
    size = ((R**D + 7) // 8) * 8
    grid = rng.integers(0, R, (N, D)).astype(np.int32)
    t = rng.random((N, D)).astype(np.float32)
    g = rng.normal(size=(N, F)).astype(np.float32)
    exact = np.asarray(
        splat_dense(jnp.asarray(grid), jnp.asarray(t), jnp.asarray(g), R, size,
                    compute_dtype=jnp.float32)
    )
    fast = np.asarray(
        splat_dense(jnp.asarray(grid), jnp.asarray(t), jnp.asarray(g), R, size,
                    compute_dtype=jnp.bfloat16)
    )
    # bf16 operand rounding: ~0.4% of the gradient's scale; pointwise
    # relative error is unbounded where runs cancel to ~0, so compare
    # absolute error against the gradient RMS (what SGD cares about).
    rms = np.sqrt(np.mean(exact**2))
    assert np.max(np.abs(fast - exact)) < 0.05 * rms * 10
    assert np.sqrt(np.mean((fast - exact) ** 2)) < 0.02 * rms
