"""Compaction op: forward semantics + gather-based custom VJPs vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.compaction import (
    CompactionMaps,
    compact_gather,
    compaction_maps,
    expand_gather,
)


def _setup(M=64, capacity=24, seed=0, p=0.4):
    rng = np.random.default_rng(seed)
    valid = jnp.asarray(rng.random(M) < p)
    x = jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32))
    maps = compaction_maps(valid, capacity)
    return valid, x, maps


def test_maps_roundtrip():
    valid, x, m = _setup()
    n_valid = int(m.n_valid)
    assert n_valid == min(int(valid.sum()), 24)
    # src enumerates valid positions in order
    valid_pos = np.nonzero(np.asarray(valid))[0]
    np.testing.assert_array_equal(np.asarray(m.src)[:n_valid], valid_pos[:n_valid])
    # dest inverts src on kept samples
    for i in np.nonzero(np.asarray(m.kept))[0]:
        assert int(m.src[int(m.dest[i])]) == i


def test_overflow_drop():
    valid = jnp.ones(32, bool)
    m = compaction_maps(valid, 8)
    assert int(m.n_valid) == 8
    assert int(m.kept.sum()) == 8  # only the first 8 fit
    assert bool(m.kept[7]) and not bool(m.kept[8])


def test_compact_expand_forward():
    valid, x, m = _setup()
    xc = compact_gather(x, m.src, m.dest, m.kept)
    back = expand_gather(xc, m.src, m.dest, m.kept, m.n_valid)
    # kept rows roundtrip; dropped rows are zero
    np.testing.assert_allclose(
        np.asarray(back)[np.asarray(m.kept)], np.asarray(x)[np.asarray(m.kept)]
    )
    assert np.all(np.asarray(back)[~np.asarray(m.kept)] == 0)


def _reference_compact(x, m, capacity):
    # plain-JAX reference (autodiff through take/where builds scatters)
    return jnp.take(x, m.src, axis=0)


def test_compact_gather_vjp_matches_autodiff():
    valid, x, m = _setup()

    def f_custom(x):
        return jnp.sum(jnp.sin(compact_gather(x, m.src, m.dest, m.kept)) ** 2)

    def f_ref(x):
        xc = jnp.take(x, m.src, axis=0)
        # zero out dead slots exactly as the custom op's adjoint sees them
        live = (jnp.arange(xc.shape[0]) < m.n_valid)[:, None]
        return jnp.sum(jnp.where(live, jnp.sin(xc) ** 2, jnp.sin(xc) ** 2))

    g_custom = jax.grad(f_custom)(x)
    g_ref = jax.grad(f_ref)(x)
    # custom backward only differs on duplicated clamped slots beyond
    # n_valid; mask to kept sources for the comparison
    kept = np.asarray(m.kept)
    np.testing.assert_allclose(
        np.asarray(g_custom)[kept], np.asarray(g_ref)[kept], rtol=1e-6
    )
    # dropped/invalid sources get zero grad from the custom op
    assert np.all(np.asarray(g_custom)[~kept] == 0)


def test_expand_gather_vjp_matches_autodiff():
    valid, x, m = _setup()
    nc = m.src.shape[0]
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(nc, 4)).astype(np.float32))

    def f_custom(y):
        out = expand_gather(y, m.src, m.dest, m.kept, m.n_valid)
        return jnp.sum(out * jnp.arange(out.shape[0], dtype=jnp.float32)[:, None])

    def f_ref(y):
        out = jnp.where(
            m.kept[:, None], jnp.take(y, m.dest, axis=0), 0.0
        )
        return jnp.sum(out * jnp.arange(out.shape[0], dtype=jnp.float32)[:, None])

    g_custom = jax.grad(f_custom)(y)
    g_ref = jax.grad(f_ref)(y)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref), rtol=1e-6)


def test_end_to_end_model_equivalence():
    """Network-on-compacted == network-on-all-valid, values and grads."""
    valid, x, m = _setup(M=128, capacity=64, p=0.45)
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32) * 0.3)

    def dense_path(w):
        h = jnp.tanh(x @ w)  # (M,5)
        h = jnp.where(valid[:, None], h, 0.0)
        return jnp.sum(h**2)

    def compact_path(w):
        xc = compact_gather(x, m.src, m.dest, m.kept)
        hc = jnp.tanh(xc @ w)
        h = expand_gather(hc, m.src, m.dest, m.kept, m.n_valid)
        return jnp.sum(h**2)

    # capacity 64 >= n_valid here, so nothing is dropped
    assert int(m.n_valid) == int(valid.sum())
    v1, g1 = jax.value_and_grad(dense_path)(w)
    v2, g2 = jax.value_and_grad(compact_path)(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


class TestPrefixCompaction:
    def test_matches_generic_maps(self):
        """prefix_compaction_maps ≡ compaction_maps on per-ray-prefix
        masks (the march layout), for random n_valid and capacities."""
        import numpy as np
        from instant_ngp_tpu.ops.compaction import (
            compaction_maps,
            prefix_compaction_maps,
        )

        rng = np.random.default_rng(0)
        for R, K, cap in [(8, 4, 16), (16, 8, 64), (32, 8, 100), (7, 5, 12)]:
            n = jnp.asarray(rng.integers(0, K + 1, size=R), jnp.int32)
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, (R, K), 1) < n[:, None]
            )
            a = compaction_maps(valid.reshape(-1), cap)
            b = prefix_compaction_maps(n, K, cap)
            assert int(a.n_valid) == int(b.n_valid)
            np.testing.assert_array_equal(np.asarray(a.kept), np.asarray(b.kept))
            kept = np.asarray(a.kept)
            np.testing.assert_array_equal(
                np.asarray(a.dest)[kept], np.asarray(b.dest)[kept])
            nv = int(a.n_valid)
            np.testing.assert_array_equal(
                np.asarray(a.src)[:nv], np.asarray(b.src)[:nv])

    def test_zero_and_full(self):
        from instant_ngp_tpu.ops.compaction import prefix_compaction_maps

        m = prefix_compaction_maps(jnp.zeros(4, jnp.int32), 3, 8)
        assert int(m.n_valid) == 0 and not bool(m.kept.any())
        m = prefix_compaction_maps(jnp.full((4,), 3, jnp.int32), 3, 8)
        assert int(m.n_valid) == 8  # overflow clamped to capacity
