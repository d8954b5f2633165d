"""Tests for the 4-corner simplex grid interpolation (TPU-first
encoding variant; ops/hashgrid.py _simplex_corners).

Checks: barycentric weight properties, agreement with an independent
numpy reference implementation, C0 continuity across cell and tet
boundaries, custom-VJP parity vs autodiff, and analytic position
gradients vs finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.hashgrid import (
    GridEncoding,
    _corner_setup,
    _level_corners,
    _simplex_corners,
)

PRIMES = (1, 2654435761, 805459861)


def np_simplex_encode(table, x, scale, size, F):
    """Independent numpy reference of the Freudenthal simplex interp
    with tcnn hashing."""
    out = np.zeros((x.shape[0], F), np.float32)
    for n, p in enumerate(x):
        pos = p * scale + 0.5
        base = np.floor(pos).astype(np.int64)
        t = pos - base
        order = np.argsort(-t, kind="stable")  # descending
        corners = [np.zeros(3, np.int64)]
        acc = np.zeros(3, np.int64)
        for d in order[:2]:
            acc = acc.copy()
            acc[d] = 1
            corners.append(acc)
        corners.append(np.ones(3, np.int64))
        ts = t[order]
        ws = [1.0 - ts[0], ts[0] - ts[1], ts[1] - ts[2], ts[2]]
        for c, w in zip(corners, ws):
            h = np.uint32(0)
            for d in range(3):
                h ^= np.uint32((base[d] + c[d]) & 0xFFFFFFFF) * np.uint32(PRIMES[d])
            out[n] += w * table[int(h % np.uint32(size))]
    return out


def _hashed_enc(**kw):
    # base_resolution 64 with a 4096-entry table → level 0 is hashed
    kw.setdefault("n_levels", 1)
    kw.setdefault("n_features_per_level", 2)
    kw.setdefault("log2_hashmap_size", 12)
    kw.setdefault("base_resolution", 64)
    kw.setdefault("interpolation", "simplex")
    return GridEncoding(**kw)


class TestSimplexWeights:
    def test_weights_sum_and_range(self):
        enc = _hashed_enc()
        op = enc._level_op(enc.levels[0])
        assert enc.levels[0].hashed
        x = jax.random.uniform(jax.random.PRNGKey(0), (512, 3))
        grid, t, _ = _corner_setup(op, x)
        idx, w, aux = _level_corners(op, grid, t)
        assert idx.shape == (4, 512) and w.shape == (4, 512)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, 0)), 1.0, atol=1e-5)
        assert float(jnp.min(w)) >= -1e-6

    def test_matches_numpy_reference(self):
        enc = _hashed_enc()
        lv = enc.levels[0]
        op = enc._level_op(lv)
        key = jax.random.PRNGKey(1)
        table = jax.random.normal(key, (lv.size, 2))
        x = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
        out = enc((table,), x)
        ref = np_simplex_encode(np.asarray(table), np.asarray(x),
                                np.float32(op.scale), lv.size, 2)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)

    def test_continuity(self):
        """Encoding is C0: probing pairs of points eps apart across
        random directions (including cell/tet boundaries) gives small
        deltas proportional to eps·scale."""
        enc = _hashed_enc()
        lv = enc.levels[0]
        table = jax.random.normal(jax.random.PRNGKey(3), (lv.size, 2))
        x = jax.random.uniform(jax.random.PRNGKey(4), (2048, 3))
        eps = 1e-5
        d = jax.random.normal(jax.random.PRNGKey(5), (2048, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        a = enc((table,), x)
        b = enc((table,), x + eps * d)
        # feature Lipschitz bound ~ scale · max|feat diff across corners|
        delta = float(jnp.max(jnp.abs(a - b)))
        assert delta < 64.0 * eps * 8.0 * float(jnp.max(jnp.abs(table)))

    def test_all_equal_fracs_degenerate(self):
        enc = _hashed_enc()
        op = enc._level_op(enc.levels[0])
        # positions exactly on the cell diagonal → t components equal
        x = jnp.array([[0.25, 0.25, 0.25], [0.5, 0.5, 0.5]])
        grid, t, _ = _corner_setup(op, x)
        idx, w, aux = _level_corners(op, grid, t)
        np.testing.assert_allclose(np.asarray(jnp.sum(w, 0)), 1.0, atol=1e-5)
        # middle weights are 0 on the diagonal
        np.testing.assert_allclose(np.asarray(w[1]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[2]), 0.0, atol=1e-5)


class TestSimplexGradients:
    def _enc_pair(self):
        exact = _hashed_enc(grad_method="merge", hashed_grad_corners=8)
        auto = _hashed_enc(grad_method="autodiff", hashed_grad_corners=8)
        return exact, auto

    def test_vjp_matches_autodiff(self):
        exact, auto = self._enc_pair()
        lv = exact.levels[0]
        table = jax.random.normal(jax.random.PRNGKey(6), (lv.size, 2))
        x = jax.random.uniform(jax.random.PRNGKey(7), (256, 3))

        def loss(enc, tab, xx):
            out = enc((tab,), xx)
            return jnp.sum(jnp.sin(out * 3.0))

        g_exact = jax.grad(lambda tab: loss(exact, tab, x))(table)
        g_auto = jax.grad(lambda tab: loss(auto, tab, x))(table)
        np.testing.assert_allclose(
            np.asarray(g_exact), np.asarray(g_auto), rtol=1e-4, atol=1e-5
        )

    def test_dx_matches_autodiff(self):
        exact, auto = self._enc_pair()
        lv = exact.levels[0]
        table = jax.random.normal(jax.random.PRNGKey(8), (lv.size, 2))
        # keep away from cell faces / tet boundaries (non-differentiable)
        x0 = jax.random.uniform(jax.random.PRNGKey(9), (128, 3))

        def loss(enc, xx):
            return jnp.sum(jnp.cos(enc((table,), xx)))

        gx_exact = jax.grad(lambda xx: loss(exact, xx))(x0)
        gx_auto = jax.grad(lambda xx: loss(auto, xx))(x0)
        # mask out samples near any non-differentiability: a frac pair
        # closer than 1e-3 or a frac within 1e-3 of 0/1
        op = exact._level_op(lv)
        _, t, _ = _corner_setup(op, x0)
        t = np.asarray(t)
        safe = np.ones(len(t), bool)
        for i in range(3):
            safe &= (t[:, i] > 1e-3) & (t[:, i] < 1 - 1e-3)
            for j in range(i + 1, 3):
                safe &= np.abs(t[:, i] - t[:, j]) > 1e-3
        assert safe.sum() > 50
        np.testing.assert_allclose(
            np.asarray(gx_exact)[safe], np.asarray(gx_auto)[safe],
            rtol=1e-3, atol=1e-4,
        )

    def test_stochastic_corner_unbiased(self):
        """Average of many stochastic single-corner gradients ≈ the
        exact gradient (the estimator picks corner c with prob w_c)."""
        lv_exact = _hashed_enc(grad_method="merge", hashed_grad_corners=8)
        lv_sto = _hashed_enc(grad_method="auto", hashed_grad_corners=1)
        lv = lv_exact.levels[0]
        table = jax.random.normal(jax.random.PRNGKey(10), (lv.size, 2))

        def g_of(enc, xx):
            return jax.grad(lambda tab: jnp.sum(enc((tab,), xx)))(table)

        reps = 64
        acc = np.zeros_like(np.asarray(table))
        g_ex_acc = np.zeros_like(acc)
        for r in range(reps):
            x = jax.random.uniform(jax.random.PRNGKey(100 + r), (512, 3))
            acc += np.asarray(g_of(lv_sto, x))
            g_ex_acc += np.asarray(g_of(lv_exact, x))
        # compare total accumulated mass row-normalized
        num = np.abs(acc - g_ex_acc).sum()
        den = np.abs(g_ex_acc).sum() + 1e-9
        assert num / den < 0.25  # unbiased estimator, reps-averaged


class TestSimplexInNetwork:
    def test_nerf_shapes_and_grad(self):
        """A multi-level simplex encoding runs through dense+hashed
        levels (dense stay trilinear) and produces finite grads."""
        enc = GridEncoding(
            n_levels=4, n_features_per_level=2, log2_hashmap_size=12,
            base_resolution=4, per_level_scale=4.0, interpolation="simplex",
        )
        assert not enc.levels[0].hashed and enc.levels[-1].hashed
        params = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        out = enc(params, x)
        assert out.shape == (64, 8)
        g = jax.grad(lambda p: jnp.sum(enc(p, x) ** 2))(params)
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()


class TestMultiDrawStochastic:
    def test_two_draw_unbiased(self):
        """k=2 stochastic draws average to the exact gradient like k=1
        but with lower variance."""
        exact = _hashed_enc(grad_method="merge", hashed_grad_corners=8)
        sto1 = _hashed_enc(grad_method="auto", hashed_grad_corners=1)
        sto2 = _hashed_enc(grad_method="auto", hashed_grad_corners=2)
        lv = exact.levels[0]
        table = jax.random.normal(jax.random.PRNGKey(10), (lv.size, 2))

        def g_of(enc, xx):
            return jax.grad(lambda tab: jnp.sum(enc((tab,), xx)))(table)

        reps = 48
        err = {}
        for enc, name in ((sto1, "k1"), (sto2, "k2")):
            acc = np.zeros_like(np.asarray(table))
            gex = np.zeros_like(acc)
            for r in range(reps):
                x = jax.random.uniform(jax.random.PRNGKey(500 + r), (512, 3))
                acc += np.asarray(g_of(enc, x))
                gex += np.asarray(g_of(exact, x))
            err[name] = np.abs(acc - gex).sum() / (np.abs(gex).sum() + 1e-9)
        assert err["k2"] < 0.25
        # 2 draws should estimate no worse than 1 (usually ~1/sqrt2)
        assert err["k2"] < err["k1"] * 1.1
