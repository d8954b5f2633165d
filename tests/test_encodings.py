"""Unit tests for input encodings against closed-form references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.ops.encodings import (
    Composite,
    Frequency,
    Identity,
    OneBlob,
    SphericalHarmonics,
    TriangleWave,
    encoding_from_config,
)
from instant_ngp_tpu.ops.hashgrid import GridEncoding


def test_identity():
    enc = Identity(3, scale=2.0, offset=1.0)
    x = jnp.array([[0.5, 0.25, 0.0]])
    np.testing.assert_allclose(enc(None, x), [[2.0, 1.5, 1.0]])


def test_sh_degree4_orthonormality():
    """SH basis functions should be orthonormal over the sphere
    (Monte-Carlo check)."""
    enc = SphericalHarmonics(degree=4)
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (200000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    feats = enc(None, (d + 1.0) * 0.5)  # warp to [0,1]
    gram = (feats.T @ feats) * (4.0 * np.pi / d.shape[0])
    np.testing.assert_allclose(np.asarray(gram), np.eye(16), atol=0.05)


def test_sh_constant_term():
    enc = SphericalHarmonics(degree=1)
    d = jnp.array([[0.2, 0.7, 0.9]])
    np.testing.assert_allclose(enc(None, d), [[0.28209479177387814]], rtol=1e-6)


def test_frequency_shapes_and_values():
    enc = Frequency(n_frequencies=4, n_dims_to_encode=2)
    assert enc.n_output_dims == 16
    x = jnp.array([[0.5, 0.25]])
    out = np.asarray(enc(None, x))
    # first pair for dim0: sin(0.5*pi), cos(0.5*pi)
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 4], 0.0, atol=1e-6)


def test_oneblob_partition_of_unity():
    enc = OneBlob(n_bins=16, n_dims_to_encode=1)
    x = jnp.linspace(0.1, 0.9, 7)[:, None]
    out = np.asarray(enc(None, x))
    assert out.shape == (7, 16)
    # integral of the kernel within [0,1] is ~1 away from the borders
    np.testing.assert_allclose(out.sum(-1), np.ones(7), atol=1e-3)
    # peak bin should be the bin containing x
    assert np.all(np.argmax(out, -1) == np.floor(np.asarray(x[:, 0]) * 16).astype(int))


def test_trianglewave_range():
    enc = TriangleWave(n_frequencies=3, n_dims_to_encode=1)
    x = jnp.linspace(0, 1, 33)[:, None]
    out = np.asarray(enc(None, x))
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_composite_from_config():
    cfg = {
        "otype": "Composite",
        "nested": [
            {"n_dims_to_encode": 3, "otype": "SphericalHarmonics", "degree": 4},
            {"otype": "Identity"},
        ],
    }
    enc = encoding_from_config(cfg, 6)
    assert enc.n_output_dims == 16 + 3
    x = jnp.ones((4, 6)) * 0.5
    out = enc(enc.init(jax.random.PRNGKey(0)), x)
    assert out.shape == (4, 19)


class TestGridEncoding:
    def test_shapes_and_level_sizes(self):
        enc = GridEncoding(
            n_dims=3, n_levels=16, n_features_per_level=2, log2_hashmap_size=19,
            base_resolution=16, per_level_scale=1.3819,
        )
        assert enc.n_output_dims == 32
        lv = enc.levels
        assert lv[0].resolution == 16
        assert not lv[0].hashed  # 16^3 < 2^19
        assert lv[-1].hashed
        assert all(l.size % 8 == 0 for l in lv)
        assert enc.n_entries == sum(l.size for l in lv)

    def test_dense_level_interpolation_matches_manual_trilerp(self):
        """A 1-level dense grid must reproduce manual trilinear interp."""
        enc = GridEncoding(
            n_dims=3, n_levels=1, n_features_per_level=1, log2_hashmap_size=19,
            base_resolution=4, per_level_scale=2.0, grid_type="dense",
        )
        res = enc.levels[0].resolution  # = 4
        key = jax.random.PRNGKey(1)
        params = jax.random.normal(key, (enc.n_entries, 1))
        x = jnp.array([[0.3, 0.6, 0.1]])
        out = np.asarray(enc(params, x))[0, 0]

        # manual trilerp: pos = x*scale + 0.5, scale = base-1 = 3
        scale = 3.0
        p = np.asarray(x[0]) * scale + 0.5
        f = np.floor(p).astype(int)
        t = p - f
        table = np.asarray(params[:, 0])
        acc = 0.0
        for c in range(8):
            b = [(c >> d) & 1 for d in range(3)]
            idx = (f[0] + b[0]) + (f[1] + b[1]) * res + (f[2] + b[2]) * res * res
            w = np.prod([t[d] if b[d] else 1 - t[d] for d in range(3)])
            acc += w * table[idx]
        np.testing.assert_allclose(out, acc, rtol=1e-5)

    def test_gradients_flow_to_table_and_position(self):
        enc = GridEncoding(n_dims=3, n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=10, base_resolution=4, per_level_scale=2.0)
        params = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

        def loss(p, xx):
            return jnp.sum(enc(p, xx) ** 2)

        g_p, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
        for leaf in jax.tree.leaves(g_p):
            assert np.isfinite(np.asarray(leaf)).all()
        assert sum(float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(g_p)) > 0
        assert np.abs(np.asarray(g_x)).max() > 0

    def test_custom_vjp_matches_autodiff_all_methods(self):
        """Whole-encoding custom VJP (splat dense + merge hashed) vs
        plain autodiff: table grads and position grads."""
        import dataclasses

        base = GridEncoding(n_dims=3, n_levels=6, n_features_per_level=2,
                            log2_hashmap_size=8, base_resolution=4,
                            per_level_scale=2.0, interpolation="smoothstep",
                            hashed_grad_corners=8)  # exact for parity
        params = base.init(jax.random.PRNGKey(0))
        # give tables real magnitude so dx is nontrivial
        params = jax.tree.map(lambda t: t * 1e3, params)
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01, maxval=0.99)
        cot = jax.random.normal(jax.random.PRNGKey(2), (64, base.n_output_dims))

        def run(enc):
            def loss(p, xx):
                return jnp.sum(enc(p, xx) * cot)
            return jax.grad(loss, argnums=(0, 1))(params, x)

        ref_p, ref_x = run(dataclasses.replace(base, grad_method="autodiff"))
        for method, tol in [("merge", 1e-5), ("xla", 1e-5), ("auto", 2e-2)]:
            got_p, got_x = run(dataclasses.replace(base, grad_method=method))
            for rl, gl in zip(jax.tree.leaves(ref_p), jax.tree.leaves(got_p)):
                rl, gl = np.asarray(rl), np.asarray(gl)
                scale = max(np.abs(rl).max(), 1e-6)
                np.testing.assert_allclose(gl / scale, rl / scale, atol=tol,
                                           err_msg=f"method={method}")
            np.testing.assert_allclose(
                np.asarray(got_x), np.asarray(ref_x), rtol=1e-3, atol=1e-4,
                err_msg=f"method={method} dx")

    def test_stochastic_corner_grad_unbiased(self):
        """hashed_grad_corners=1 gradient must equal the exact gradient
        in expectation over positions (unbiased estimator)."""
        import dataclasses

        base = GridEncoding(n_dims=3, n_levels=2, n_features_per_level=2,
                            log2_hashmap_size=4, base_resolution=16,
                            per_level_scale=2.0)
        assert base.levels[0].hashed  # tiny table → hashed at level 0
        sto = dataclasses.replace(base, hashed_grad_corners=1)
        params = jax.tree.map(lambda t: t * 1e3, base.init(jax.random.PRNGKey(0)))
        N = 4096

        def table_grad(enc, x):
            def loss(p):
                return jnp.sum(enc(p, x))
            return jax.grad(loss)(params)

        # many independent batches: stochastic mean → exact mean
        acc_exact = None
        acc_sto = None
        for i in range(30):
            x = jax.random.uniform(jax.random.PRNGKey(i), (N, 3))
            ge = table_grad(base, x)
            gs = table_grad(sto, x)
            add = lambda a, b: b if a is None else jax.tree.map(jnp.add, a, b)
            acc_exact = add(acc_exact, ge)
            acc_sto = add(acc_sto, gs)
        for e, s in zip(jax.tree.leaves(acc_exact), jax.tree.leaves(acc_sto)):
            e, s = np.asarray(e) / 30, np.asarray(s) / 30
            scale = np.abs(e).max() + 1e-9
            # Monte-Carlo noise with ~30·4096/16 draws per row
            assert np.abs(s - e).max() / scale < 0.15, np.abs(s - e).max() / scale

    def test_bricked_inference_matches_training_path(self):
        """encode_infer with dense-level bricks == the canonical path."""
        enc = GridEncoding(n_dims=3, n_levels=6, n_features_per_level=2,
                           log2_hashmap_size=12, base_resolution=4,
                           per_level_scale=2.0)
        assert any(not lv.hashed for lv in enc.levels)
        assert any(lv.hashed for lv in enc.levels)
        params = jax.tree.map(lambda t: t * 1e3, enc.init(jax.random.PRNGKey(0)))
        bricks = enc.build_bricks(params)
        assert sum(b is not None for b in bricks) == sum(
            not lv.hashed for lv in enc.levels)
        x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
        ref = np.asarray(enc(params, x))
        fast = np.asarray(enc.encode_infer(params, x, bricks=bricks))
        # bricks are stored bf16 (inference fast path; gather-width
        # economics, see build_bricks) → bf16-relative tolerance on the
        # dense levels; hashed levels stay exact f32
        scale = np.abs(ref).max()
        np.testing.assert_allclose(fast, ref, rtol=1e-2, atol=scale * 2**-8)
        hashed_cols = np.concatenate(
            [[lv.hashed] * enc.n_features_per_level for lv in enc.levels])
        np.testing.assert_allclose(
            fast[:, hashed_cols], ref[:, hashed_cols], rtol=1e-5, atol=1e-5)

    def test_max_level_masks_fine_levels(self):
        enc = GridEncoding(n_dims=2, n_levels=4, n_features_per_level=2,
                           log2_hashmap_size=12, base_resolution=4, per_level_scale=2.0)
        params = jax.tree.map(lambda t: t + 1.0, enc.init(jax.random.PRNGKey(0)))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2))
        out = np.asarray(enc(params, x, max_level=0.5))
        assert np.abs(out[:, :4]).max() > 0  # levels 0-1 active
        np.testing.assert_allclose(out[:, 4:], 0.0)  # levels 2-3 masked

    def test_hash_wraps_uint32(self):
        """Hashed indices must stay within the level size."""
        enc = GridEncoding(n_dims=3, n_levels=8, n_features_per_level=2,
                           log2_hashmap_size=14, base_resolution=16, per_level_scale=1.5)
        x = jax.random.uniform(jax.random.PRNGKey(3), (128, 3))
        idx, w = enc.corner_indices_and_weights(x)
        idx = np.asarray(idx)
        assert idx.min() >= 0 and idx.max() < enc.n_entries
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)

    def test_smoothstep_interpolation(self):
        enc = GridEncoding(n_dims=2, n_levels=1, n_features_per_level=1,
                           log2_hashmap_size=12, base_resolution=4,
                           per_level_scale=2.0, interpolation="smoothstep",
                           grid_type="dense")
        params = enc.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
        out = enc(params, x)
        assert out.shape == (16, 1)


class TestGatherInterpVjp:
    def test_custom_vjp_matches_autodiff(self):
        from instant_ngp_tpu.ops.hashgrid import gather_interp

        key = jax.random.PRNGKey(0)
        T, F, C, N = 97, 4, 8, 33
        params = jax.random.normal(key, (T, F))
        idx = jax.random.randint(jax.random.PRNGKey(1), (C, N), 0, T)
        w = jax.random.uniform(jax.random.PRNGKey(2), (C, N))

        def ref(params, w):
            feats = jnp.take(params, idx.reshape(-1), axis=0).reshape(C, N, F)
            return jnp.sum(jnp.einsum("cn,cnf->nf", w, feats) ** 2)

        def ours(params, w):
            return jnp.sum(gather_interp(params, idx, w) ** 2)

        np.testing.assert_allclose(
            np.asarray(ref(params, w)), np.asarray(ours(params, w)), rtol=1e-5
        )
        g_ref = jax.grad(ref, argnums=(0, 1))(params, w)
        g_ours = jax.grad(ours, argnums=(0, 1))(params, w)
        np.testing.assert_allclose(np.asarray(g_ref[0]), np.asarray(g_ours[0]), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_ref[1]), np.asarray(g_ours[1]), rtol=1e-4, atol=1e-6)


class TestPallasMLP:
    def test_fused_mlp_matches_reference(self):
        """Pallas fused MLP (interpret mode on CPU) vs plain forward."""
        from instant_ngp_tpu.ops.pallas import mlp_kernel as mk

        key = jax.random.PRNGKey(0)
        ws = [
            jax.random.normal(jax.random.PRNGKey(1), (32, 64)) * 0.1,
            jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 0.1,
            jax.random.normal(jax.random.PRNGKey(3), (64, 16)) * 0.1,
        ]
        x = jax.random.normal(key, (512, 32))
        import unittest.mock as mock
        from jax.experimental import pallas as pl

        orig = pl.pallas_call

        def interp_call(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        with mock.patch.object(pl, "pallas_call", interp_call):
            out = mk.fused_mlp(ws, x, "relu", "none")
        ref = mk._reference_forward(ws, x, "relu", "none")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

        # backward (falls back to autodiff of the reference)
        g1 = jax.grad(lambda w: jnp.sum(mk._reference_forward(w, x, "relu", "none") ** 2))(ws)
        with mock.patch.object(pl, "pallas_call", interp_call):
            g2 = jax.grad(lambda w: jnp.sum(mk.fused_mlp(w, x, "relu", "none") ** 2))(ws)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
