"""Tests for MLP, losses, optimizers, config loading, model composition."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.common import LossType
from instant_ngp_tpu.config import load_network_config, loads_json_with_comments
from instant_ngp_tpu.models.nerf_network import NerfNetwork
from instant_ngp_tpu.models.network import NetworkWithInputEncoding
from instant_ngp_tpu.ops.losses import loss_fn, loss_type_from_string
from instant_ngp_tpu.ops.mlp import MLP
from instant_ngp_tpu.ops.optimizers import Optimizer, OptimizerSpec


class TestMLP:
    def test_layer_sizes(self):
        mlp = MLP(32, 16, n_neurons=64, n_hidden_layers=1)
        assert mlp.layer_sizes == ((32, 64), (64, 16))
        mlp0 = MLP(32, 16, n_neurons=64, n_hidden_layers=0)
        assert mlp0.layer_sizes == ((32, 16),)

    def test_forward_matches_numpy(self):
        mlp = MLP(8, 4, n_neurons=16, n_hidden_layers=2, activation="ReLU")
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
        out = np.asarray(mlp(params, x, compute_dtype=jnp.float32))
        h = np.asarray(x)
        ws = [np.asarray(w) for w in params]
        for i, w in enumerate(ws):
            h = h @ w
            if i < len(ws) - 1:
                h = np.maximum(h, 0)
        np.testing.assert_allclose(out, h, rtol=1e-4)

    def test_bf16_close_to_fp32(self):
        mlp = MLP(32, 16, n_neurons=64, n_hidden_layers=2)
        params = mlp.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 32))
        a = np.asarray(mlp(params, x, compute_dtype=jnp.float32))
        b = np.asarray(mlp(params, x, compute_dtype=jnp.bfloat16), dtype=np.float32)
        assert np.abs(a - b).max() < 0.15


class TestLosses:
    def test_huber_matches_reference_formula(self):
        f = loss_fn(LossType.HUBER)
        t = jnp.array([0.0])
        # quadratic region: 0.5/alpha d^2 / 5 with alpha=0.1
        np.testing.assert_allclose(f(t, jnp.array([0.05])), 0.5 / 0.1 * 0.05**2 / 5, rtol=1e-6)
        # linear region: (|d| - alpha/2)/5
        np.testing.assert_allclose(f(t, jnp.array([0.5])), (0.5 - 0.05) / 5, rtol=1e-6)

    def test_l2_relative_l2(self):
        np.testing.assert_allclose(
            loss_fn(LossType.L2)(jnp.array([1.0]), jnp.array([3.0])), 4.0
        )
        np.testing.assert_allclose(
            loss_fn(LossType.RELATIVE_L2)(jnp.array([1.0]), jnp.array([3.0])),
            4.0 / (9.0 + 1e-2),
            rtol=1e-6,
        )

    def test_string_parse(self):
        assert loss_type_from_string("Huber") == LossType.HUBER
        assert loss_type_from_string("RelativeL2") == LossType.RELATIVE_L2


class TestOptimizer:
    def test_spec_from_nested_config(self):
        cfg = {
            "otype": "Ema", "decay": 0.95,
            "nested": {
                "otype": "ExponentialDecay", "decay_start": 20000,
                "decay_interval": 10000, "decay_base": 0.33,
                "nested": {"otype": "Adam", "learning_rate": 1e-2,
                           "beta1": 0.9, "beta2": 0.99, "epsilon": 1e-15,
                           "l2_reg": 1e-6},
            },
        }
        spec = OptimizerSpec.from_config(cfg)
        assert spec.ema_decay == 0.95
        assert spec.decay_start == 20000
        assert spec.epsilon == 1e-15
        assert spec.learning_rate == 1e-2

    def test_adam_converges_quadratic(self):
        spec = OptimizerSpec(learning_rate=0.1, epsilon=1e-15)
        opt = Optimizer(spec)
        params = {"w": jnp.array([5.0, -3.0])}
        state = opt.init(params)
        for _ in range(200):
            grads = {"w": 2.0 * params["w"]}
            params, state = opt.update(grads, state, params)
        assert np.abs(np.asarray(params["w"])).max() < 1e-2

    def test_lr_schedule(self):
        spec = OptimizerSpec(learning_rate=1.0, decay_start=100, decay_interval=50, decay_base=0.5)
        opt = Optimizer(spec)
        np.testing.assert_allclose(opt.learning_rate_at(0), 1.0)
        np.testing.assert_allclose(opt.learning_rate_at(99), 1.0)
        np.testing.assert_allclose(opt.learning_rate_at(100), 0.5)
        np.testing.assert_allclose(opt.learning_rate_at(150), 0.25)

    def test_ema_inference_params(self):
        spec = OptimizerSpec(learning_rate=0.0, ema_decay=0.5)
        opt = Optimizer(spec)
        params = {"w": jnp.array([1.0])}
        state = opt.init(params)
        params, state = opt.update({"w": jnp.array([0.0])}, state, params)
        inf = opt.inference_params(state, params)
        np.testing.assert_allclose(inf["w"], 1.0)  # lr=0 → params unchanged


class TestConfig:
    def test_comments_stripped(self):
        text = '{"a": 1, // comment\n "b": "http://x" }'
        assert loads_json_with_comments(text) == {"a": 1, "b": "http://x"}

    def test_parent_inheritance(self, tmp_path):
        (tmp_path / "parent.json").write_text(json.dumps({"a": 1, "enc": {"x": 1, "y": 2}}))
        (tmp_path / "child.json").write_text(
            json.dumps({"parent": "parent.json", "enc": {"y": 3}})
        )
        cfg = load_network_config(tmp_path / "child.json")
        assert cfg == {"a": 1, "enc": {"x": 1, "y": 3}}

    def test_shipped_configs_load(self):
        for mode in ("nerf", "sdf", "image", "volume"):
            cfg = load_network_config("base.json", mode=mode)
            assert "optimizer" in cfg and "encoding" in cfg


class TestModels:
    def test_network_with_input_encoding(self):
        cfg = load_network_config("base.json", mode="image")
        model = NetworkWithInputEncoding.from_config(cfg, n_input_dims=2, n_output_dims=3)
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (17, 2))
        out = model(params, x)
        assert out.shape == (17, 3)

    def test_nerf_network_shapes(self):
        cfg = load_network_config("base.json", mode="nerf")
        model = NerfNetwork.from_config(cfg)
        params = model.init(jax.random.PRNGKey(0))
        pos = jax.random.uniform(jax.random.PRNGKey(1), (33, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(2), (33, 3))
        out = model(params, pos, dirs)
        assert out.shape == (33, 4)
        d = model.density(params, pos)
        assert d.shape == (33, 16)
        # density channel consistent between paths
        np.testing.assert_allclose(
            np.asarray(out[:, 3], np.float32), np.asarray(d[:, 0], np.float32), rtol=1e-2, atol=1e-2
        )

    def test_nerf_network_grads(self):
        cfg = load_network_config("base.json", mode="nerf")
        model = NerfNetwork.from_config(cfg)
        params = model.init(jax.random.PRNGKey(0))

        def loss(p):
            pos = jnp.full((8, 3), 0.4)
            dirs = jnp.full((8, 3), 0.6)
            return jnp.sum(model(p, pos, dirs).astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(params)
        flat, _ = jax.tree.flatten(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


class TestSobol:
    def test_sobol_elementary_intervals(self):
        """The first 256 Sobol points put exactly 16 in each cell of a
        4x4 grid (the (0,2)-sequence elementary-interval property)."""
        import jax.numpy as jnp
        import numpy as np

        from instant_ngp_tpu.image_fit.task import sobol2d

        x0, x1 = sobol2d(jnp.arange(256))
        x0, x1 = np.asarray(x0), np.asarray(x1)
        assert ((x0 >= 0) & (x0 < 1)).all() and ((x1 >= 0) & (x1 < 1)).all()
        hist, _, _ = np.histogram2d(x0, x1, bins=4, range=[[0, 1], [0, 1]])
        np.testing.assert_array_equal(hist, np.full((4, 4), 16))

    def test_sobol_sampler_mode_runs(self):
        import numpy as np

        from instant_ngp_tpu.config import load_network_config
        from instant_ngp_tpu.image_fit.task import ImageTask

        img = np.random.default_rng(0).random((16, 16, 4)).astype(np.float32)
        cfg = load_network_config("base.json", mode="image")
        task = ImageTask(img, True, cfg, batch_size=1024, random_mode="sobol")
        loss = task.train(2)
        assert np.isfinite(loss)
