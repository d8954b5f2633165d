"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Exercises parallel/sharding.py's data-parallel train/render paths
(SURVEY.md §2.11-5: params + occupancy bitfield replicated, ray/pixel
batches sharded, gradient psum over the mesh) and asserts numerical
parity with the unsharded computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instant_ngp_tpu.parallel.mesh import make_mesh
from instant_ngp_tpu.parallel.sharding import (
    dp_render,
    dp_value_and_grad,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provision 8 CPU devices"
    return make_mesh(8)


def test_dp_value_and_grad_matches_unsharded(mesh):
    """psum-averaged DP grads == single-device grads on the same batch."""

    def loss_fn(params, batch):
        x, y = batch["x"], batch["y"]
        pred = jnp.tanh(x @ params["w"]) @ params["v"]
        return jnp.mean((pred - y) ** 2)

    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(key, (8, 16)) * 0.1,
        "v": jax.random.normal(jax.random.PRNGKey(1), (16, 4)) * 0.1,
    }
    batch = {
        "x": jax.random.normal(jax.random.PRNGKey(2), (64, 8)),
        "y": jax.random.normal(jax.random.PRNGKey(3), (64, 4)),
    }

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)

    params_r = replicate(params, mesh)
    batch_s = shard_batch(batch, mesh)
    dp_fn = dp_value_and_grad(loss_fn, mesh)
    loss, grads = jax.jit(dp_fn)(params_r, batch_s)

    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
    for k in ref_grads:
        np.testing.assert_allclose(grads[k], ref_grads[k], rtol=1e-4, atol=1e-6)


def test_shard_batch_layout(mesh):
    """shard_batch splits the leading axis across all 8 devices."""
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8 * 4, 1)
    xs = shard_batch(x, mesh)
    assert xs.sharding == NamedSharding(mesh, P("data"))
    assert len(xs.addressable_shards) == 8
    for shard in xs.addressable_shards:
        assert shard.data.shape == (4, 1)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_dp_render_matches_unsharded(mesh):
    """Pixel-sharded rendering reproduces the single-device render."""

    def render_fn(params, grid_bits, o, d):
        # stand-in renderer with the real signature: model state read by
        # every ray, per-ray outputs
        feat = jnp.sin(o @ params["m"]) + jnp.cos(d @ params["m"])
        rgb = feat[:, :3] * grid_bits.mean()
        alpha = jax.nn.sigmoid(feat[:, 3])
        depth = jnp.linalg.norm(o - d, axis=-1)
        return rgb, alpha, depth

    params = {"m": jax.random.normal(jax.random.PRNGKey(0), (3, 8))}
    grid = jnp.ones((4, 4, 4), jnp.float32) * 0.5
    o = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))

    ref = render_fn(params, grid, o, d)

    params_r = replicate(params, mesh)
    grid_r = replicate(grid, mesh)
    o_s, d_s = shard_batch((o, d), mesh)
    out = jax.jit(dp_render(render_fn, mesh))(params_r, grid_r, o_s, d_s)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_nerf_task_sharded_step_matches_unsharded():
    """Full NerfTask train step: mesh-sharded vs unsharded produce the
    same loss sequence (same PRNG stream, replicated state)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge
    from instant_ngp_tpu.nerf.task import NerfTask

    ds = ge._synthetic_dataset()
    kwargs = dict(n_rays_per_batch=64, max_samples_per_ray=4, n_march_iters=8)

    task_ref = NerfTask(ds, ge._tiny_nerf_config(), **kwargs)
    loss_ref = task_ref.train(2)

    task_dp = NerfTask(ds, ge._tiny_nerf_config(), **kwargs)
    mesh = make_mesh(8)
    task_dp.mesh = mesh
    task_dp.state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), task_dp.state
    )
    loss_dp = task_dp.train(2)

    np.testing.assert_allclose(loss_dp, loss_ref, rtol=1e-4, atol=1e-6)
