"""Baked sparse-cell render cache (nerf/baked.py): correctness of the
packed-record query against the live model, and the baked render path.
Tiny synthetic scene on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as g


@pytest.fixture(scope="module")
def trained_task():
    from instant_ngp_tpu.nerf.task import NerfTask

    ds = g._synthetic_dataset(n_images=2, w=16, h=16)
    task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                    max_samples_per_ray=4, n_march_iters=8)
    task.train(40)  # crosses two grid updates → non-empty bitfield
    return task


class TestBakedCache:
    def test_bake_produces_rows(self, trained_task):
        cache = trained_task.bake(res0=128)
        assert cache.n_rows > 0
        assert cache.table.shape[1] == 32
        assert cache.table.dtype == jnp.bfloat16
        # index entries cover exactly n_rows rows
        idx = np.asarray(cache.index)
        assert (idx >= -1).all() and idx.max() == cache.n_rows - 1
        assert (idx >= 0).sum() == cache.n_rows

    def test_query_matches_model_at_corners(self, trained_task):
        """Trilinear at a cell's corner == that corner's record == the
        live model evaluated there with the bake direction (up to bf16
        storage)."""
        from instant_ngp_tpu.common import (network_to_density,
                                            network_to_rgb, warp_direction)
        from instant_ngp_tpu.nerf import baked

        task = trained_task
        cache = task.bake(res0=128)
        idx = np.asarray(cache.index)
        n0 = int(np.asarray(cache.res)[0])
        occupied = np.nonzero(idx[: n0 ** 3] >= 0)[0][:16]  # mip-0 cells
        cells = np.stack(np.unravel_index(occupied, (n0, n0, n0)), -1)
        # corner 0 world position of each cell (mip 0: world == cascade)
        pos = cells.astype(np.float32) / n0
        out = np.asarray(baked.query(cache, jnp.asarray(pos)))

        params = task.opt.inference_params(task.state.opt_state,
                                           task.state.params)
        pos_w = (pos - task.aabb_min) / (task.aabb_max - task.aabb_min)
        d = np.broadcast_to(baked.FIXED_BAKE_DIR, pos.shape)
        raw = np.asarray(task.model(params, jnp.asarray(pos_w),
                                    jnp.asarray(warp_direction(d))))
        rgb = np.asarray(network_to_rgb(jnp.asarray(raw[:, :3]),
                                        task.rgb_activation))
        sigma = np.asarray(network_to_density(jnp.asarray(raw[:, 3]),
                                              task.density_activation))
        np.testing.assert_allclose(out[:, :3], rgb, atol=0.02)
        np.testing.assert_allclose(out[:, 3], sigma,
                                   rtol=0.02, atol=1e-2)

    def test_query_zero_outside_occupancy(self, trained_task):
        from instant_ngp_tpu.nerf import baked

        cache = trained_task.bake(res0=128)
        idx = np.asarray(cache.index)
        n0 = int(np.asarray(cache.res)[0])
        empty = np.nonzero(idx[: n0 ** 3] < 0)[0][:8]
        cells = np.stack(np.unravel_index(empty, (n0, n0, n0)), -1)
        pos = (cells.astype(np.float32) + 0.5) / n0  # cell centers
        out = np.asarray(baked.query(cache, jnp.asarray(pos)))
        np.testing.assert_array_equal(out, 0.0)

    def test_baked_render_close_to_exact(self, trained_task):
        task = trained_task
        cam = np.asarray(task.dataset.xforms_start[0])
        exact = task.render(16, 16, cam, fov=45.0)
        bakedf = task.render(16, 16, cam, fov=45.0, render_quality="baked")
        assert bakedf.shape == exact.shape
        assert np.isfinite(bakedf).all()
        assert np.mean(np.abs(bakedf - exact)) < 0.25

    def test_per_frame_bake_cached(self, trained_task):
        task = trained_task
        task._baked_cache = None
        c1 = task._get_baked(origin=np.zeros(3))
        c2 = task._get_baked(origin=np.zeros(3))
        assert c1 is c2  # same step + origin → no rebake
        c3 = task._get_baked(origin=np.ones(3))
        assert c3 is not c2
