"""NeRF feature tests: camera optimization, envmap, error map, extra
dims — tiny synthetic scenes on CPU."""

import numpy as np
import pytest

import __graft_entry__ as g


def make_task(**kw):
    import jax

    from instant_ngp_tpu.nerf.task import NerfTask

    ds = g._synthetic_dataset(n_images=2, w=16, h=16)
    defaults = dict(n_rays_per_batch=64, max_samples_per_ray=4, n_march_iters=8)
    defaults.update(kw)
    return NerfTask(ds, g._tiny_nerf_config(), **defaults)


class TestCamOpt:
    def test_extrinsics_optimization_changes_offsets(self):
        task = make_task(optimize_extrinsics=True, use_error_map=False)
        task.train(3)
        rot = np.asarray(task.state.cam["rot"])
        pos = np.asarray(task.state.cam["pos"])
        assert np.isfinite(rot).all() and np.isfinite(pos).all()
        assert np.abs(rot).max() > 0 or np.abs(pos).max() > 0

    def test_exposure_and_focal(self):
        task = make_task(
            optimize_exposure=True, optimize_focal_length=True, use_error_map=False
        )
        task.train(3)
        assert np.isfinite(np.asarray(task.state.cam["exposure"])).all()
        assert np.isfinite(np.asarray(task.state.cam["focal"])).all()

    def test_envmap_training(self):
        task = make_task(train_envmap=True, use_error_map=False,
                         envmap_resolution=(8, 16))
        task.train(3)
        env = np.asarray(task.state.cam["envmap"])
        assert env.shape == (8, 16, 4)
        assert np.isfinite(env).all()
        assert np.abs(env).max() > 0  # received gradients

    def test_distortion_map(self):
        task = make_task(optimize_distortion=True, use_error_map=False)
        task.train(3)
        dist = np.asarray(task.state.cam["distortion"])
        assert dist.shape == (32, 32, 2)
        assert np.isfinite(dist).all()

    def test_extra_dims(self):
        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        ds.n_extra_learnable_dims = 4
        import jax

        from instant_ngp_tpu.nerf.task import NerfTask

        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8, use_error_map=False)
        before = np.asarray(task.state.cam["extra"]).copy()
        task.train(3)
        after = np.asarray(task.state.cam["extra"])
        assert np.isfinite(after).all()
        assert not np.allclose(before, after)


class TestErrorMap:
    def test_error_map_accumulates(self):
        task = make_task(use_error_map=True)
        task.train(4)
        em = np.asarray(task.state.error_map)
        assert np.isfinite(em).all()
        assert (em >= 0).all()
        assert em.std() > 0  # non-uniform after deposits

    def test_cdf_rebuild_and_importance_sampling(self):
        """After a rebuild the CDFs are valid monotone distributions and
        training keeps running with importance sampling on."""
        task = make_task(use_error_map=True)
        task._err_interval = 3
        loss = task.train(8)  # crosses ≥1 rebuild
        assert task._cdf_valid
        assert np.isfinite(loss)
        cdf_img = np.asarray(task._cdf_img)
        assert np.all(np.diff(cdf_img) > 0) and abs(cdf_img[-1] - 1.0) < 1e-5
        cdf_y = np.asarray(task._cdf_y)
        assert np.all(np.diff(cdf_y, axis=1) > 0)
        assert np.allclose(cdf_y[:, -1], 1.0, atol=1e-5)
        cdf_x = np.asarray(task._cdf_x)
        assert np.all(np.diff(cdf_x, axis=2) > 0)
        assert np.allclose(cdf_x[..., -1], 1.0, atol=1e-5)
        # interval grew ×1.5 (reference growth schedule)
        assert task._err_interval > 3


class TestTrainModes:
    def test_all_modes_run_and_switch(self):
        """Mode switches mid-training (the reference run.py RFL schedule
        switches Nerf→Rfl→Nerf) without recompiling the world."""
        task = make_task(use_error_map=False)
        for mode in ("nerf", "rfl", "rflrelax", "nerf"):
            task.train_mode = mode
            loss = task.train(2)
            assert np.isfinite(loss), mode

    @pytest.mark.parametrize("mode", ["rfl", "rflrelax"])
    def test_mode_loss_decreases(self, mode):
        task = make_task(use_error_map=False)
        task.train_mode = mode
        l0 = task.train(2)
        task.train(30)
        l1 = task.train(2)
        assert l1 < l0, (mode, l0, l1)

    def test_rand_level_training_runs(self):
        task = make_task(use_error_map=False)
        task.max_level_rand_training = True
        loss = task.train(4)
        assert np.isfinite(loss)


class TestRollingShutter:
    def test_camera_slerp_endpoints_and_midpoint(self):
        import jax.numpy as jnp

        from instant_ngp_tpu.render.camera import camera_slerp, so3_exp

        rng = np.random.default_rng(0)
        w = jnp.asarray([0.0, 0.0, 0.6])  # 0.6 rad about z
        R0 = np.eye(3, dtype=np.float32)
        R1 = np.asarray(so3_exp(w))
        x0 = np.concatenate([R0, [[0.0], [0.0], [0.0]]], 1).astype(np.float32)
        x1 = np.concatenate([R1, [[1.0], [2.0], [3.0]]], 1).astype(np.float32)
        for t, expect_w, expect_tr in [
            (0.0, 0.0, [0, 0, 0]), (1.0, 0.6, [1, 2, 3]), (0.5, 0.3, [0.5, 1, 1.5]),
        ]:
            out = np.asarray(camera_slerp(jnp.asarray(x0), jnp.asarray(x1), t))
            expect_R = np.asarray(so3_exp(jnp.asarray([0.0, 0.0, expect_w])))
            np.testing.assert_allclose(out[:, :3], expect_R, atol=1e-5)
            np.testing.assert_allclose(out[:, 3], expect_tr, atol=1e-6)

    def test_rolling_shutter_training_uses_end_xform(self):
        """With rolling shutter active, rays from the bottom scanline
        must differ from the static-camera rays."""
        import jax
        import jax.numpy as jnp

        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        # camera translates between shutter open and close
        ds.xforms_end = ds.xforms_start.copy()
        ds.xforms_end[:, 0, 3] += 0.2
        ds.rolling_shutter = np.tile(
            np.array([0.0, 0.0, 1.0, 0.0], np.float32), (2, 1)
        )  # scanline time = v
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8,
                        use_error_map=False)
        assert task.has_motion
        img_idx = jnp.zeros(2, jnp.int32)
        uv = jnp.asarray([[0.5, 0.0], [0.5, 1.0]])  # top vs bottom scanline
        o, d = task._generate_rays(task.data, img_idx, uv, None)
        o = np.asarray(o)
        assert abs(o[0, 0] - 0.5) < 1e-5          # top: start xform
        assert abs(o[1, 0] - 0.7) < 1e-5          # bottom: end xform
        loss = task.train(3)
        assert np.isfinite(loss)


class TestSharpness:
    def test_sharpness_maps_blurry_vs_sharp(self):
        """Variance-of-Laplacian must rank a noisy image above a flat one."""
        import jax

        ds = g._synthetic_dataset(n_images=2, w=32, h=32)
        rng = np.random.default_rng(0)
        ds.images[0, ..., :3] = 128  # flat → zero Laplacian variance
        ds.images[1, ..., :3] = rng.integers(0, 255, (32, 32, 3))
        sm = ds.compute_sharpness_maps((4, 4))
        assert sm.shape == (2, 4, 4)
        assert sm[0].max() < 1e-6
        assert sm[1].min() > 1e-4

    def test_sharpness_weighted_training_runs(self):
        task = make_task(use_error_map=True, include_sharpness_in_error=True)
        loss = task.train(4)
        assert np.isfinite(loss)
        assert task.state.sharp_grid is not None
        assert np.isfinite(np.asarray(task.state.sharp_grid)).all()


class TestLossDecreases:
    def test_nerf_loss_decreases(self):
        task = make_task(use_error_map=False)
        l0 = task.train(2)
        task.train(30)
        l1 = task.train(2)
        assert l1 < l0, (l0, l1)


class TestRenderPath:
    def test_render_compaction_consistency(self):
        """Render with compaction must match the fixed-round traced
        variant (same windows, no compaction)."""
        import jax.numpy as jnp

        task = make_task(use_error_map=False)
        task.train(8)
        params = task.opt.inference_params(task.state.opt_state, task.state.params)
        bits = task.state.grid.bitfield
        R = 64
        rng = np.random.default_rng(3)
        o = jnp.asarray(np.full((R, 3), [0.5, 0.5, -0.6], np.float32)
                        + 0.05 * rng.standard_normal((R, 3)).astype(np.float32))
        d = np.concatenate([0.2 * rng.standard_normal((R, 2)), np.ones((R, 1))], -1)
        d = jnp.asarray((d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32))

        rgb1, a1, dep1, cost1 = task._render_rays(params, bits, o, d, max_rounds=8)
        rgb2, a2, dep2 = task._render_rays_nokey(params, bits, o, d, n_rounds=8)
        np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-4)
        assert np.asarray(cost1).max() > 0  # samples were taken

    def test_cost_and_encodingvis_modes(self):
        task = make_task(use_error_map=False)
        task.train(2)
        cam = np.hstack([np.eye(3), [[0.5], [0.5], [-0.7]]]).astype(np.float32)
        for mode in ("cost", "encodingvis"):
            frame = task.render(8, 8, cam, fov=60.0, render_mode=mode)
            assert frame.shape == (8, 8, 4)
            assert np.isfinite(frame).all(), mode

    def test_full_render_frame(self):
        task = make_task(use_error_map=False)
        task.train(4)
        cam = np.hstack([np.eye(3), [[0.5], [0.5], [-0.7]]]).astype(np.float32)
        frame = task.render(16, 16, cam, fov=60.0)
        assert frame.shape == (16, 16, 4)
        assert np.isfinite(frame).all()

    def test_slice_render_mode(self):
        # ERenderMode::Slice: full-model eval on the constant-depth
        # plane (testbed_nerf.cu:1911-1914, :2038-2096)
        task = make_task(use_error_map=False)
        task.train(2)
        cam = np.hstack([np.eye(3), [[0.5], [0.5], [-0.7]]]).astype(np.float32)
        frame = task.render_slice(8, 8, cam, fov=60.0, plane_dist=1.2)
        assert frame.shape == (8, 8, 4)
        assert np.isfinite(frame).all()
        assert frame[..., 3].min() >= 0.0 and frame[..., 3].max() <= 1.0
        # the slice plane position changes what is sampled
        other = task.render_slice(8, 8, cam, fov=60.0, plane_dist=0.6)
        assert np.abs(other - frame).max() > 0.0
