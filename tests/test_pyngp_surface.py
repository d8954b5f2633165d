"""pyngp binding-surface breadth added in round 3: BoundingBox,
testbed.sdf/image views, sampling toggles, camera-opt hyperparams,
render knobs (python_api.cu:430-970, testbed.h:780-815)."""
import numpy as np
import pytest

import pyngp as ngp
from instant_ngp_tpu.testbed import Testbed, TestbedMode


def _nerf_testbed():
    import __graft_entry__ as g
    from instant_ngp_tpu.nerf.task import NerfTask

    tb = Testbed()
    tb.network_config = g._tiny_nerf_config()
    ds = g._synthetic_dataset(n_images=2, w=16, h=16)
    tb.nerf_dataset = ds
    tb.mode = TestbedMode.NERF
    tb.task = NerfTask(ds, tb.network_config, n_rays_per_batch=64,
                       max_samples_per_ray=4, n_march_iters=8)
    return tb


class TestBoundingBox:
    def test_geometry(self):
        b = ngp.BoundingBox([0, 0, 0], [2, 2, 2])
        assert b.contains([1, 1, 1]) and not b.contains([3, 0, 0])
        assert abs(b.distance([4, 0, 0]) - 2.0) < 1e-6
        assert b.intersects(ngp.BoundingBox([1, 1, 1], [3, 3, 3]))
        assert not b.intersects(ngp.BoundingBox([5, 5, 5], [6, 6, 6]))
        np.testing.assert_allclose(b.relative_pos([1, 0, 2]), [0.5, 0, 1])
        e = ngp.BoundingBox()
        assert e.is_empty()
        e.enlarge([1, 2, 3])
        e.enlarge(b)
        np.testing.assert_allclose(e.min, 0.0)
        np.testing.assert_allclose(e.max, [2, 2, 3])

    def test_mode_from_string(self):
        assert ngp.mode_from_string("nerf") == ngp.TestbedMode.NERF
        assert ngp.mode_from_string("sdf") == ngp.TestbedMode.SDF


class TestNerfTrainingKnobs:
    def test_sampling_toggles_change_sampling(self):
        import jax
        import jax.numpy as jnp

        tb = _nerf_testbed()
        task = tb.task
        task.train(2)
        tr = tb.nerf.training
        assert tr.sample_image_proportional_to_error is True
        # with both off, _sample_pixels is uniform: pdf == 1 everywhere
        tr.sample_image_proportional_to_error = False
        tr.sample_focal_plane_proportional_to_error = False
        data = dict(task.data)
        # CDF tensors exist only when the map rebuilt; fake them
        n, (eh, ew) = task.dataset.n_images, task.error_map_res
        data["cdf_img"] = jnp.linspace(0.3, 1.0, n)
        data["pmf_img"] = jnp.full((n,), 1.0 / n)
        data["cdf_y"] = jnp.tile(jnp.linspace(0.1, 1, eh), (n, 1))
        data["cdf_x"] = jnp.tile(jnp.linspace(0.1, 1, ew), (n, eh, 1))
        _, _, pdf = task._sample_pixels(data, jax.random.PRNGKey(0), 32,
                                        use_cdf=True)
        np.testing.assert_allclose(np.asarray(pdf), 1.0)
        # image-only CDF: pdf = image pmf ratio (uniform pmf → 1.0),
        # uv untouched by the 50/50 split
        tr.sample_image_proportional_to_error = True
        _, uv, pdf = task._sample_pixels(data, jax.random.PRNGKey(0), 32,
                                         use_cdf=True)
        np.testing.assert_allclose(np.asarray(pdf), 1.0, rtol=1e-5)
        # both on: the 50/50 uv branch yields non-unit pdfs
        tr.sample_focal_plane_proportional_to_error = True
        _, _, pdf = task._sample_pixels(data, jax.random.PRNGKey(0), 256,
                                        use_cdf=True)
        assert np.abs(np.asarray(pdf) - 1.0).max() > 1e-3

    def test_density_grid_decay_and_cam_hparams(self):
        tb = _nerf_testbed()
        tr = tb.nerf.training
        assert tr.density_grid_decay == 0.95
        tr.density_grid_decay = 0.9
        assert tb.task.density_grid_decay == 0.9
        tr.extrinsic_learning_rate = 1.6e-3
        assert abs(tb.task.cam_opt.spec.learning_rate - 1e-4) < 1e-12
        tr.extrinsic_l2_reg = 1e-3
        assert tb.task.cam_opt.spec.l2_reg == 1e-3
        assert abs(tr.extrinsic_learning_rate - 1.6e-3) < 1e-12
        assert tr.n_steps_between_cam_updates == 16
        # training still healthy after optimizer swap
        assert np.isfinite(tb.task.train(1))

    def test_optimize_extra_dims_freezes_latents(self):
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        ds.n_extra_learnable_dims = 4
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8)
        assert task.optimize_extra_dims is True
        before = np.asarray(task.state.cam["extra"]).copy()
        task.train(2)
        moved = np.abs(np.asarray(task.state.cam["extra"]) - before).max()
        assert moved > 0.0
        task.optimize_extra_dims = False
        task.rebuild_jit_programs()
        before = np.asarray(task.state.cam["extra"]).copy()
        task.train(2)
        frozen = np.abs(np.asarray(task.state.cam["extra"]) - before).max()
        assert frozen < moved * 1e-2


class TestTestbedRenderKnobs:
    def test_checkerboard_transparency(self):
        tb = _nerf_testbed()
        tb.task.train(1)
        cam = tb.nerf_dataset.xforms_start[0]
        tb.background_color = np.array([0, 0, 0, 0], np.float32)
        plain = tb.render(16, 16, camera_matrix=cam)
        tb.render_transparency_as_checkerboard = True
        checked = tb.render(16, 16, camera_matrix=cam)
        # empty regions (alpha≈0) must show the checkerboard pattern
        a = plain[..., 3]
        if (a < 0.05).any():
            vals = checked[..., 0][a < 0.05]
            near = (np.abs(vals - 0.55) < 0.06) | (np.abs(vals - 0.4) < 0.06)
            assert near.all()

    def test_fixed_res_factor(self):
        tb = _nerf_testbed()
        tb.task.train(1)
        tb.dynamic_res = False
        tb.fixed_res_factor = 16  # factor 0.5 → renders at half res
        frame = tb.render_with_dynamic_res(
            32, 32, camera_matrix=tb.nerf_dataset.xforms_start[0])
        assert frame.shape == (32, 32, 4)
        # upsampled by pixel repetition: 2x2 blocks are constant
        assert np.allclose(frame[0::2, 0::2], frame[1::2, 1::2])

    def test_aabb_and_default_camera(self):
        tb = _nerf_testbed()
        box = tb.aabb
        assert box.contains(box.center)
        np.testing.assert_allclose(tb.default_camera[:, :3], np.eye(3))
        tb.screen_center = (0.4, 0.6)
        tb.reset_camera()
        assert tb.screen_center == (0.5, 0.5)

    def test_free_temporary_memory(self):
        tb = _nerf_testbed()
        tb.task.train(1)
        tb.task.bake(res0=16)
        tb.free_temporary_memory()
        assert tb.task._baked_cache is None


class TestSdfView:
    def _tb(self):
        from instant_ngp_tpu.sdf.task import SdfTask
        from tests.test_round3_fixes import _cube_tris
        from tests.test_tasks import tiny_config

        tb = Testbed()
        tb.mode = TestbedMode.SDF
        tb.task = SdfTask(_cube_tris(), tiny_config(loss="Mape"),
                          batch_size=512)
        return tb

    def test_knob_forwarding(self):
        from instant_ngp_tpu.common import MeshSdfMode

        tb = self._tb()
        assert tb.sdf.mesh_sdf_mode == MeshSdfMode("pseudonormal")
        tb.sdf.zero_offset = 0.05
        assert tb.task.zero_offset == 0.05
        tb.sdf.analytic_normals = False
        tb.sdf.fd_normals_epsilon = 2e-3
        assert tb.task.fd_normals_epsilon == 2e-3
        assert tb.sdf.training.generate_sdf_data_online
        tb.sdf.training.surface_offset_scale = 2.0
        assert tb.task.surface_offset_scale == 2.0
        assert tb.sdf.mesh_scale == pytest.approx(tb.task.mesh_scale)
        assert not tb.sdf.use_triangle_octree
        raw = tb.raw_aabb
        # the test cube spans [0.3, 0.7]³ pre-normalization
        np.testing.assert_allclose(raw.min, 0.3, atol=1e-5)
        np.testing.assert_allclose(raw.max, 0.7, atol=1e-5)

    def test_zero_offset_and_fd_normals_render(self):
        tb = self._tb()
        tb.task.train(2)
        cam = np.hstack([np.eye(3), [[0.5], [0.5], [-0.8]]]).astype(np.float32)
        f0 = tb.task.render(8, 8, cam, fov=60.0)
        tb.sdf.zero_offset = -0.02  # deflate the surface
        f1 = tb.task.render(8, 8, cam, fov=60.0)
        assert np.abs(f1 - f0).max() > 0  # knob reaches the tracer
        tb.sdf.analytic_normals = False
        f2 = tb.task.render(8, 8, cam, fov=60.0)
        assert np.isfinite(f2).all()

    def test_iou_online(self):
        tb = self._tb()
        tb.calculate_iou_online = True
        tb.scene_path = "cube"
        for _ in range(16):
            tb.frame()
        assert tb.sdf_iou is not None and 0.0 <= tb.sdf_iou <= 1.0


class TestImageView:
    def test_forwarding(self):
        from instant_ngp_tpu.image_fit.task import ImageTask

        tb = Testbed()
        tb.mode = TestbedMode.IMAGE
        rng = np.random.default_rng(0)
        img = rng.random((32, 32, 3)).astype(np.float32)
        tb.task = ImageTask(img, False,
                            {"encoding": {"otype": "HashGrid",
                                          "n_levels": 4},
                             "network": {"n_neurons": 16,
                                         "n_hidden_layers": 1}},
                            batch_size=256)
        from instant_ngp_tpu.common import RandomMode

        assert tb.image.random_mode == RandomMode("stratified")
        tb.image.random_mode = RandomMode("halton")
        assert tb.task.random_mode == "halton"
        tb.image.training.snap_to_pixel_centers = True
        assert tb.task.snap_to_pixel_centers
        tb.image.training.linear_colors = True
        assert tb.task.linear_colors


class TestCameraPathPlayback:
    def test_timestamp_api(self):
        from instant_ngp_tpu.render.camera_path import CameraPath

        cp = CameraPath()
        for k in range(4):
            m = np.hstack([np.eye(3), [[0], [0], [float(k)]]]).astype(
                np.float32)
            cp.add_camera(m, fov=50.0 + k)
        assert not cp.has_valid_timestamps()
        cp.sanitize_keyframes()
        assert cp.has_valid_timestamps()
        assert cp.duration_seconds == 1.0
        # equidistant stamps reproduce the uniform-index spline
        for t in (0.0, 0.3, 0.5, 0.9, 1.0):
            np.testing.assert_allclose(cp.eval_camera_path(t).T,
                                       cp.eval(t).T, atol=1e-5)
        # non-equidistant: first segment stretched to 75% of playtime
        cp.keyframes[0].timestamp = 0.75
        cp.keyframes[1].timestamp = 0.8
        cp.keyframes[2].timestamp = 0.9
        cp.keyframes[3].timestamp = 1.0
        i, f = cp.get_pos(0.5)
        assert i == 0 and 0 < f < 1
        assert cp.get_pos(0.99)[0] == 2
        cp.clear()
        assert cp.empty() and cp.play_time == 0.0

    def test_frame_playback_and_record(self):
        tb = _nerf_testbed()
        tb.shall_train = False
        # record 3 frames
        tb.record_camera_path = True
        for _ in range(3):
            tb.frame()
        assert len(tb.camera_path.keyframes) == 3
        assert tb.camera_path.has_valid_timestamps()
        # playback drives the camera
        tb.record_camera_path = False
        cp = tb.camera_path
        cp.keyframes[0].T = np.array([9.0, 9.0, 9.0], np.float32)
        cp.update_cam_from_path = True
        cp.auto_play_speed = 0.0
        cp.play_time = 0.0
        tb.frame()
        np.testing.assert_allclose(tb.camera_matrix[:, 3], [9, 9, 9],
                                   atol=1e-5)


class TestShallTrainToggles:
    def test_nerf_freeze_encoding(self):
        import jax

        tb = _nerf_testbed()
        tb.task.train(1)
        enc0 = jax.tree.leaves(tb.task.state.params["pos_enc"])[0].copy()
        net0 = jax.tree.leaves(tb.task.state.params["density_net"])[0].copy()
        tb.shall_train_encoding = False
        tb.frame()
        enc1 = jax.tree.leaves(tb.task.state.params["pos_enc"])[0]
        net1 = jax.tree.leaves(tb.task.state.params["density_net"])[0]
        assert np.array_equal(np.asarray(enc0), np.asarray(enc1))
        assert not np.array_equal(np.asarray(net0), np.asarray(net1))
        tb.shall_train_encoding = True
        tb.shall_train_network = False
        net1 = jax.tree.leaves(tb.task.state.params["density_net"])[0].copy()
        tb.frame()
        net2 = jax.tree.leaves(tb.task.state.params["density_net"])[0]
        assert np.array_equal(np.asarray(net1), np.asarray(net2))

    def test_sdf_freeze_network(self):
        import jax
        from instant_ngp_tpu.sdf.task import SdfTask
        from tests.test_round3_fixes import _cube_tris
        from tests.test_tasks import tiny_config

        task = SdfTask(_cube_tris(), tiny_config(loss="Mape"),
                       batch_size=512)
        task.train(1)
        task.shall_train_network = False
        task.rebuild_jit_programs()
        net0 = jax.tree.leaves(task.params["net"])[0].copy()
        task.train(2)
        assert np.array_equal(np.asarray(net0),
                              np.asarray(jax.tree.leaves(task.params["net"])[0]))
        task.stop_producer()


class TestRenderingExtraDims:
    def test_render_conditions_on_latents(self):
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        ds.n_extra_learnable_dims = 4
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8)
        task.train(3)  # latents move (they start random and train)
        cam = ds.xforms_start[0]
        f0 = np.asarray(task.render(8, 8, cam, fov=60.0))
        task.rendering_extra_dims_from_training_view = 1
        f1 = np.asarray(task.render(8, 8, cam, fov=60.0))
        # different views' latents produce different renders
        assert np.abs(f1 - f0).max() > 0
        # explicit vector: view-0 latents reproduce the view-0 render
        task.set_rendering_extra_dims(
            np.asarray(task.state.cam["extra"][0]))
        assert task.rendering_extra_dims_from_training_view == -1
        f2 = np.asarray(task.render(8, 8, cam, fov=60.0))
        np.testing.assert_allclose(f2, f0, atol=1e-5)
        with pytest.raises(ValueError):
            task.set_rendering_extra_dims(np.zeros(3))

    def test_view_binding(self):
        tb = _nerf_testbed()
        assert tb.nerf.rendering_extra_dims_from_training_view == 0
        tb.nerf.set_rendering_extra_dims_from_training_view(1)
        assert tb.task.rendering_extra_dims_from_training_view == 1


class TestAccessorAliases:
    def test_aliases_and_fov(self):
        tb = _nerf_testbed()
        tb.render_groundtruth = True
        assert tb.render_ground_truth is True
        tb.loop_animation = True
        assert tb.camera_path.loop is True
        np.testing.assert_allclose(tb.view_camera(), tb.camera_matrix)
        tb.fov = 60.0
        np.testing.assert_allclose(tb.fov_xy, [60, 60])
        tb.fov_xy = (50.0, 40.0)
        assert tb.fov == 40.0  # fov_axis = 1
        rel = tb.relative_focal_length
        import math
        assert abs(rel[1] - 0.5 / math.tan(math.radians(20))) < 1e-5
        tb.relative_focal_length = (1.0, 1.0)
        assert abs(tb.fov - math.degrees(2 * math.atan(0.5))) < 1e-4
        tr = tb.nerf.training
        tr.optimize_per_image_latents = False
        assert tr.optimize_extra_dims is False

    def test_camera_prediction(self):
        from instant_ngp_tpu.render.camera_predictor import (
            CameraPredictionMode)

        tb = _nerf_testbed()
        tb.shall_train = False
        tb.camera_prediction_mode = CameraPredictionMode.MAT_LOG_LINEAR
        # feed a constant-velocity translation through frame()
        for i in range(5):
            tb.camera_matrix = tb.camera_matrix.copy()
            tb.camera_matrix[0, 3] += 0.1
            tb.frame()
        pred = tb.predict_view_camera(1.0)
        assert pred.shape == (3, 4)
        # prediction continues along +x
        assert pred[0, 3] > tb.camera_matrix[0, 3] + 1e-4

    def test_visualized_dimension_changes_encodingvis(self):
        from instant_ngp_tpu.common import RenderMode

        tb = _nerf_testbed()
        tb.task.train(1)
        tb.render_mode = RenderMode("encoding_vis")
        cam = tb.nerf_dataset.xforms_start[0]
        f0 = tb.render(8, 8, camera_matrix=cam)
        tb.visualized_dimension = 4
        f1 = tb.render(8, 8, camera_matrix=cam)
        assert np.isfinite(f0).all() and np.isfinite(f1).all()
        assert np.abs(f1 - f0).max() > 0


class TestGroundTruthModes:
    def test_sdf_spheretraced_gt(self):
        from instant_ngp_tpu.sdf.task import SdfTask
        from tests.test_round3_fixes import _cube_tris
        from tests.test_tasks import tiny_config

        task = SdfTask(_cube_tris(), tiny_config(loss="Mape"),
                       batch_size=256)
        cam = np.hstack([np.eye(3), [[0.5], [0.5], [-0.8]]]).astype(
            np.float32)
        ray = task.render(8, 8, cam, fov=60.0, ground_truth=True)
        task.groundtruth_mode = "spheretracedmesh"
        sph = task.render(8, 8, cam, fov=60.0, ground_truth=True)
        assert sph.shape == (8, 8, 4) and np.isfinite(sph).all()
        # both GT modes agree on what is hit (the cube silhouette)
        assert (np.abs(sph[..., 3] - ray[..., 3]) <= 1.0).all()
        assert sph[..., 3].max() == 1.0  # something was hit
        task.stop_producer()

    def test_nerf_gt_depth_mode(self):
        from instant_ngp_tpu.common import GroundTruthRenderMode

        tb = _nerf_testbed()
        tb.nerf_dataset.depths = np.full((2, 16, 16), 0.5, np.float32)
        tb.render_groundtruth = True
        tb.groundtruth_render_mode = GroundTruthRenderMode.DEPTH
        tb.set_camera_to_training_view(0)
        frame = tb.render(8, 8)
        np.testing.assert_allclose(frame[..., 0], 1.0)  # depth/max = 1
        tb.groundtruth_render_mode = GroundTruthRenderMode.SHADE
        shade = tb.render(8, 8)
        assert np.abs(shade - frame).max() > 0


class TestOverlays:
    def test_projection_and_segment(self):
        from instant_ngp_tpu.render.overlays import (draw_segment,
                                                     project_points)

        cam = np.hstack([np.eye(3), [[0.0], [0.0], [0.0]]]).astype(
            np.float32)
        # point straight ahead lands at the principal point
        px, front = project_points(np.array([[0, 0, 2.0]]), cam, 64, 64,
                                   32.0)
        assert front[0]
        np.testing.assert_allclose(px[0], [32, 32], atol=1e-4)
        # behind the camera is masked
        _, behind = project_points(np.array([[0, 0, -1.0]]), cam, 64, 64,
                                   32.0)
        assert not behind[0]
        frame = np.zeros((16, 16, 4), np.float32)
        draw_segment(frame, (0, 8), (15, 8), (1.0, 0.0, 0.0))
        assert (frame[8, :, 0] == 1.0).all() and frame[0].sum() == 0

    def test_testbed_overlay_flags(self):
        tb = _nerf_testbed()
        tb.task.train(1)
        cam = tb.nerf_dataset.xforms_start[0]
        base = tb.render(32, 32, camera_matrix=cam)
        tb.visualize_unit_cube = True
        tb.visualize_cameras = True
        over = tb.render(32, 32, camera_matrix=cam)
        assert np.abs(over - base).max() > 0.1  # wireframes drawn
        assert np.isfinite(over).all()


class TestReviewFixes:
    """Regressions from the round-3 code review of the surface sweep."""

    def test_preload_pending_freeze_and_l2(self, tmp_path):
        import json as _json

        import imageio.v2 as imageio

        # build a tiny scene on disk so load_training_data runs
        rng = np.random.default_rng(0)
        frames = []
        for i in range(2):
            imageio.imwrite(tmp_path / f"im{i}.png",
                            rng.integers(0, 255, (8, 8, 4), dtype=np.uint8))
            frames.append({"file_path": f"im{i}.png",
                           "transform_matrix": np.eye(4).tolist()})
        (tmp_path / "transforms.json").write_text(_json.dumps(
            {"camera_angle_x": 0.9, "aabb_scale": 1, "frames": frames}))
        import __graft_entry__ as g

        tb = Testbed()
        tb.network_config = g._tiny_nerf_config()
        tb.shall_train_encoding = False  # queued pre-load
        tb.nerf.training.exposure_l2_reg = 0.02
        tb.nerf.rendering_extra_dims_from_training_view = 1
        tb.load_training_data(str(tmp_path))
        assert tb.task.shall_train_encoding is False
        assert tb.task.exposure_l2_reg == 0.02
        assert tb.task.rendering_extra_dims_from_training_view == 1

    def test_extrinsic_l2_mask_spares_other_groups(self):
        tb = _nerf_testbed()
        mask = tb.task.cam_opt.matrix_mask
        assert mask["rot"] and mask["pos"]
        assert not mask["exposure"] and not mask["focal"]
        tb.nerf.training.extrinsic_l2_reg = 0.01
        mask = tb.task.cam_opt.matrix_mask  # preserved across rebuild
        assert mask["rot"] and not mask["exposure"]

    def test_prediction_mode_change_rebuilds(self):
        from instant_ngp_tpu.render.camera_predictor import (
            CameraPredictionMode)

        tb = _nerf_testbed()
        tb.shall_train = False
        tb.camera_prediction_mode = CameraPredictionMode.MAT_LOG_LINEAR
        tb.frame()
        p_lin = tb._cam_predictor
        assert p_lin is not None and not p_lin.is_quadratic
        tb.camera_prediction_mode = CameraPredictionMode.MAT_LOG_QUADRATIC
        tb.frame()
        assert tb._cam_predictor is not p_lin
        assert tb._cam_predictor.is_quadratic
        tb.camera_prediction_mode = CameraPredictionMode.NONE
        tb.frame()
        assert tb._cam_predictor is None
        # predict falls back to the current camera
        np.testing.assert_allclose(tb.predict_view_camera(1.0),
                                   tb.camera_matrix)
