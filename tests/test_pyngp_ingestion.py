"""pyngp numpy-ingestion surfaces: nerf.training.set_image and
Testbed.override_sdf_training_data (python_api.cu:45-112, :551,
:846-848)."""
import numpy as np
import pytest

from instant_ngp_tpu.testbed import Testbed, TestbedMode


def _cube_tris():
    from tests.test_round3_fixes import _cube_tris as f

    return f()


class TestSetImage:
    def _task(self):
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        return NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8)

    def test_replaces_image_on_host_and_device(self):
        task = self._task()
        new = np.full((16, 16, 4), 0.25, np.float32)
        task.set_training_image(1, new)
        # host copy quantized like the loader (uint8 sRGB storage)
        assert task.dataset.images[1, 0, 0, 0] == int(0.25 * 255 + 0.5)
        # device copy updated, other frame untouched
        dev = np.asarray(task.data["images"])
        assert (dev[1] == int(0.25 * 255 + 0.5)).all()
        assert (dev[0] == task.dataset.images[0]).all()
        # training still runs on the swapped data
        assert np.isfinite(task.train(1))

    def test_validation(self):
        task = self._task()
        with pytest.raises(IndexError):
            task.set_training_image(5, np.zeros((16, 16, 4), np.float32))
        with pytest.raises(ValueError):
            task.set_training_image(0, np.zeros((8, 8, 4), np.float32))
        with pytest.raises(ValueError):
            # no depth channel in this dataset
            task.set_training_image(0, np.zeros((16, 16, 4), np.float32),
                                    depth_img=np.ones((16, 16), np.float32))

    def test_depth_update_scales_like_loader(self):
        task = self._task()
        task.dataset.depths = np.zeros((2, 16, 16), np.float32)
        import jax.numpy as jnp

        task.data["depths"] = jnp.asarray(task.dataset.depths)
        task.set_training_image(0, np.zeros((16, 16, 4), np.float32),
                                depth_img=np.full((16, 16), 2.0, np.float32),
                                depth_scale=0.5)
        expect = 2.0 * 0.5 * float(task.dataset.scale)
        np.testing.assert_allclose(np.asarray(task.data["depths"])[0],
                                   expect, rtol=1e-6)

    def test_testbed_view_binding(self):
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        tb = Testbed()
        tb.network_config = g._tiny_nerf_config()
        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        tb.nerf_dataset = ds
        tb.mode = TestbedMode.NERF
        tb.task = NerfTask(ds, tb.network_config, n_rays_per_batch=64,
                           max_samples_per_ray=4, n_march_iters=8)
        tb.nerf.training.set_image(0, np.full((16, 16, 4), 0.5, np.float32))
        assert tb.task.dataset.images[0, 0, 0, 0] == int(0.5 * 255 + 0.5)


class TestOverrideSdfTrainingData:
    def test_override_trains_on_fixed_set(self):
        from instant_ngp_tpu.sdf.task import SdfTask
        from tests.test_tasks import tiny_config

        task = SdfTask(_cube_tris(), tiny_config(loss="Mape"),
                       batch_size=1 << 10)
        rng = np.random.default_rng(0)
        # external GT in the RAW mesh frame: the unit cube itself
        pts = rng.random((3000, 3)).astype(np.float32)
        d = (np.minimum(pts, 1 - pts).min(-1)
             * np.where((pts > 0).all(-1) & (pts < 1).all(-1), -1, 1))
        task.override_training_data(pts, d.astype(np.float32))
        # producer stopped (generate_sdf_data_online = false)
        assert not getattr(task, "_thread", None) or not task._thread.is_alive()
        loss = task.train(3)
        assert np.isfinite(loss)
        assert task.training_step == 3
        # batches wrap around the fixed set
        assert task._override_idx == (3 * 1024) % 3000
        # points were mapped by the mesh normalization
        p, dd = task._override
        np.testing.assert_allclose(
            p, pts * task.mesh_scale + task.mesh_offset, atol=1e-6)
        np.testing.assert_allclose(dd, d * task.mesh_scale, atol=1e-6)

    def test_shape_validation_and_testbed_gate(self):
        from instant_ngp_tpu.sdf.task import SdfTask
        from tests.test_tasks import tiny_config

        task = SdfTask(_cube_tris(), tiny_config(loss="Mape"),
                       batch_size=256)
        with pytest.raises(ValueError):
            task.override_training_data(np.zeros((4, 2)), np.zeros(4))
        with pytest.raises(ValueError):
            task.override_training_data(np.zeros((4, 3)), np.zeros(5))
        tb = Testbed()
        with pytest.raises(RuntimeError):
            tb.override_sdf_training_data(np.zeros((4, 3)), np.zeros(4))
