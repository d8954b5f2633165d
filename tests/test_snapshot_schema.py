"""Snapshot dataset-block interchange with the reference schema
(json_binding.h:112-188). Absent a CUDA binary, the reference WRITE
path is the spec: a hand-constructed snapshot using every reference
field must load, and our writer must emit that schema."""

import dataclasses

import numpy as np
import pytest

from instant_ngp_tpu import snapshot as snapshot_io


def _reference_style_block():
    """A dataset block as the reference writes it (to_json(NerfDataset))
    — per-image metadata, TrainingXForm start/end pairs as mat4x3
    column lists, Lens object, BoundingBox render_aabb."""
    n = 2
    xf = np.arange(12, dtype=np.float32).reshape(3, 4)
    return {
        "n_images": n,
        "paths": ["0.png", "1.png"],
        "metadata": [
            {
                "focal_length": [100.0, 101.0],
                "lens": {"is_fisheye": False, "k1": 0.1, "k2": 0.01,
                         "p1": 0.001, "p2": -0.002},
                "principal_point": [0.5, 0.45],
                "rolling_shutter": [0.0, 0.1, 0.0, 0.25],
                "resolution": [64, 48],
            }
            for _ in range(n)
        ],
        "xforms": [
            {"start": xf.T.tolist(), "end": (xf + 1.0).T.tolist()}
            for _ in range(n)
        ],
        "render_aabb": {"min": [0.1, 0.2, 0.3], "max": [0.9, 0.8, 0.7]},
        "render_aabb_to_local": np.eye(3).tolist(),
        "up": [0.0, 1.0, 0.0],
        "offset": [0.5, 0.4, 0.5],
        "envmap_resolution": [0, 0],
        "scale": 0.33,
        "aabb_scale": 4,
        "from_mitsuba": False,
        "is_hdr": False,
        "wants_importance_sampling": True,
        "n_extra_learnable_dims": 16,
    }


class TestReferenceSchemaLoad:
    def test_every_field(self):
        ds = snapshot_io.dataset_from_json(_reference_style_block())
        assert ds.n_images == 2
        assert ds.resolution == (64, 48)
        np.testing.assert_allclose(ds.focal_lengths[0], [100.0, 101.0])
        np.testing.assert_allclose(ds.principal_points[1], [0.5, 0.45])
        np.testing.assert_allclose(ds.rolling_shutter[0], [0, 0.1, 0, 0.25])
        # xforms: columns → (3,4) rows
        np.testing.assert_allclose(
            ds.xforms_start[0], np.arange(12).reshape(3, 4))
        np.testing.assert_allclose(
            ds.xforms_end[0], np.arange(12).reshape(3, 4) + 1.0)
        assert ds.lens_mode == "opencv"
        np.testing.assert_allclose(ds.lens_params, [0.1, 0.01, 0.001, -0.002])
        np.testing.assert_allclose(
            ds.render_aabb, [[0.1, 0.2, 0.3], [0.9, 0.8, 0.7]])
        np.testing.assert_allclose(ds.up, [0, 1, 0])
        np.testing.assert_allclose(ds.offset, [0.5, 0.4, 0.5])
        assert ds.scale == pytest.approx(0.33)
        assert ds.aabb_scale == 4
        assert ds.n_extra_learnable_dims == 16
        assert ds.paths == ("0.png", "1.png")

    def test_global_defaults_form(self):
        """from_json also accepts global default fields instead of the
        per-image metadata array (json_binding.h:145-156)."""
        xf = np.eye(3, 4, dtype=np.float32)
        block = {
            "n_images": 1,
            "focal_length": [50.0, 50.0],
            "principal_point": [0.5, 0.5],
            "rolling_shutter": [0, 0, 0, 0],
            "image_resolution": [32, 32],
            "camera_distortion": {"k1": 0.2, "k2": 0.0, "p1": 0.0, "p2": 0.0},
            "xforms": [{"start": xf.T.tolist(), "end": xf.T.tolist()}],
            "render_aabb": {"min": [0, 0, 0], "max": [1, 1, 1]},
            "up": [0, 0, 1],
            "offset": [0.5, 0.5, 0.5],
            "envmap_resolution": [0, 0],
            "scale": 0.33,
            "aabb_scale": 1,
            "from_mitsuba": False,
        }
        ds = snapshot_io.dataset_from_json(block)
        assert ds.lens_mode == "opencv"  # legacy "camera_distortion" key
        np.testing.assert_allclose(ds.focal_lengths[0], [50.0, 50.0])
        assert ds.resolution == (32, 32)

    def test_lens_roundtrip_all_modes(self):
        for mode, params in [
            ("perspective", np.zeros(4)),
            ("opencv", np.asarray([0.1, 0.2, 0.3, 0.4])),
            ("opencv_fisheye", np.asarray([0.1, 0.2, 0.3, 0.4])),
            ("ftheta", np.asarray([0.0, 1e-3, 0, 0, 0, 640, 480])),
            ("latlong", np.zeros(4)),
            ("equirectangular", np.zeros(4)),
            ("orthographic", np.zeros(4)),
        ]:
            j = snapshot_io.lens_to_json(mode, params)
            m2, p2 = snapshot_io.lens_from_json(j)
            assert m2 == mode
            np.testing.assert_allclose(p2[: len(params)], params)


class TestWriterEmitsReferenceSchema:
    def test_dataset_roundtrip_through_snapshot(self, tmp_path):
        import __graft_entry__ as g
        from pyngp import Testbed

        import jax

        jax.config.update("jax_platforms", "cpu")
        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        from instant_ngp_tpu.nerf.task import NerfTask
        from instant_ngp_tpu.testbed import TestbedMode

        tb = Testbed()
        tb.mode = TestbedMode.NERF
        tb.nerf_dataset = ds
        tb.network_config = g._tiny_nerf_config()
        tb.task = NerfTask(ds, tb.network_config, n_rays_per_batch=64,
                           max_samples_per_ray=4, n_march_iters=8)
        tb.task.train(1)
        path = tmp_path / "snap.ingp"
        tb.save_snapshot(str(path))
        doc = snapshot_io.load_snapshot_file(path)
        block = doc["snapshot"]["nerf"]["dataset"]
        # the reference schema keys are all present
        for key in ("n_images", "paths", "metadata", "xforms", "render_aabb",
                    "render_aabb_to_local", "up", "offset",
                    "envmap_resolution", "scale", "aabb_scale",
                    "from_mitsuba", "is_hdr", "wants_importance_sampling",
                    "n_extra_learnable_dims"):
            assert key in block, key
        assert isinstance(block["xforms"][0], dict)
        assert set(block["xforms"][0]) == {"start", "end"}
        assert set(block["metadata"][0]) == {
            "focal_length", "lens", "principal_point", "rolling_shutter",
            "resolution"}
        # and scene-free reload reconstructs the cameras
        tb2 = Testbed()
        tb2.load_snapshot(str(path))
        np.testing.assert_allclose(
            np.asarray(tb2.nerf_dataset.xforms_start),
            np.asarray(ds.xforms_start), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tb2.nerf_dataset.focal_lengths),
            np.asarray(ds.focal_lengths), atol=1e-6)
