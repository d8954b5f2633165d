"""Behavior tests for the round-4 pyngp additions (VERDICT item 4):
render_with_depth, camera intrinsics/extrinsics setters,
find_closest_training_view, create_empty_nerf_dataset, PNG slices,
rotated render crop, BoundingBox.ray_intersect, depth_loss_type."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as g  # noqa: E402


@pytest.fixture(scope="module")
def nerf_task():
    from instant_ngp_tpu.nerf.task import NerfTask

    ds = g._synthetic_dataset()
    task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                    max_samples_per_ray=4, n_march_iters=8)
    task.train(2)
    return task


class TestBoundingBoxRayIntersect:
    def test_hit_and_miss(self):
        from instant_ngp_tpu.common import BoundingBox

        box = BoundingBox([0, 0, 0], [1, 1, 1])
        tmin, tmax = box.ray_intersect([0.5, 0.5, -1.0], [0, 0, 1])
        assert tmin == pytest.approx(1.0) and tmax == pytest.approx(2.0)
        tmin, tmax = box.ray_intersect([2.0, 2.0, -1.0], [0, 0, 1.0])
        assert tmin > tmax  # miss
        # axis-parallel ray inside the slab
        tmin, tmax = box.ray_intersect([0.5, 0.5, 0.5], [1.0, 0, 0])
        assert tmin == -0.5 and tmax == pytest.approx(0.5)

    def test_signed_distance(self):
        from instant_ngp_tpu.common import BoundingBox

        box = BoundingBox([0, 0, 0], [1, 1, 1])
        assert box.signed_distance([0.5, 0.5, 0.5]) < 0
        assert box.signed_distance([2.0, 0.5, 0.5]) == pytest.approx(1.0)


class TestRenderWithDepth:
    def test_depth_surface(self, nerf_task):
        frame, depth = nerf_task.render(
            12, 12, nerf_task.dataset.xforms_start[0], return_depth=True)
        assert frame.shape == (12, 12, 4)
        assert depth.shape == (12, 12)
        assert np.isfinite(depth).all()


class TestRotatedCropBox:
    def test_rotation_changes_visibility(self, nerf_task):
        xf = nerf_task.dataset.xforms_start[0]
        base = nerf_task.render(12, 12, xf)
        # crop to a thin slab then rotate it 90° — the visible content
        # must change (different world region crosses the crop)
        nerf_task.render_aabb_min = np.array([0.0, 0.45, 0.0], np.float32)
        nerf_task.render_aabb_max = np.array([1.0, 0.55, 1.0], np.float32)
        nerf_task.rebuild_jit_programs()
        slab_axis = nerf_task.render(12, 12, xf)
        rot = np.array([[0, 1, 0], [1, 0, 0], [0, 0, -1]], np.float32)
        nerf_task.render_aabb_to_local = rot
        nerf_task.rebuild_jit_programs()
        slab_rot = nerf_task.render(12, 12, xf)
        # restore
        nerf_task.render_aabb_min = np.array(nerf_task.aabb_min)
        nerf_task.render_aabb_max = np.array(nerf_task.aabb_max)
        nerf_task.render_aabb_to_local = np.eye(3, dtype=np.float32)
        nerf_task.rebuild_jit_programs()
        assert not np.allclose(slab_axis, base)
        assert not np.allclose(slab_rot, slab_axis)

    def test_identity_rotation_matches_plain_crop(self, nerf_task):
        xf = nerf_task.dataset.xforms_start[0]
        a = nerf_task.render(8, 8, xf)
        nerf_task.render_aabb_to_local = np.eye(3, dtype=np.float32)
        nerf_task.rebuild_jit_programs()
        b = nerf_task.render(8, 8, xf)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestCameraSetters:
    def test_extrinsics_roundtrip(self, nerf_task):
        m = np.array([[1, 0, 0, 0.3], [0, 1, 0, 0.4], [0, 0, 1, 0.5]],
                     np.float32)
        nerf_task.set_camera_extrinsics(1, m, convert_to_ngp=True)
        back = nerf_task.get_camera_extrinsics(1)
        np.testing.assert_allclose(back, m, atol=1e-5)
        # device tensor updated too
        np.testing.assert_allclose(
            np.asarray(nerf_task.data["xforms"][1]),
            nerf_task.dataset.xforms_start[1], atol=1e-6)
        # per-frame offsets were reset
        assert float(np.abs(np.asarray(nerf_task.state.cam["rot"][1])).max()) == 0.0

    def test_intrinsics(self, nerf_task):
        nerf_task.set_camera_intrinsics(0, fx=40.0, fy=0.0, cx=0.6, cy=-0.5)
        w, h = nerf_task.dataset.resolution
        assert nerf_task.dataset.focal_lengths[0][0] == 40.0
        assert nerf_task.dataset.focal_lengths[0][1] == 40.0  # fy<=0 → fx
        assert nerf_task.dataset.principal_points[0][0] == pytest.approx(
            0.6 / w)
        assert nerf_task.dataset.principal_points[0][1] == pytest.approx(0.5)

    def test_find_closest_training_view(self, nerf_task):
        pose = np.asarray(nerf_task.dataset.xforms_start[1], np.float32)
        pose = pose.copy()
        pose[:, 3] += 0.01
        i = nerf_task.find_closest_training_view(pose)
        assert 0 <= i < nerf_task.dataset.n_images


class TestDepthLossType:
    def test_depth_loss_type_changes_loss(self):
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset()
        h, w = ds.images.shape[1:3]
        ds.depths = np.full((ds.n_images, h, w), 0.5, np.float32)
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8)
        assert task.depth_supervision_lambda == 1.0
        task.train(1)
        task.depth_loss_type = "Huber"
        # NO manual rebuild_jit_programs(): the fingerprint check in
        # train() must retrace automatically
        loss = task.train(1)
        assert np.isfinite(loss)


class TestJitFingerprint:
    """The round-3 dt_scale bug class: mutating trace-time state
    without rebuild_jit_programs() silently kept stale programs.
    train()/render() now self-heal via the config fingerprint."""

    def test_mutation_triggers_retrace(self, nerf_task):
        import dataclasses as dc

        task = nerf_task
        task.train(1)
        assert task._jit_fingerprint() == task._jit_built_for
        task.march_cfg = dc.replace(task.march_cfg, dt_scale=2.0)
        assert task._jit_fingerprint() != task._jit_built_for
        task.train(1)  # auto-retrace
        assert task._jit_fingerprint() == task._jit_built_for
        task.march_cfg = dc.replace(task.march_cfg, dt_scale=1.0)
        xf = task.dataset.xforms_start[0]
        task.render(8, 8, xf)
        assert task._jit_fingerprint() == task._jit_built_for


class TestTestbedSurface:
    def _tb(self):
        import pyngp

        tb = pyngp.Testbed()
        return tb

    def test_create_empty_dataset_then_stream(self):
        tb = self._tb()
        ds = tb.create_empty_nerf_dataset(3, aabb_scale=1)
        assert ds.n_images == 3
        img = np.random.default_rng(0).random((64, 64, 4)).astype(np.float32)
        tb.nerf.training.set_image(1, img)
        tb.nerf.training.set_camera_extrinsics(
            1, np.eye(3, 4, dtype=np.float32), convert_to_ngp=False)
        assert tb.frame()  # one training tick runs

    def test_png_slices(self, tmp_path):
        tb = self._tb()
        tb.create_empty_nerf_dataset(2)
        out = tmp_path / "slices"
        res3d = tb.compute_and_save_png_slices(str(out), resolution=32)
        assert all(r >= 16 for r in res3d)
        files = list(tmp_path.glob("slices.density_slices_*.png"))
        assert len(files) == 1

    def test_compute_marching_cubes_mesh_dict(self):
        tb = self._tb()
        tb.create_empty_nerf_dataset(2)
        out = tb.compute_marching_cubes_mesh(resolution=(32, 32, 32))
        assert set(out.keys()) == {"V", "N", "C", "F"}

    def test_render_with_depth_api(self):
        tb = self._tb()
        tb.create_empty_nerf_dataset(2)
        frame, depth = tb.render_with_depth(16, 16)
        assert frame.shape == (16, 16, 4) and depth.shape == (16, 16)

    def test_misc_knobs(self):
        tb = self._tb()
        tb.create_empty_nerf_dataset(2)  # dof forwards to the task
        tb.dof = 0.1
        assert tb.aperture_size == 0.1
        tb.zoom = 2.0
        assert tb.crop_box.contains([0.5, 0.5, 0.5])
        tb.reset_accumulation(due_to_camera_movement=True)
        lens = tb.render_lens
        assert lens.params.shape == (7,)


class TestShampooOptimizer:
    def _spec_cfg(self):
        return {"otype": "Ema", "decay": 0.95, "nested": {
            "otype": "Shampoo", "learning_rate": 0.05, "beta1": 0.9,
            "beta2": 0.99, "beta3": 0.9, "beta_shampoo": 1.0,
            "identity": 1e-4, "frobenius_normalization": True,
        }}

    def test_shampoo_optimizes_a_quadratic(self):
        import jax
        import jax.numpy as jnp

        from instant_ngp_tpu.ops.optimizers import optimizer_from_config

        # anisotropic quadratic on a 8x4 matrix: the Kronecker
        # preconditioner must drive it down through jit
        key = jax.random.PRNGKey(0)
        target = jax.random.normal(key, (8, 4))
        scale_r = jnp.diag(jnp.array([1.0, 2.0, 4.0, 8.0]))
        params = {"W": jnp.zeros((8, 4)), "b": jnp.zeros((4,))}
        opt = optimizer_from_config(
            self._spec_cfg(), matrix_mask={"W": True, "b": False})
        state = opt.init(params)
        assert "L" in state and state["L"]["W"].shape == (8, 8)
        assert state["R"]["W"].shape == (4, 4)
        assert state["L"]["b"].shape == (1, 1)  # placeholder

        def loss(p):
            r = (p["W"] - target) @ scale_r
            return jnp.sum(r * r) + jnp.sum(p["b"] ** 2)

        l0 = float(loss(params))
        step = jax.jit(lambda p, s: opt.update(jax.grad(loss)(p), s, p))
        for _ in range(150):
            params, state = step(params, state)
        assert float(loss(params)) < 1e-4 * l0

    def test_unknown_otype_warns(self):
        import warnings

        from instant_ngp_tpu.ops.optimizers import OptimizerSpec

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            spec = OptimizerSpec.from_config({"otype": "Novograd"})
        assert spec.otype == "Adam"
        assert any("not implemented" in str(w.message) for w in rec)

    def test_adam_configs_with_shampoo_keys_stay_adam(self):
        from instant_ngp_tpu.ops.optimizers import OptimizerSpec

        # the reference's envmap block carries shampoo keys under Adam
        # (configs/nerf/base.json:85-98) — they must parse inertly
        spec = OptimizerSpec.from_config({
            "otype": "Adam", "beta_shampoo": 0.0, "identity": 1e-4,
            "cg_on_momentum": False, "frobenius_normalization": True,
        })
        assert spec.otype == "Adam"


class TestRenderBatch:
    def test_batch_matches_sequential(self, nerf_task):
        task = nerf_task
        cams = [task.dataset.xforms_start[0], task.dataset.xforms_start[1]]
        fls = [(20.0, 20.0), (22.0, 22.0)]
        pps = [(0.5, 0.5), (0.5, 0.5)]
        batch = task.render_batch(12, 10, cams, focal_lengths=fls,
                                  principal_points=pps)
        assert batch.shape == (2, 10, 12, 4)
        for i, cam in enumerate(cams):
            single = task.render(12, 10, cam, focal_length=fls[i],
                                 principal_point=pps[i])
            np.testing.assert_allclose(batch[i], single, atol=2e-2)


class TestSdfSignModesNonWatertight:
    def test_raystab_vs_pseudonormal_on_holed_mesh(self):
        """VERDICT r3 missing item 5: the PathEscape N/A claim rests on
        the substitutes' accuracy on NON-watertight meshes — measure
        it. GT signs come from the intact (watertight) bunny; the same
        query points are then signed against a holed copy (10% of
        faces deleted) under both modes. Raystab should degrade
        gracefully; this pins the numbers so the claim is measured,
        not asserted."""
        from instant_ngp_tpu.geometry.bvh import TriangleBvh
        from instant_ngp_tpu.geometry.mesh_io import load_mesh

        tris = np.asarray(load_mesh("/root/reference/data/sdf/bunny.obj"),
                          np.float32)  # (F, 3, 3)
        rng = np.random.default_rng(0)

        bvh_full = TriangleBvh(tris)
        keep = rng.random(len(tris)) > 0.10  # knock 10% holes
        bvh_holed = TriangleBvh(tris[keep])

        # query band near the surface, where the sign is hardest
        lo, hi = tris.reshape(-1, 3).min(0), tris.reshape(-1, 3).max(0)
        pts = (rng.random((4096, 3)).astype(np.float32)
               * (hi - lo + 0.2) + lo - 0.1)
        gt = bvh_full.signed_distance(pts, mode="watertight") < 0

        acc = {}
        for mode in ("raystab", "pseudonormal"):
            got = bvh_holed.signed_distance(pts, mode=mode) < 0
            acc[mode] = float((got == gt).mean())
        # both substitutes must stay accurate through 10% holes
        assert acc["raystab"] > 0.97, acc
        assert acc["pseudonormal"] > 0.90, acc
