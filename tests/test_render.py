"""Tests for lens models, render buffer, camera path, snapshot grid."""

import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.common import ColorSpace, TonemapCurve
from instant_ngp_tpu.render.buffer import DynamicResolution, RenderBuffer, tonemap
from instant_ngp_tpu.render.camera import (
    iterative_opencv_undistortion,
    opencv_distort,
    so3_exp,
)
from instant_ngp_tpu.render.camera_path import CameraPath, Keyframe, quat_to_rotmat, rotmat_to_quat


class TestLens:
    def test_opencv_undistortion_inverts_distortion(self):
        k1, k2, p1, p2 = 0.0578421, -0.0805099, -0.000980296, 0.00015575  # fox lens
        x = jnp.linspace(-0.4, 0.4, 9)
        y = jnp.linspace(-0.3, 0.3, 9)
        xd, yd = opencv_distort(x, y, k1, k2, p1, p2)
        xu, yu = iterative_opencv_undistortion(xd, yd, k1, k2, p1, p2)
        np.testing.assert_allclose(np.asarray(xu), np.asarray(x), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yu), np.asarray(y), atol=1e-5)

    def test_so3_exp_rotation(self):
        # 90° about z
        R = np.asarray(so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
        np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-6)
        # identity for zero
        np.testing.assert_allclose(np.asarray(so3_exp(jnp.zeros(3))), np.eye(3), atol=1e-6)


class TestRenderBuffer:
    def test_accumulation_average(self):
        buf = RenderBuffer(4, 4)
        buf.accumulate(np.full((4, 4, 4), 1.0, np.float32))
        buf.accumulate(np.full((4, 4, 4), 3.0, np.float32))
        np.testing.assert_allclose(buf.accum, 2.0)
        assert buf.spp == 2

    def test_tonemap_curves(self):
        x = jnp.array([0.0, 0.18, 1.0, 4.0])
        for curve in TonemapCurve:
            y = np.asarray(tonemap(x, curve))
            assert (np.diff(y) >= -1e-6).all(), curve  # monotone
            assert y[0] <= 1e-6

    def test_dynamic_res_adapts(self):
        dr = DynamicResolution(target_fps=20)
        for _ in range(50):
            f = dr.update(10.0)  # fast frames → res grows
        assert f > 0.5
        for _ in range(100):
            f = dr.update(500.0)  # slow frames → res shrinks
        assert f < 0.2


class TestCameraPath:
    def test_quat_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            w = rng.normal(size=3)
            R = np.asarray(so3_exp(jnp.asarray(w)))
            q = rotmat_to_quat(R)
            R2 = quat_to_rotmat(q / np.linalg.norm(q))
            np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_path_interpolation_endpoints(self):
        m0 = np.hstack([np.eye(3), [[0], [0], [0]]]).astype(np.float32)
        m1 = np.hstack([np.eye(3), [[1], [2], [3]]]).astype(np.float32)
        cp = CameraPath()
        cp.add_camera(m0, fov=40)
        cp.add_camera(m1, fov=60)
        k = cp.eval(0.0)
        np.testing.assert_allclose(k.to_matrix()[:, 3], [0, 0, 0], atol=1e-5)
        k = cp.eval(1.0)
        np.testing.assert_allclose(k.to_matrix()[:, 3], [1, 2, 3], atol=1e-4)

    def test_save_load_roundtrip(self, tmp_path):
        cp = CameraPath()
        cp.add_camera(np.hstack([np.eye(3), [[0.1], [0.2], [0.3]]]).astype(np.float32), fov=45)
        cp.save(tmp_path / "path.json")
        cp2 = CameraPath.load(tmp_path / "path.json")
        assert len(cp2.keyframes) == 1
        np.testing.assert_allclose(cp2.keyframes[0].T, [0.1, 0.2, 0.3], atol=1e-6)
        assert cp2.keyframes[0].fov == 45


class TestDisneyBRDF:
    def test_backfacing_gets_ambient_only(self):
        import jax.numpy as jnp

        from instant_ngp_tpu.render.brdf import BRDFParams, evaluate_shading

        brdf = BRDFParams()
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        L = jnp.asarray([0.0, 0.0, -1.0])  # light behind the surface
        V = jnp.asarray([0.0, 0.0, 1.0])
        out = evaluate_shading(brdf.basecolor, (0.2, 0.2, 0.2), (1.0, 1.0, 1.0),
                               brdf, L, V, N)
        amb = evaluate_shading(brdf.basecolor, (0.2, 0.2, 0.2), (0.0, 0.0, 0.0),
                               brdf, L, V, N)
        import numpy as np
        np.testing.assert_allclose(np.asarray(out), np.asarray(amb), atol=1e-6)
        assert np.asarray(out).max() < 0.25  # ambient-scale only

    def test_frontal_brighter_than_grazing(self):
        import numpy as np
        import jax.numpy as jnp

        from instant_ngp_tpu.render.brdf import BRDFParams, evaluate_shading

        brdf = BRDFParams()
        N = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        V = jnp.asarray([0.0, 0.0, 1.0])
        L_frontal = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        g = np.array([0.995, 0.0, 0.0999])  # near-grazing
        g = g / np.linalg.norm(g)
        out_f = evaluate_shading(brdf.basecolor, (0, 0, 0), (1, 1, 1), brdf,
                                 jnp.asarray([0.0, 0.0, 1.0]), V, N)
        out_g = evaluate_shading(brdf.basecolor, (0, 0, 0), (1, 1, 1), brdf,
                                 jnp.asarray(g), V, N)
        assert float(out_f.mean()) > float(out_g.mean())
        assert np.isfinite(np.asarray(out_f)).all()
        assert np.isfinite(np.asarray(out_g)).all()


class TestMeshOptimizer:
    def test_vertices_move_toward_isosurface(self):
        """optimise_mesh must reduce |density - thresh| at the vertices
        (reference optimise_mesh_step on an analytic sphere field)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        import __graft_entry__ as g
        from instant_ngp_tpu.geometry.marching_cubes import (
            marching_tetrahedra,
            optimise_mesh,
        )
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset()
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8,
                        use_error_map=False)

        class StubModel:
            def density(self, params, p):
                d2 = jnp.sum((p - 0.5) ** 2, -1, keepdims=True)
                logit = (0.35**2 - d2) * 40.0
                return jnp.concatenate([logit, jnp.zeros((p.shape[0], 15))], -1)

        task.model = StubModel()
        res = 20
        xs = (np.arange(res) + 0.5) / res
        gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
        vals = np.exp(np.clip(
            np.asarray(StubModel().density(None, jnp.asarray(pts))[:, 0]),
            -15, 15))
        field = 2.5 - vals.reshape(res, res, res)
        verts, faces = marching_tetrahedra(field, 0.0)
        verts = (verts + 0.5) / res
        assert len(verts) > 100

        def iso_err(v):
            d2 = np.sum((v - 0.5) ** 2, -1)
            dens = np.exp(np.clip((0.35**2 - d2) * 40.0, -15, 15))
            return np.abs(dens - 2.5).mean()

        v2 = optimise_mesh(task, verts, faces, n_steps=5, thresh=2.5)
        assert np.isfinite(v2).all()
        assert iso_err(v2) < 0.85 * iso_err(verts)


class TestNewRenderModes:
    def _task(self):
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8,
                        optimize_distortion=True)
        task.train(2)
        return task, ds

    def test_distortion_and_slice_modes(self):
        import numpy as np

        task, ds = self._task()
        for mode in ("distortion", "slice"):
            frame = task.render(8, 8, ds.xforms_start[0],
                                focal_length=(20.0, 20.0), render_mode=mode)
            assert frame.shape == (8, 8, 4)
            assert np.isfinite(frame).all()


class TestFastRenderMode:
    def test_fast_mode_close_to_exact(self):
        import numpy as np
        import __graft_entry__ as g
        from instant_ngp_tpu.nerf.task import NerfTask

        ds = g._synthetic_dataset(n_images=2, w=16, h=16)
        task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                        max_samples_per_ray=4, n_march_iters=8)
        task.train(8)
        kw = dict(focal_length=(20.0, 20.0), background=(0, 0, 0, 0))
        exact = task.render(12, 12, ds.xforms_start[0], **kw)
        fast = task.render(12, 12, ds.xforms_start[0],
                           render_quality="fast", **kw)
        assert np.isfinite(fast).all()
        # unbiased feature sampling: images differ by bounded grain
        assert np.abs(fast - exact).mean() < 0.2
