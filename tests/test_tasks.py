"""End-to-end smoke tests for the four primitives (tiny configs, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY_OPT = {"otype": "Adam", "learning_rate": 1e-2, "beta1": 0.9, "beta2": 0.99,
            "epsilon": 1e-15, "l2_reg": 1e-6}


def tiny_config(loss="L2", levels=4, log2=12, neurons=16, hidden=1):
    return {
        "loss": {"otype": loss},
        "optimizer": TINY_OPT,
        "encoding": {"otype": "HashGrid", "n_levels": levels,
                     "n_features_per_level": 2, "log2_hashmap_size": log2,
                     "base_resolution": 4},
        "network": {"otype": "FullyFusedMLP", "activation": "ReLU",
                    "output_activation": "None", "n_neurons": neurons,
                    "n_hidden_layers": hidden},
    }


class TestImageTask:
    def test_fit_tiny_image(self):
        from instant_ngp_tpu.image_fit.task import ImageTask

        y, x = np.mgrid[0:32, 0:32] / 32.0
        img = np.stack(
            [np.sin(4 * x) * 0.5 + 0.5, y, x * y, np.ones_like(x)], -1
        ).astype(np.float32)
        task = ImageTask(img, is_hdr=True, config=tiny_config(), batch_size=4096,
                         linear_colors=True)
        task.train(60)
        mse = task.compute_mse()
        assert mse < 0.01, mse

    def test_render_shape(self):
        from instant_ngp_tpu.image_fit.task import ImageTask

        img = np.zeros((16, 16, 4), np.float32)
        task = ImageTask(img, is_hdr=True, config=tiny_config(), batch_size=1024)
        out = task.render(8, 8)
        assert out.shape == (8, 8, 3)


class TestSdfTask:
    @pytest.fixture(scope="class")
    def cube_tris(self):
        # unit cube centered at 0.5 with side 0.4
        lo, hi = 0.3, 0.7
        v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)])
        quads = [
            (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
            (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
        ]
        tris = []
        for a, b, c, d in quads:
            tris.append([v[a], v[b], v[c]])
            tris.append([v[a], v[c], v[d]])
        return np.asarray(tris, np.float32)

    def test_bvh_signed_distance(self, cube_tris):
        from instant_ngp_tpu.geometry.bvh import TriangleBvh

        bvh = TriangleBvh(cube_tris)
        pts = np.array([[0.5, 0.5, 0.5], [0.1, 0.5, 0.5], [0.5, 0.75, 0.5]], np.float32)
        for mode in ("watertight", "raystab", "pseudonormal"):
            d = bvh.signed_distance(pts, mode=mode)
            np.testing.assert_allclose(d[0], -0.2, atol=1e-4)
            np.testing.assert_allclose(d[1], 0.2, atol=1e-2)
            np.testing.assert_allclose(d[2], 0.05, atol=1e-4)

    def test_bvh_raytrace(self, cube_tris):
        from instant_ngp_tpu.geometry.bvh import TriangleBvh

        bvh = TriangleBvh(cube_tris)
        t, tri = bvh.raytrace(np.array([[0.5, 0.5, -1.0]]), np.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(t[0], 1.3, atol=1e-4)
        assert tri[0] >= 0

    def test_sdf_training_improves_iou(self, cube_tris):
        from instant_ngp_tpu.sdf.task import SdfTask

        task = SdfTask(cube_tris, tiny_config(loss="Mape"), batch_size=4096)
        task.train(40)
        iou = task.calculate_iou(n_samples=1 << 14)
        assert iou > 0.5, iou

    def test_sdf_render(self, cube_tris):
        from instant_ngp_tpu.sdf.task import SdfTask

        task = SdfTask(cube_tris, tiny_config(loss="Mape"), batch_size=2048)
        task.train(10)
        cam = np.array([[1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, 1, -1.0]], np.float32)
        frame = task.render(16, 16, cam, n_trace_steps=24)
        assert frame.shape == (16, 16, 4)
        assert np.isfinite(frame).all()


class TestVolumeTask:
    def test_volume_training(self):
        from instant_ngp_tpu.io.nanovdb import procedural_fog_volume
        from instant_ngp_tpu.volume.task import VolumeTask

        grid = procedural_fog_volume(32)
        task = VolumeTask(grid, tiny_config(), batch_size=4096)
        mse0 = task.compute_density_mse(1 << 12)
        task.train(30)
        mse1 = task.compute_density_mse(1 << 12)
        assert mse1 < mse0, (mse0, mse1)

    def test_volume_render(self):
        from instant_ngp_tpu.io.nanovdb import procedural_fog_volume
        from instant_ngp_tpu.volume.task import VolumeTask

        task = VolumeTask(procedural_fog_volume(16), tiny_config(), batch_size=1024)
        task.train(2)
        cam = np.array([[1, 0, 0, 0.5], [0, 1, 0, 0.5], [0, 0, 1, -1.2]], np.float32)
        frame = task.render(8, 8, cam)
        assert frame.shape == (8, 8, 4)
        assert np.isfinite(frame).all()


class TestSnapshot:
    def test_roundtrip_params(self, tmp_path):
        from instant_ngp_tpu.models.nerf_network import NerfNetwork
        from instant_ngp_tpu import snapshot as ss

        cfg = tiny_config()
        cfg["dir_encoding"] = {"otype": "SphericalHarmonics", "degree": 4}
        cfg["rgb_network"] = cfg["network"]
        model = NerfNetwork.from_config(cfg)
        params = jax.tree.map(np.asarray, model.init(jax.random.PRNGKey(0)))

        density = np.random.default_rng(0).random((2, 128, 128, 128)).astype(np.float32)
        path = tmp_path / "snap.ingp"
        ss.save_snapshot(path, cfg, params, "nerf", training_step=42,
                         density_grid=density)
        doc = ss.load_snapshot_file(path)
        snap = doc["snapshot"]
        assert snap["training_step"] == 42
        assert snap["mode"] == "nerf"
        restored = ss.restore_params(snap, params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_allclose(a, b, atol=2e-3)
        grid2 = ss.restore_density_grid(snap, 2)
        np.testing.assert_allclose(grid2, density, atol=1e-3)

    def test_morton_roundtrip(self):
        from instant_ngp_tpu.ops.morton import (
            dense_to_morton_perm, morton3d, morton3d_invert, morton_to_dense_perm,
        )

        x, y, z = morton3d_invert(morton3d(np.array([5]), np.array([9]), np.array([127])))
        assert (x[0], y[0], z[0]) == (5, 9, 127)
        p = dense_to_morton_perm(8)
        q = morton_to_dense_perm(8)
        np.testing.assert_array_equal(p[q], np.arange(512))


class TestExr:
    def test_exr_roundtrip(self, tmp_path):
        from instant_ngp_tpu.io.exr import read_exr, write_exr

        img = np.random.default_rng(0).random((33, 65, 4)).astype(np.float32)
        write_exr(tmp_path / "t.exr", img, half=False)
        img2 = read_exr(tmp_path / "t.exr")
        np.testing.assert_allclose(img2, img, atol=1e-6)


class TestTakikawa:
    def test_takikawa_encoding_and_training(self):
        import jax

        from instant_ngp_tpu.geometry.octree import TriangleOctree
        from instant_ngp_tpu.ops.takikawa import TakikawaEncoding

        lo, hi = 0.3, 0.7
        v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)])
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        tris = []
        for a, b, c, d in quads:
            tris.append([v[a], v[b], v[c]])
            tris.append([v[a], v[c], v[d]])
        tris = np.asarray(tris, np.float32)

        octree = TriangleOctree(tris, depth=4)
        assert octree.n_nodes(4) > 0
        # surface points inside, corner outside
        assert octree.contains(np.array([[0.3, 0.5, 0.5]]))[0]
        assert not octree.contains(np.array([[0.02, 0.02, 0.02]]))[0]

        enc = TakikawaEncoding(octree, n_features_per_level=2, start_level=3)
        params = enc.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.array([[0.3, 0.5, 0.5], [0.02, 0.02, 0.02]], np.float32))
        out = np.asarray(enc(params, x))
        assert out.shape == (2, enc.n_output_dims)
        assert np.abs(out[1]).max() == 0.0  # far outside octree → zeros

        # full SDF training with takikawa config
        from instant_ngp_tpu.sdf.task import SdfTask

        cfg = tiny_config(loss="Mape")
        cfg["encoding"] = {"otype": "Takikawa", "n_levels": 4,
                           "n_features_per_level": 2, "starting_level": 2}
        task = SdfTask(tris, cfg, batch_size=2048)
        l0 = task.train(2)
        task.train(20)
        l1 = task.train(2)
        assert np.isfinite(l1)


class TestVolumeRenderParity:
    def _task(self):
        from instant_ngp_tpu.volume.task import VolumeTask

        # small procedural blob grid
        x = np.linspace(-1, 1, 24)
        gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
        dens = np.maximum(0.0, 1.0 - 2 * (gx**2 + gy**2 + gz**2)).astype(np.float32)
        return VolumeTask(dens, tiny_config(levels=4, log2=10), batch_size=2048)

    def test_gt_render_modes(self):
        task = self._task()
        cam = np.concatenate([np.eye(3, dtype=np.float32),
                              np.array([[0.5], [0.5], [-1.2]], np.float32)], 1)
        gt = task.render(24, 24, cam, ground_truth=True)
        assert gt.shape == (24, 24, 4)
        assert np.isfinite(gt).all()
        # center rays pass through density → some absorb/scatter events
        assert gt[8:16, 8:16, 3].mean() > 0.05

    def test_learned_render_delta_tracked(self):
        task = self._task()
        task.train(30)
        cam = np.concatenate([np.eye(3, dtype=np.float32),
                              np.array([[0.5], [0.5], [-1.2]], np.float32)], 1)
        img = task.render(16, 16, cam)
        assert img.shape == (16, 16, 4)
        assert np.isfinite(img).all()
        # opacity concentrated at the blob (center > corners)
        a = img[..., 3]
        assert a[6:10, 6:10].mean() > a[:2, :2].mean()
