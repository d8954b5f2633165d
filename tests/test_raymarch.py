"""Tests for exponential-stepping math and the occupancy sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.common import (
    MAX_CONE_STEPSIZE,
    MIN_CONE_STEPSIZE,
    NERF_GRIDSIZE,
)
from instant_ngp_tpu.nerf.occupancy import (
    OccupancyGridState,
    _bitfield_from_density,
    _skip_chain,
    init_grid,
    occupied_at,
)
from instant_ngp_tpu.nerf.sampler import MarchConfig, march_rays
from instant_ngp_tpu.ops.raymarch import (
    advance_n_steps,
    calc_dt,
    distance_to_next_voxel,
    from_stepping_space,
    mip_from_pos,
    ray_intersect_aabb,
    to_stepping_space,
)


class TestSteppingSpace:
    def test_roundtrip(self):
        ca = 1.0 / 256.0
        t = jnp.array([1e-3, 0.01, 0.1, 0.5, 1.0, 3.0, 10.0])
        s = to_stepping_space(t, ca)
        t2 = from_stepping_space(s, ca)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-4)

    def test_zero_cone_angle_uniform(self):
        t = jnp.array([0.5])
        np.testing.assert_allclose(
            np.asarray(calc_dt(t, 0.0)), MIN_CONE_STEPSIZE, rtol=1e-5
        )

    def test_dt_bounds(self):
        ca = 1.0 / 256.0
        t = jnp.linspace(1e-3, 20.0, 100)
        dt = np.asarray(calc_dt(t, ca))
        assert (dt >= MIN_CONE_STEPSIZE * 0.99).all()
        assert (dt <= MAX_CONE_STEPSIZE * 1.01).all()

    def test_dt_grows_with_t(self):
        ca = 1.0 / 256.0
        t = jnp.array([0.05, 0.2, 1.0, 4.0])
        dt = np.asarray(calc_dt(t, ca))
        assert (np.diff(dt) >= -1e-6).all()

    def test_advance_n_steps_monotone(self):
        ca = 1.0 / 256.0
        t0 = jnp.array([0.3])
        ts = [float(advance_n_steps(t0, ca, n)[0]) for n in range(5)]
        assert all(b > a for a, b in zip(ts, ts[1:]))


class TestGeometry:
    def test_aabb_intersect(self):
        o = jnp.array([[-1.0, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        tmin, tmax = ray_intersect_aabb(o, d, jnp.zeros(3), jnp.ones(3))
        np.testing.assert_allclose(np.asarray(tmin), [1.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(tmax), [2.0], atol=1e-5)

    def test_aabb_miss(self):
        o = jnp.array([[-1.0, 5.0, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        tmin, tmax = ray_intersect_aabb(o, d, jnp.zeros(3), jnp.ones(3))
        assert float(tmin[0]) > float(tmax[0])

    def test_distance_to_next_voxel_positive(self):
        pos = jnp.array([[0.51, 0.52, 0.53]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        d = d / jnp.linalg.norm(d)
        idir = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        dist = distance_to_next_voxel(pos, d, idir, 128.0)
        assert 0 < float(dist[0]) <= np.sqrt(3) / 128 + 1e-5

    def test_mip_from_pos(self):
        pos = jnp.array([[0.5, 0.5, 0.5], [0.9, 0.5, 0.5], [1.4, 0.5, 0.5], [2.4, 0.5, 0.5]])
        mips = np.asarray(mip_from_pos(pos, 7))
        assert mips[0] == 0
        assert mips[1] == 0  # |0.4| < 0.5
        assert mips[2] == 1  # |0.9| needs cascade 1 (extent 1)
        assert mips[3] == 2


class TestOccupancy:
    def test_bitfield_threshold_and_mip(self):
        n_casc = 2
        G = NERF_GRIDSIZE
        density = jnp.zeros((n_casc, G, G, G))
        density = density.at[0, 64, 64, 64].set(1.0)
        bits = _bitfield_from_density(density, jnp.float32(0.5))
        assert bool(bits[0, 64, 64, 64])
        assert not bool(bits[0, 0, 0, 0])
        # mip 1 center region should have the pooled bit at 32+64//2
        assert bool(bits[1, 32 + 32, 32 + 32, 32 + 32])

    def test_occupied_at(self):
        G = NERF_GRIDSIZE
        bits = jnp.zeros((8, G, G, G), bool)
        bits = bits.at[0, 64, 64, 64].set(True)
        pos = jnp.array([[(64.5) / G, (64.5) / G, (64.5) / G]])
        assert bool(occupied_at(bits, pos, jnp.array([0]))[0])
        pos2 = jnp.array([[0.1, 0.1, 0.1]])
        assert not bool(occupied_at(bits, pos2, jnp.array([0]))[0])
        # out of [0,1) at mip 0 → not occupied
        pos3 = jnp.array([[1.5, 0.5, 0.5]])
        assert not bool(occupied_at(bits, pos3, jnp.array([0]))[0])


class TestMarch:
    def test_march_through_fully_occupied(self):
        bits = jnp.ones((8, 128, 128, 128), bool)
        cfg = MarchConfig(n_march_iters=64, max_samples_per_ray=16, cone_angle=0.0, max_mip=0)
        o = jnp.array([[-0.2, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        jit = jnp.array([0.5])
        ts, dts, valid, t_exit, n_valid = march_rays(
            o, d, _skip_chain(bits), jnp.zeros(3), jnp.ones(3), jit, cfg
        )
        assert int(n_valid[0]) == 16  # K filled
        v = np.asarray(valid[0])
        assert v.all()
        tt = np.asarray(ts[0])
        assert (np.diff(tt) > 0).all()
        # uniform stepping: dt == MIN_CONE_STEPSIZE
        np.testing.assert_allclose(np.asarray(dts[0]), MIN_CONE_STEPSIZE, rtol=1e-4)
        # samples inside the aabb along x
        assert tt[0] >= 0.2 - 1e-4

    def test_march_skips_empty(self):
        bits = jnp.zeros((8, 128, 128, 128), bool)
        # occupy a slab x in [0.5, 0.55]
        bits = bits.at[0, 64:71, :, :].set(True)
        cfg = MarchConfig(n_march_iters=128, max_samples_per_ray=32, cone_angle=0.0, max_mip=0)
        o = jnp.array([[-0.5, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        ts, dts, valid, t_exit, n_valid = march_rays(
            o, d, _skip_chain(bits), jnp.zeros(3), jnp.ones(3), jnp.array([0.5]), cfg
        )
        assert int(n_valid[0]) > 0
        xs = np.asarray(o[0, 0] + ts[0] * 1.0)[np.asarray(valid[0])]
        assert (xs >= 64 / 128 - 0.02).all() and (xs <= 71 / 128 + 0.02).all()

    def test_march_empty_grid_no_samples(self):
        bits = jnp.zeros((8, 128, 128, 128), bool)
        cfg = MarchConfig(n_march_iters=64, max_samples_per_ray=8, cone_angle=0.0, max_mip=0)
        o = jnp.array([[-0.5, 0.5, 0.5]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        ts, dts, valid, t_exit, n_valid = march_rays(
            o, d, _skip_chain(bits), jnp.zeros(3), jnp.ones(3), jnp.array([0.5]), cfg
        )
        assert int(n_valid[0]) == 0
        assert not np.asarray(valid).any()
