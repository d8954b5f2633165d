"""Foveation warp: inverse consistency, density concentration, e2e."""
import numpy as np

import __graft_entry__ as g

from instant_ngp_tpu.render.foveation import Foveation, PiecewiseQuadratic


def test_warp_unwarp_roundtrip_and_endpoints():
    # NOTE the fit (like the reference's) is only monotone when the
    # focus slope satisfies switch_left ≥ 1 − 1/steepness; use a
    # feasible configuration.
    pq = PiecewiseQuadratic.fit(1.2, 0.5, 0.1)
    x = np.linspace(0, 1, 257)
    y = pq.warp(x)
    # endpoints map to endpoints; monotone
    assert abs(y[0]) < 1e-6 and abs(y[-1] - 1) < 1e-5
    assert np.all(np.diff(y) > 0)
    np.testing.assert_allclose(pq.unwarp(y), x, atol=1e-5)


def test_density_peaks_at_focus():
    pq = PiecewiseQuadratic.fit(1.2, 0.5, 0.1)
    d_focus = pq.density(pq.unwarp(0.5))
    d_edge = min(pq.density(0.0), pq.density(1.0))
    assert d_focus > 1.5 * d_edge  # focus gets extra pixel density
    # density integrates to ~1 (warp spans [0,1])
    x = np.linspace(0, 1, 4097)
    integral = np.trapezoid(pq.density(x), x)
    assert abs(integral - 1.0) < 1e-2


def test_identity_when_steepness_one():
    pq = PiecewiseQuadratic.fit(1.0, 0.5, 0.2)
    x = np.linspace(0, 1, 65)
    np.testing.assert_allclose(pq.warp(x), x, atol=1e-6)


def test_render_foveated_end_to_end():
    from instant_ngp_tpu.nerf.task import NerfTask
    from instant_ngp_tpu.render.foveation import render_foveated

    ds = g._synthetic_dataset()
    task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=64,
                    max_samples_per_ray=4, n_march_iters=8,
                    use_error_map=False)
    task.train(1)
    fov = Foveation.make(steepness=(2.0, 2.0), focus=(0.5, 0.5))
    out = render_foveated(task, 32, 32, ds.xforms_start[0], fov, scale=0.5)
    assert out.shape == (32, 32, 4)
    assert np.isfinite(out).all()
