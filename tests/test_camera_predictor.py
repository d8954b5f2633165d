"""Camera predictor (render/camera_predictor.py — reference
MatLogCameraPredictor, common_host.h:156-253)."""

import numpy as np
import pytest

from instant_ngp_tpu.render.camera_predictor import (
    CameraPredictionMode,
    MatLogCameraPredictor,
    make_predictor,
    mat_exp,
    mat_log,
    se3_exp,
    se3_log,
)


def pose(angle, t):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(4)
    m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    m[:3, 3] = t
    return m


class TestLieOps:
    def test_se3_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            m = pose(rng.uniform(-2, 2), rng.normal(size=3))
            np.testing.assert_allclose(se3_exp(se3_log(m)), m, atol=1e-8)

    def test_matlog_roundtrip(self):
        m = pose(0.7, [0.1, -0.2, 0.3])
        np.testing.assert_allclose(mat_exp(mat_log(m)), m, atol=1e-8)

    def test_se3_small_angle(self):
        m = pose(1e-10, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(se3_exp(se3_log(m)), m, atol=1e-8)


class TestPredictor:
    @pytest.mark.parametrize("se3", [False, True])
    @pytest.mark.parametrize("quadratic", [False, True])
    def test_constant_velocity_prediction(self, se3, quadratic):
        """Camera rotating at constant angular velocity + translating:
        the predictor should extrapolate the next pose accurately."""
        pred = MatLogCameraPredictor(is_quadratic=quadratic, is_se3=se3,
                                     half_life_s=0.0)
        dt = 1.0 / 60.0
        w = 0.8  # rad/s
        v = np.array([0.5, 0.0, 0.2])
        for i in range(60):
            pred.sample_camera(pose(w * i * dt, v * i * dt), dt)
        future = pred.predict_camera(2 * dt)
        expect = pose(w * 61 * dt, v * 61 * dt)[:3, :4]
        np.testing.assert_allclose(future, expect, atol=2e-2)

    def test_static_camera_stays_put(self):
        pred = MatLogCameraPredictor()
        m = pose(0.3, [1, 2, 3])
        for _ in range(5):
            pred.sample_camera(m, 1 / 60)
        np.testing.assert_allclose(pred.predict_camera(0.1), m[:3, :4], atol=1e-6)

    def test_sequence_endpoints(self):
        pred = MatLogCameraPredictor(is_quadratic=True)
        for i in range(10):
            pred.sample_camera(pose(0.1 * i, [0, 0, 0]), 1 / 30)
        seq = pred.predict_camera_sequence(0.2, 16)
        assert len(seq) == 16
        np.testing.assert_allclose(seq[0], pred._prev_cam[:3, :4])

    def test_factory(self):
        assert make_predictor("none") is None
        p = make_predictor(CameraPredictionMode.SE3_QUADRATIC)
        assert p.is_se3 and p.is_quadratic
