"""Exact LDR-ꟻLIP (metrics.flip): numerical parity with the evaluator
the reference vendors at scripts/flip/ (the published Andersson et al.
2020 algorithm), plus basic metric properties."""

import sys
from pathlib import Path

import numpy as np
import pytest

from instant_ngp_tpu.metrics import flip, flip_map

REF_FLIP = Path("/root/reference/scripts")


def _images(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    # smooth-ish base + noise so both color and feature pipelines engage
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([
        0.5 + 0.4 * np.sin(xx / 7.0),
        0.5 + 0.4 * np.cos(yy / 5.0),
        np.clip(xx / w, 0, 1),
    ], -1)
    ref = np.clip(base + 0.05 * rng.standard_normal((h, w, 3)), 0, 1)
    tst = np.clip(ref + 0.15 * rng.standard_normal((h, w, 3)), 0, 1)
    return ref.astype(np.float64), tst.astype(np.float64)


class TestFlipProperties:
    def test_identical_images_zero(self):
        ref, _ = _images()
        assert flip(ref, ref) < 1e-12

    def test_range_and_monotone_under_noise(self):
        ref, _ = _images()
        rng = np.random.default_rng(1)
        prev = 0.0
        for amp in (0.05, 0.15, 0.4):
            tst = np.clip(ref + amp * rng.standard_normal(ref.shape), 0, 1)
            val = flip(ref, tst)
            assert 0.0 <= val <= 1.0
            assert val > prev
            prev = val

    def test_map_shape(self):
        ref, tst = _images()
        m = flip_map(ref, tst)
        assert m.shape == ref.shape[:2]


@pytest.mark.skipif(not REF_FLIP.exists(), reason="reference not present")
class TestFlipParityWithReference:
    def test_matches_vendored_flip(self):
        """Compare against the reference's vendored evaluator on random
        images: the two implementations must agree to float precision
        (ours is separable-1D, theirs dense-2D — same math)."""
        sys.path.insert(0, str(REF_FLIP))
        try:
            import flip as ref_flip_pkg
        finally:
            sys.path.pop(0)
        ppd = 0.7 * (3840 / 0.7) * (np.pi / 180.0)
        for seed in (0, 3):
            ref, tst = _images(seed=seed)
            theirs = ref_flip_pkg.compute_flip(
                np.transpose(ref, (2, 0, 1)), np.transpose(tst, (2, 0, 1)),
                ppd).squeeze(0)
            ours = flip_map(ref, tst)
            np.testing.assert_allclose(ours, theirs, atol=1e-9)
