"""Quality metrics: MSE/PSNR/SSIM/L1/MAPE/SMAPE.

Protocol parity with the reference's scripts/common.py:175-253 (the
PSNR/SSIM eval used by scripts/run.py --test_transforms) and
Testbed::compute_image_mse (testbed_image.cu:490-547).
"""

from __future__ import annotations

import numpy as np


def mse(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))


def mse_to_psnr(x: float) -> float:
    return -10.0 * np.log(max(x, 1e-30)) / np.log(10.0)


def psnr(a, b) -> float:
    return mse_to_psnr(mse(a, b))


def l1(a, b):
    return float(np.mean(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def mape(ref, img):
    ref, img = np.asarray(ref, np.float64), np.asarray(img, np.float64)
    return float(np.mean(np.abs(img - ref) / (np.abs(ref) + 1e-2)))


def smape(ref, img):
    ref, img = np.asarray(ref, np.float64), np.asarray(img, np.float64)
    return float(np.mean(2.0 * np.abs(img - ref) / (np.abs(ref) + np.abs(img) + 1e-2)))


def ssim(a, b, data_range: float = 1.0) -> float:
    """Mean SSIM with an 11×11 Gaussian window (σ=1.5), per channel —
    the standard formulation scripts/common.py relies on via skimage."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]

    # 11-tap Gaussian
    r = 5
    x = np.arange(-r, r + 1)
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()

    def blur(img):
        out = img
        out = np.apply_along_axis(lambda m: np.convolve(m, g, mode="valid"), 0, out)
        out = np.apply_along_axis(lambda m: np.convolve(m, g, mode="valid"), 1, out)
        return out

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = blur(a), blur(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = blur(a * a) - mu_aa
    s_bb = blur(b * b) - mu_bb
    s_ab = blur(a * b) - mu_ab
    ssim_map = ((2 * mu_ab + c1) * (2 * s_ab + c2)) / ((mu_aa + mu_bb + c1) * (s_aa + s_bb + c2))
    return float(np.mean(ssim_map))
