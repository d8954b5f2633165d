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


def flip(reference, test, ppd: float = 67.0) -> float:
    """Mean ꟻLIP error (LDR-FLIP, Andersson et al. 2020) — the metric
    scripts/common.py exposes via the vendored scripts/flip/.

    Compact implementation: sRGB → linear → YCxCz opponent space,
    per-channel spatial CSF filtering (Gaussian approximations of the
    achromatic/chromatic CSFs at `ppd` pixels-per-degree), HyAB color
    difference with the FLIP redistribution exponent, combined with a
    feature (edge/point) difference term.
    """
    import numpy as np

    def srgb2lin(c):
        c = np.clip(np.asarray(c, np.float64), 0, 1)
        return np.where(c < 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)

    def lin2xyz(c):
        m = np.array([
            [0.4124, 0.3576, 0.1805],
            [0.2126, 0.7152, 0.0722],
            [0.0193, 0.1192, 0.9505],
        ])
        return c @ m.T

    def xyz2ycxcz(c):
        ref = np.array([0.9505, 1.0, 1.0888])
        c = c / ref
        y = 116.0 * c[..., 1] - 16.0
        cx = 500.0 * (c[..., 0] - c[..., 1])
        cz = 200.0 * (c[..., 1] - c[..., 2])
        return np.stack([y, cx, cz], -1)

    def gauss_blur(img, sigma):
        if sigma <= 0:
            return img
        r = max(1, int(3 * sigma))
        x = np.arange(-r, r + 1)
        g = np.exp(-(x**2) / (2 * sigma**2))
        g /= g.sum()
        out = np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 0, img)
        out = np.apply_along_axis(lambda m: np.convolve(m, g, mode="same"), 1, out)
        return out

    def hunt(ycc):
        # Hunt adjustment: scale chroma by luminance
        l = 0.01 * ycc[..., 0]
        return np.stack([ycc[..., 0], l * ycc[..., 1], l * ycc[..., 2]], -1)

    ref = xyz2ycxcz(lin2xyz(srgb2lin(reference[..., :3])))
    tst = xyz2ycxcz(lin2xyz(srgb2lin(test[..., :3])))

    # CSF filtering: Gaussian stddevs (in pixels) approximating the
    # achromatic / red-green / blue-yellow CSFs at the given ppd
    sigmas = np.array([0.0047, 0.0053, 0.04]) * ppd
    ref_f = np.stack([gauss_blur(ref[..., i], sigmas[i]) for i in range(3)], -1)
    tst_f = np.stack([gauss_blur(tst[..., i], sigmas[i]) for i in range(3)], -1)
    ref_h, tst_h = hunt(ref_f), hunt(tst_f)

    # HyAB color difference, normalized + redistributed
    d = np.abs(ref_h[..., 0] - tst_h[..., 0]) + np.sqrt(
        (ref_h[..., 1] - tst_h[..., 1]) ** 2 + (ref_h[..., 2] - tst_h[..., 2]) ** 2
    )
    cmax = 203.0  # max HyAB over the sRGB gamut after Hunt adjustment
    pc, pt, qc = 0.4, 0.95, 0.7
    d = (d / cmax) ** qc
    color_err = np.where(
        d < pc, (pt / pc) * d, pt + ((d - pc) / (1 - pc)) * (1 - pt)
    )

    # feature difference: edge/point detector on luminance
    y_ref = (ref[..., 0] + 16.0) / 116.0
    y_tst = (tst[..., 0] + 16.0) / 116.0
    sigma_f = 0.5 * 0.082 * ppd
    e_ref = np.abs(gauss_blur(y_ref, sigma_f) - y_ref)
    e_tst = np.abs(gauss_blur(y_tst, sigma_f) - y_tst)
    feat_err = np.clip(np.abs(e_ref - e_tst) * (1.0 / 0.2), 0, 1) ** 0.5

    err = color_err ** (1.0 - feat_err)
    return float(np.mean(err))


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
