"""Camera/lens models: uv → ray generation with the reference's full
lens stack (common_device.cuh:268-527): perspective, OpenCV radial/
tangential (iterative undistortion), OpenCV fisheye, F-theta, lat-long,
equirectangular, orthographic. All jnp, differentiable (pose/lens
optimization gets gradients through here for free, unlike the
reference's hand-written gradient kernels)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import LensMode


def iterative_opencv_undistortion(u, v, k1, k2, p1, p2, n_iters: int = 8):
    """Invert the OpenCV distortion model by fixed-point iteration
    (reference iterative_opencv_lens_undistortion)."""
    x, y = u, v
    for _ in range(n_iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + k2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (u - dx) / radial
        y = (v - dy) / radial
    return x, y


def opencv_distort(x, y, k1, k2, p1, p2):
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + k2 * r2)
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return x * radial + dx, y * radial + dy


def fisheye_undistortion(u, v, k1, k2, k3, k4, n_iters: int = 8):
    theta_d = jnp.sqrt(u * u + v * v)
    theta = theta_d
    for _ in range(n_iters):
        t2 = theta * theta
        theta = theta_d / (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    scale = jnp.where(theta_d > 1e-8, jnp.tan(theta) / jnp.maximum(theta_d, 1e-8), 1.0)
    return u * scale, v * scale


def latlong_to_dir(u, v):
    phi = (v - 0.5) * jnp.pi
    theta = (u - 0.5) * 2.0 * jnp.pi
    cp = jnp.cos(phi)
    return jnp.stack([jnp.sin(theta) * cp, jnp.sin(phi), jnp.cos(theta) * cp], -1)


def equirectangular_to_dir(u, v):
    return latlong_to_dir(u, 1.0 - v)


def f_theta_dir(uv_centered, params):
    """F-theta (fisheye polynomial) lens → camera-space direction
    (reference f_theta_undistortion, common_device.cuh:368-380).
    params: (r0..r4, width, height) — the uv offset is rescaled to the
    intrinsics' own resolution; alpha = poly4(norm_pixels); direction
    = (sinα·x̂, sinα·ŷ, cosα). Degenerate pixels (cosα ≤ 0 or center)
    return the zero vector — callers treat those rays as invalid (the
    reference's Ray::invalid)."""
    xpix = uv_centered[:, 0] * params[5]
    ypix = uv_centered[:, 1] * params[6]
    norm = jnp.sqrt(xpix * xpix + ypix * ypix)
    alpha = params[0] + norm * (
        params[1] + norm * (params[2] + norm * (params[3] + norm * params[4]))
    )
    sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)
    bad = (cos_a <= jnp.finfo(jnp.float32).tiny) | (norm == 0.0)
    inv_norm = jnp.where(norm == 0.0, 0.0, 1.0 / jnp.maximum(norm, 1e-30))
    d = jnp.stack([sin_a * inv_norm * xpix, sin_a * inv_norm * ypix, cos_a], -1)
    return jnp.where(bad[:, None], 0.0, d)


def uv_to_dir_cam(uv, resolution, focal_length, principal_point,
                  lens_mode: LensMode = LensMode.PERSPECTIVE, lens_params=None):
    """uv (N,2) → camera-space directions (N,3), z-forward convention
    (reference uv_to_ray, common_device.cuh). For ORTHOGRAPHIC use
    uv_to_ray_cam — the pixel offset belongs in the ray ORIGIN."""
    return uv_to_ray_cam(uv, resolution, focal_length, principal_point,
                         lens_mode=lens_mode, lens_params=lens_params)[0]


def uv_to_ray_cam(uv, resolution, focal_length, principal_point,
                  lens_mode: LensMode = LensMode.PERSPECTIVE, lens_params=None):
    """uv (N,2) → (dir_cam (N,3), origin_offset_cam (N,3)).

    The origin offset is zero for all lenses except ORTHOGRAPHIC,
    where the pixel displacement rides on the ray origin (reference
    uv_to_ray, common_device.cuh:448-455 head_pos +=)."""
    w, h = resolution
    fx = focal_length[..., 0]
    fy = focal_length[..., 1]
    cx = principal_point[..., 0]
    cy = principal_point[..., 1]
    u = (uv[:, 0] - cx) * w / fx
    v = (uv[:, 1] - cy) * h / fy
    zeros3 = jnp.zeros((uv.shape[0], 3), uv.dtype)

    if lens_mode == LensMode.LATLONG:
        return latlong_to_dir(uv[:, 0], uv[:, 1]), zeros3
    if lens_mode == LensMode.EQUIRECTANGULAR:
        return equirectangular_to_dir(uv[:, 0], uv[:, 1]), zeros3
    if lens_mode == LensMode.FTHETA:
        if lens_params is None:
            raise ValueError("F-theta lens requires its 7 intrinsic params")
        uv_c = jnp.stack([uv[:, 0] - cx, uv[:, 1] - cy], -1)
        return f_theta_dir(uv_c, lens_params), zeros3
    if lens_mode == LensMode.OPENCV and lens_params is not None:
        k1, k2, p1, p2 = lens_params[0], lens_params[1], lens_params[2], lens_params[3]
        u, v = iterative_opencv_undistortion(u, v, k1, k2, p1, p2)
    elif lens_mode == LensMode.OPENCV_FISHEYE and lens_params is not None:
        u, v = fisheye_undistortion(
            u, v, lens_params[0], lens_params[1], lens_params[2], lens_params[3]
        )
    elif lens_mode == LensMode.ORTHOGRAPHIC:
        dirs = jnp.stack([jnp.zeros_like(u), jnp.zeros_like(u), jnp.ones_like(u)], -1)
        off = jnp.stack([u, v, jnp.zeros_like(u)], -1)
        return dirs, off
    return jnp.stack([u, v, jnp.ones_like(u)], -1), zeros3


def so3_exp(w):
    """Rodrigues: (…,3) axis-angle → (…,3,3) rotation. Used for the
    per-image rotation offsets of pose optimization (the reference's
    RotationAdamOptimizer works in the same tangent space).

    Uses the unnormalized form R = I + a·K + b·K² with K = skew(w),
    a = sin(θ)/θ, b = (1−cos(θ))/θ² and Taylor fallbacks near θ=0 so
    gradients are exact at the identity (a normalized-axis formulation
    has vanishing/NaN gradients at w=0, which is where pose offsets
    start)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    K = jnp.stack(
        [
            jnp.stack([zero, -wz, wy], -1),
            jnp.stack([wz, zero, -wx], -1),
            jnp.stack([-wy, wx, zero], -1),
        ],
        -2,
    )
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    # guard the non-Taylor branch's inputs so its (unused) gradient is
    # finite — jnp.where differentiates both branches
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    return jnp.eye(3) + a * K + b * (K @ K)


def so3_log(R):
    """Inverse of so3_exp: (…,3,3) rotation → (…,3) axis-angle, with
    Taylor guards near θ=0 (not valid at θ=π, which camera slerp over
    a frame's exposure never approaches)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )  # = 2·sin(θ)·axis
    small = theta < 1e-4
    sin = jnp.where(small, 1.0, jnp.sin(theta))
    factor = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin))
    return w * factor[..., None]


def camera_slerp(xform_start, xform_end, t):
    """Geodesic interpolation between two (…,3,4) camera matrices:
    rotation along the SO(3) geodesic (equals quaternion slerp),
    translation lerped (reference camera_slerp,
    common_device.cuh:664-668). t broadcasts over leading dims."""
    Rs, Re = xform_start[..., :3], xform_end[..., :3]
    ts_, te = xform_start[..., 3], xform_end[..., 3]
    w = so3_log(Re @ jnp.swapaxes(Rs, -1, -2))
    t = jnp.asarray(t)[..., None]
    R = so3_exp(w * t) @ Rs
    trans = ts_ * (1.0 - t) + te * t
    return jnp.concatenate([R, trans[..., None]], axis=-1)
