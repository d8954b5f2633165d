"""Procedural Blender-synthetic-style NeRF dataset generator.

BASELINE.json names the Blender lego scene as a benchmark config, but
this environment ships no synthetic asset (only fox). This module
stands in: an ANALYTIC scene (colored boxes + spheres with sharp
edges) is volume-integrated to ground-truth RGBA images with the exact
conventions the Blender scenes exercise — transparent background
composited to straight-alpha PNGs, sRGB color, transforms.json in the
nerf convention (camera_angle_x + transform_matrix) like
/root/reference/data/nerf/fox/transforms.json, eval protocol per
/root/reference/scripts/run.py:257-317.

The GT renderer brute-force integrates the analytic field at 512+
steps/ray, so dataset error is negligible against trained-model error.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np


def _scene_fields():
    """Analytic density+color: a lego-ish arrangement of sharp colored
    boxes and a sphere inside the unit cube (nerf-convention world
    coords, scene centered at origin, radius ~1)."""
    boxes = [
        # (center, half-extent, rgb)
        ((0.00, -0.35, 0.00), (0.55, 0.08, 0.55), (0.65, 0.65, 0.62)),  # base
        ((0.00, -0.05, 0.00), (0.30, 0.22, 0.18), (0.85, 0.12, 0.10)),  # body
        ((-0.18, 0.25, 0.00), (0.10, 0.10, 0.10), (0.95, 0.80, 0.10)),  # stud
        ((0.18, 0.25, 0.00), (0.10, 0.10, 0.10), (0.10, 0.55, 0.90)),   # stud
        ((0.00, -0.05, 0.28), (0.08, 0.08, 0.06), (0.15, 0.75, 0.20)),  # nub
    ]
    spheres = [
        ((0.0, 0.52, 0.0), 0.14, (0.9, 0.35, 0.75)),
    ]

    def density(p):
        """(N,3) → (N,) density. Hard interiors (sigma=80), vacuum out."""
        d = np.zeros(p.shape[0], np.float32)
        for c, h, _ in boxes:
            inside = np.all(np.abs(p - np.float32(c)) <= np.float32(h), -1)
            d = np.maximum(d, np.where(inside, 80.0, 0.0))
        for c, r, _ in spheres:
            inside = np.linalg.norm(p - np.float32(c), axis=-1) <= r
            d = np.maximum(d, np.where(inside, 80.0, 0.0))
        return d

    def color(p):
        """(N,3) → (N,3) linear albedo with a simple height shade."""
        col = np.zeros((p.shape[0], 3), np.float32)
        hit = np.zeros(p.shape[0], bool)
        for c, h, rgb in boxes:
            inside = np.all(np.abs(p - np.float32(c)) <= np.float32(h), -1)
            put = inside & ~hit
            col[put] = rgb
            hit |= inside
        for c, r, rgb in spheres:
            inside = np.linalg.norm(p - np.float32(c), axis=-1) <= r
            put = inside & ~hit
            col[put] = rgb
            hit |= inside
        shade = 0.65 + 0.35 * np.clip(p[:, 1] + 0.5, 0.0, 1.0)
        return col * shade[:, None]

    return density, color


def _look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """nerf-convention camera-to-world (x right, y up, z BACK: camera
    looks along -z, like Blender/instant-ngp inputs)."""
    eye = np.float32(eye)
    f = eye - np.float32(target)  # +z points away from the scene
    f = f / np.linalg.norm(f)
    r = np.cross(np.float32(up), f)
    r = r / np.linalg.norm(r)
    u = np.cross(f, r)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = r, u, f, eye
    return m


def _render_gt(density, color, c2w, res: int, fov_x: float,
               n_steps: int = 512):
    """Brute-force volume integral → (res, res, 4) float straight-alpha
    linear RGBA over a transparent background."""
    fl = 0.5 * res / math.tan(0.5 * fov_x)
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    u = (xs + 0.5 - res / 2) / fl
    v = (ys + 0.5 - res / 2) / fl
    # camera looks along -z in nerf convention
    d_cam = np.stack([u, -v, -np.ones_like(u)], -1).reshape(-1, 3)
    d = d_cam @ c2w[:3, :3].T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)

    # integrate over the scene bounding sphere (radius 1.2)
    t0, t1 = 0.5, 4.5
    ts = np.linspace(t0, t1, n_steps, dtype=np.float32)
    dt = float(ts[1] - ts[0])
    rgb = np.zeros((d.shape[0], 3), np.float32)
    T = np.ones(d.shape[0], np.float32)
    for t in ts:  # keeps peak memory at one slab of samples
        p = o + t * d
        sig = density(p)
        if not sig.any():
            continue
        a = 1.0 - np.exp(-sig * dt)
        w = T * a
        rgb += w[:, None] * color(p)
        T *= 1.0 - a
    alpha = 1.0 - T
    straight = rgb / np.maximum(alpha[:, None], 1e-6)
    out = np.concatenate([np.clip(straight, 0, 1), alpha[:, None]], -1)
    return out.reshape(res, res, 4)


def generate_synthetic_dataset(out_dir, n_train: int = 24, n_test: int = 4,
                               res: int = 256, fov_x_deg: float = 45.0,
                               n_steps: int = 512, seed: int = 7):
    """Write a Blender-synthetic-style dataset: train PNGs +
    transforms.json (+ transforms_test.json). Returns (dir, test json
    path). Idempotent: skips regeneration when the directory is
    complete."""
    import imageio.v2 as imageio

    out_dir = Path(out_dir)
    marker = out_dir / ".complete"
    if marker.exists():
        return out_dir, out_dir / "transforms_test.json"
    out_dir.mkdir(parents=True, exist_ok=True)
    density, color = _scene_fields()
    rng = np.random.default_rng(seed)
    fov_x = math.radians(fov_x_deg)

    def srgb(x):
        x = np.clip(x, 0.0, 1.0)
        return np.where(x <= 0.0031308, 12.92 * x,
                        1.055 * np.power(np.maximum(x, 1e-9), 1 / 2.4) - 0.055)

    def cameras(n, phase):
        cams = []
        for i in range(n):
            az = 2 * math.pi * (i + phase) / n
            el = math.radians(18 + 32 * float(rng.random()))
            r = 2.6
            eye = (r * math.cos(el) * math.sin(az),
                   r * math.sin(el),
                   r * math.cos(el) * math.cos(az))
            cams.append(_look_at(eye))
        return cams

    def write_split(cams, names, json_name):
        frames = []
        for c2w, name in zip(cams, names):
            rgba = _render_gt(density, color, c2w, res, fov_x,
                              n_steps=n_steps)
            img8 = np.concatenate(
                [srgb(rgba[..., :3]), rgba[..., 3:]], -1)
            img8 = (img8 * 255.0 + 0.5).astype(np.uint8)
            imageio.imwrite(out_dir / f"{name}.png", img8)
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": fov_x, "aabb_scale": 1, "frames": frames}
        (out_dir / json_name).write_text(json.dumps(meta))

    write_split(cameras(n_train, 0.0),
                [f"train_{i:03d}" for i in range(n_train)],
                "transforms.json")
    write_split(cameras(n_test, 0.37),
                [f"test_{i:03d}" for i in range(n_test)],
                "transforms_test.json")
    marker.write_text("ok")
    return out_dir, out_dir / "transforms_test.json"
