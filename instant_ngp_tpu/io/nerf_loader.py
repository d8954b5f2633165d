"""NeRF dataset loader: transforms.json → NerfDataset.

Parity with the reference loader (nerf_loader.cu:175-560): parses the
full transforms.json key set (camera_angle_x/y, fl_x/y, k1,k2,p1,p2,
cx,cy,w,h, rolling_shutter, aabb_scale, scale, offset, up, aabb,
render_aabb, n_extra_learnable_dims, from_mitsuba, white/black
transparent, frames[].{file_path, depth_path, sharpness,
transform_matrix[_start/_end]}), applies the NeRF→NGP coordinate
convention (nerf_loader.h:101-168: column 1/2 negation, translation ×
scale + offset with scale=0.33 offset=0.5 defaults, xyz←yzx row cycle),
and decodes images with a host thread pool (reference uses its own
ThreadPool, nerf_loader.cu:545+).

Pixels are stored exactly as the reference reads them back
(read_rgba, common_device.cuh:846-869): LDR bytes stay sRGB uint8 and
are converted to *premultiplied linear* at sample time; HDR stays
linear float16 (assumed premultiplied, as EXR convention).
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import json
import math
from pathlib import Path
from typing import Optional

import numpy as np

from ..common import NERF_CASCADES, NERF_SCALE
from .image import load_image


@dataclasses.dataclass
class NerfDataset:
    # images: (N, H, W, 4) uint8 (sRGB, straight alpha) or float16 (linear)
    images: np.ndarray
    is_hdr: bool
    # camera-to-world transforms in NGP coords, (N, 3, 4); start/end for
    # rolling shutter / motion blur (equal when static)
    xforms_start: np.ndarray
    xforms_end: np.ndarray
    focal_lengths: np.ndarray  # (N, 2)
    principal_points: np.ndarray  # (N, 2)
    rolling_shutter: np.ndarray  # (N, 4)
    resolution: tuple[int, int]  # (W, H)
    aabb_scale: int = 1
    scale: float = NERF_SCALE
    offset: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0.5, 0.5, 0.5]))
    lens_params: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(4))  # k1,k2,p1,p2
    lens_mode: str = "perspective"
    sharpness: Optional[np.ndarray] = None  # (N,)
    depths: Optional[np.ndarray] = None  # (N, H, W) float32
    n_extra_learnable_dims: int = 0
    from_mitsuba: bool = False
    up: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))
    render_aabb: Optional[np.ndarray] = None  # (2, 3) min/max in NGP space
    # rotation into the crop box's local frame (reference
    # NerfDataset::render_aabb_to_local, nerf_loader.h); None = identity
    render_aabb_to_local: Optional[np.ndarray] = None  # (3, 3)
    envmap_path: Optional[str] = None
    paths: tuple = ()
    # (N, 2) per-image (w, h) when images have differing sizes (each
    # padded into the max canvas); None for uniform datasets
    per_image_resolution: Optional[np.ndarray] = None
    # (N, H, W, 6) per-pixel supplied rays (o ⊕ d, NGP space) loaded
    # from rays_<stem>.dat files (reference nerf_loader.cu:644-666)
    rays: Optional[np.ndarray] = None

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    def compute_sharpness_maps(self, resolution=(72, 128)) -> np.ndarray:
        """Per-image tiled sharpness: variance of the luma Laplacian in
        each tile (reference compute_sharpness, nerf_loader.cu:111-151;
        sharpness_resolution 128×72 per :156). Returns (N, SH, SW) f32.

        Vectorized with 2D integral images instead of the reference's
        per-tile pixel loops; tile boundaries match its integer
        arithmetic exactly.
        """
        sh, sw = resolution
        n = self.n_images
        w, h = self.resolution
        imgs = self.images
        if imgs.dtype == np.uint8:
            rgb = imgs[..., :3].astype(np.float32) / 255.0
        else:
            rgb = imgs[..., :3].astype(np.float32)
        luma = rgb @ np.array([0.2126, 0.7152, 0.0722], np.float32)  # (N,H,W)
        c = luma[:, 1:-1, 1:-1]
        lap = (
            4.0 * c
            - luma[:, :-2, 1:-1]
            - luma[:, 2:, 1:-1]
            - luma[:, 1:-1, :-2]
            - luma[:, 1:-1, 2:]
        )  # (N, H-2, W-2), pixel (y, x) at lap[y-1, x-1]
        # integral images over lap and lap² padded with a zero row/col
        def integral(a):
            s = np.cumsum(np.cumsum(a, axis=1), axis=2)
            return np.pad(s, ((0, 0), (1, 0), (1, 0)))

        i1, i2 = integral(lap.astype(np.float64)), integral((lap**2).astype(np.float64))
        out = np.zeros((n, sh, sw), np.float32)
        xs = [(max((tx * w) // sw, 1), min(((tx + 1) * w) // sw, w - 2)) for tx in range(sw)]
        ys = [(max((ty * h) // sh, 1), min(((ty + 1) * h) // sh, h - 2)) for ty in range(sh)]
        for ty, (y1, y2) in enumerate(ys):
            for tx, (x1, x2) in enumerate(xs):
                cnt = max((x2 - x1) * (y2 - y1), 1)
                # lap indices are offset by 1 (interior): pixel x → col x-1
                a1, a2, b1, b2 = y1 - 1, y2 - 1, x1 - 1, x2 - 1
                s1 = i1[:, a2, b2] - i1[:, a1, b2] - i1[:, a2, b1] + i1[:, a1, b1]
                s2 = i2[:, a2, b2] - i2[:, a1, b2] - i2[:, a2, b1] + i2[:, a1, b1]
                m1 = s1 / cnt
                out[:, ty, tx] = np.maximum(s2 / cnt - m1 * m1, 0.0)
        return out

    def nerf_matrix_to_ngp(self, m: np.ndarray) -> np.ndarray:
        """reference nerf_loader.h:101-120."""
        m = np.array(m, np.float32)[:3, :4].copy()
        m[:, 1] *= -1.0
        m[:, 2] *= -1.0
        m[:, 3] = m[:, 3] * self.scale + np.asarray(self.offset, np.float32)
        if self.from_mitsuba:
            m[:, 0] *= -1.0
            m[:, 2] *= -1.0
        else:
            m = m[[1, 2, 0], :]
        return m

    def ngp_matrix_to_nerf(self, m: np.ndarray) -> np.ndarray:
        """reference nerf_loader.h:122-140 (inverse of the above)."""
        m = np.array(m, np.float32)[:3, :4].copy()
        if self.from_mitsuba:
            m[:, 0] *= -1.0
            m[:, 2] *= -1.0
        else:
            m = m[[2, 0, 1], :]
        m[:, 1] *= -1.0
        m[:, 2] *= -1.0
        m[:, 3] = (m[:, 3] - np.asarray(self.offset, np.float32)) / self.scale
        return m


def load_nerf(path, sharpen: float = 0.0) -> NerfDataset:
    """Load a NeRF dataset from a transforms.json (or a directory
    containing one)."""
    path = Path(path)
    if path.is_dir():
        json_paths = sorted(path.glob("*.json"))
        json_paths = [p for p in json_paths if "transforms" in p.name] or json_paths
        if not json_paths:
            raise FileNotFoundError(f"no transforms json in {path}")
        json_path = json_paths[0]
    else:
        json_path = path
    base_dir = json_path.parent
    with open(json_path) as f:
        meta = json.load(f)

    aabb_scale = int(meta.get("aabb_scale", 1))
    max_aabb = 1 << (NERF_CASCADES - 1)
    if aabb_scale > max_aabb:
        raise ValueError(f"aabb_scale must be <= {max_aabb}, got {aabb_scale}")

    scale = float(meta.get("scale", NERF_SCALE))
    offset = np.array(meta.get("offset", [0.5, 0.5, 0.5]), np.float32)
    if np.isscalar(meta.get("offset")):
        offset = np.full(3, float(meta["offset"]), np.float32)

    frames = meta["frames"]
    # natural sort by file path (reference uses NaturalSort, nerf_loader.cu:348)
    frames = sorted(frames, key=lambda fr: _natural_key(fr.get("file_path", "")))

    # drop frames whose image file is absent (partial datasets)
    def _exists(fr):
        p = base_dir / fr["file_path"]
        if p.exists():
            return True
        if not p.suffix:
            return any(p.with_suffix(e).exists() for e in (".png", ".jpg", ".jpeg", ".exr"))
        return False

    n_before = len(frames)
    frames = [fr for fr in frames if _exists(fr)]
    if len(frames) < n_before:
        import warnings

        warnings.warn(f"skipped {n_before - len(frames)} frames with missing image files")

    # decode images in parallel
    def _load(frame):
        p = base_dir / frame["file_path"]
        if not p.suffix:
            for ext in (".png", ".jpg", ".jpeg", ".exr"):
                if p.with_suffix(ext).exists():
                    p = p.with_suffix(ext)
                    break
        return load_image(p), str(p)

    with cf.ThreadPoolExecutor(max_workers=16) as pool:
        results = list(pool.map(_load, frames))

    imgs = [r[0][0] for r in results]
    paths = tuple(r[1] for r in results)
    is_hdr = results[0][0][1]
    sizes = np.asarray([[im.shape[1], im.shape[0]] for im in imgs])  # (N,2) wh
    mixed = bool((sizes != sizes[0]).any())
    h = int(sizes[:, 1].max())
    w = int(sizes[:, 0].max())
    if mixed:
        # per-image resolutions (real phone captures): pad every image
        # into the max canvas; all uv math stays per-image via
        # per_image_resolution (the reference keeps per-image metadata,
        # nerf_loader.cu TrainingImageMetadata.resolution)
        padded = []
        for im in imgs:
            canvas = np.zeros((h, w, im.shape[2]), im.dtype)
            canvas[: im.shape[0], : im.shape[1]] = im
            padded.append(canvas)
        imgs = padded

    if is_hdr:
        images = np.stack(imgs).astype(np.float16)
    else:
        images = (np.stack(imgs) * 255.0 + 0.5).astype(np.uint8)

    # per-pixel supplied rays: the reference loads `rays_<stem>.dat`
    # next to each image (binary (o,d) float3 pairs per pixel,
    # nerf_loader.cu:644-666) and marches those instead of lens rays.
    rays = None
    ray_files = [Path(pth).parent / f"rays_{Path(pth).stem}.dat" for pth in paths]
    if any(rf.exists() for rf in ray_files):
        rays = np.zeros((len(frames), h, w, 6), np.float32)
        for i, rf in enumerate(ray_files):
            wi, hi = int(sizes[i, 0]), int(sizes[i, 1])
            if not rf.exists():
                import warnings

                warnings.warn(f"missing rays file {rf}; frame {i} rays zeroed")
                continue
            raw = np.fromfile(rf, np.float32)
            if raw.size < wi * hi * 6:
                raise ValueError(f"rays file {rf} too small: {raw.size}")
            r = raw[: wi * hi * 6].reshape(hi, wi, 6)
            o, d = r[..., :3], r[..., 3:]
            # nerf_ray_to_ngp (nerf_loader.h:153-168): scale+offset the
            # origin, cycle xyz→yzx both
            o = o * scale + offset[None, None, :]
            rays[i, :hi, :wi, :3] = o[..., [1, 2, 0]]
            rays[i, :hi, :wi, 3:] = d[..., [1, 2, 0]]

    if meta.get("white_transparent") or meta.get("black_transparent"):
        # alpha from luminance (reference nerf_loader.cu mask handling)
        lum = images[..., :3].astype(np.float32).mean(-1)
        if meta.get("white_transparent"):
            alpha = 255.0 - lum if not is_hdr else 1.0 - lum
        else:
            alpha = lum
        images[..., 3] = alpha.astype(images.dtype)

    # intrinsics
    def focal(frame_or_meta, axis, res, other=None):
        d = frame_or_meta
        if f"fl_{axis}" in d:
            return float(d[f"fl_{axis}"])
        if f"camera_angle_{axis}" in d:
            return 0.5 * res / math.tan(0.5 * float(d[f"camera_angle_{axis}"]))
        return other

    n = len(frames)
    focal_lengths = np.zeros((n, 2), np.float32)
    principal = np.zeros((n, 2), np.float32)
    xf_start = np.zeros((n, 3, 4), np.float32)
    xf_end = np.zeros((n, 3, 4), np.float32)
    rolling = np.zeros((n, 4), np.float32)
    sharp = np.zeros((n,), np.float32)

    ds = NerfDataset(
        images=images,
        is_hdr=is_hdr,
        xforms_start=xf_start,
        xforms_end=xf_end,
        focal_lengths=focal_lengths,
        principal_points=principal,
        rolling_shutter=rolling,
        resolution=(w, h),
        aabb_scale=aabb_scale,
        scale=scale,
        offset=offset,
        from_mitsuba=bool(meta.get("from_mitsuba", False)),
        n_extra_learnable_dims=int(meta.get("n_extra_learnable_dims", 0)),
        paths=paths,
        per_image_resolution=sizes.astype(np.int32) if mixed else None,
        rays=rays,
    )

    fx_g = focal(meta, "x", w)
    fy_g = focal(meta, "y", h, other=fx_g)
    if fx_g is None:
        fx_g = fy_g
    cx_g = float(meta.get("cx", 0.5 * w)) / w
    cy_g = float(meta.get("cy", 0.5 * h)) / h
    rs_g = np.array(meta.get("rolling_shutter", [0, 0, 0, 0]), np.float32)

    for i, fr in enumerate(frames):
        wi, hi = int(sizes[i, 0]), int(sizes[i, 1])
        # global camera_angle falls back at the IMAGE's own resolution
        fx = focal(fr, "x", wi, other=focal(meta, "x", wi, other=fx_g))
        fy = focal(fr, "y", hi, other=focal(meta, "y", hi, other=fy_g)) or fx
        focal_lengths[i] = (fx, fy if fy else fx)
        principal[i] = (
            float(fr.get("cx", cx_g * wi)) / wi if "cx" in fr else cx_g,
            float(fr.get("cy", cy_g * hi)) / hi if "cy" in fr else cy_g,
        )
        rolling[i] = np.array(fr.get("rolling_shutter", rs_g), np.float32)
        m = fr.get("transform_matrix", fr.get("transform_matrix_start"))
        m_end = fr.get("transform_matrix_end", m)
        xf_start[i] = ds.nerf_matrix_to_ngp(np.array(m, np.float32))
        xf_end[i] = ds.nerf_matrix_to_ngp(np.array(m_end, np.float32))
        sharp[i] = float(fr.get("sharpness", 1.0))

    ds.sharpness = sharp
    ds.lens_params = np.array(
        [float(meta.get(k, 0.0)) for k in ("k1", "k2", "p1", "p2")], np.float32
    )
    ds.lens_mode = (
        "opencv" if np.any(ds.lens_params != 0) else "perspective"
    )
    if meta.get("fisheye") or meta.get("is_fisheye"):
        ds.lens_mode = "opencv_fisheye"
    if "ftheta_p0" in meta:
        # F-theta polynomial lens (reference nerf_loader.cu:218-227):
        # params = (p0..p4, w, h) — the uv offset is rescaled to the
        # intrinsics' resolution
        ds.lens_params = np.array(
            [float(meta[f"ftheta_p{i}"]) for i in range(5)]
            + [float(meta["w"]), float(meta["h"])], np.float32)
        ds.lens_mode = "ftheta"
    if "latlong" in meta:
        ds.lens_mode = "latlong"
    elif "equirectangular" in meta:
        ds.lens_mode = "equirectangular"
    elif "orthographic" in meta:
        ds.lens_mode = "orthographic"
    if "up" in meta:
        ds.up = np.array(meta["up"], np.float32)
    if "render_aabb" in meta:
        ra = meta["render_aabb"]
        ds.render_aabb = np.array(ra, np.float32).reshape(2, 3)
    if "envmap" in meta:
        ds.envmap_path = str(base_dir / meta["envmap"])

    # optional per-frame depth maps
    if any("depth_path" in fr for fr in frames):
        depth_scale = float(meta.get("integer_depth_scale", 1.0 / 65535.0))
        depths = np.zeros((n, h, w), np.float32)
        for i, fr in enumerate(frames):
            if "depth_path" in fr:
                from PIL import Image

                dimg = np.asarray(Image.open(base_dir / fr["depth_path"]))
                depths[i] = dimg.astype(np.float32) * depth_scale * scale
        ds.depths = depths

    return ds


def _natural_key(s: str):
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]
