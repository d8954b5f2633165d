"""Image IO: EXR (HDR), LDR formats via PIL, and the raw ``.bin``
gigapixel format (reference testbed_image.cu:393-457: int32 w,h header +
fp16 RGBA; writer scripts/convert_image.py).

Convention parity: LDR images are kept as sRGB floats in [0,1] with
premultiplied handling left to callers; HDR EXR loads are linear.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from .exr import read_exr, write_exr


def load_image(path) -> tuple[np.ndarray, bool]:
    """Load an image → ((H, W, 4) float32, is_hdr).

    LDR values are sRGB in [0,1]; HDR (EXR) values are linear.
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".exr":
        img = read_exr(path)
        return _ensure_rgba(img), True
    if suffix == ".bin":
        data = path.read_bytes()
        h, w = struct.unpack("<ii", data[:8])
        img = np.frombuffer(data, np.float16, w * h * 4, 8).astype(np.float32)
        return img.reshape(h, w, 4), True
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGBA")
        img = np.asarray(im, np.float32) / 255.0
    return img, False


def save_image(path, img: np.ndarray):
    """Save (H, W, C) float32. EXR stays linear; LDR formats expect the
    caller to pass sRGB-encoded values in [0,1]."""
    path = Path(path)
    if path.suffix.lower() == ".exr":
        write_exr(path, img)
        return
    if path.suffix.lower() == ".bin":
        h, w = img.shape[:2]
        rgba = _ensure_rgba(img).astype(np.float16)
        with open(path, "wb") as f:
            f.write(struct.pack("<ii", h, w))
            f.write(rgba.tobytes())
        return
    from PIL import Image

    arr = np.clip(img, 0.0, 1.0)
    arr = (arr * 255.0 + 0.5).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def _ensure_rgba(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[-1]
    if c == 4:
        return img
    if c == 3:
        a = np.ones((*img.shape[:-1], 1), img.dtype)
        return np.concatenate([img, a], axis=-1)
    if c == 1:
        return np.concatenate([img] * 3 + [np.ones_like(img)], axis=-1)
    raise ValueError(f"unsupported channel count {c}")
