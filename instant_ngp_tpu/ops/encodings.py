"""Input encodings (non-grid): SphericalHarmonics, OneBlob, Frequency,
TriangleWave, Identity, Composite.

Feature-parity targets: the tcnn encodings consumed by the reference's
configs (SURVEY.md §2.2, e.g. configs/nerf/base.json:37-48 uses a
Composite of SphericalHarmonics(degree 4) + Identity for view
directions). These are dense elementwise featurizers — pure jnp maps
straight onto the TPU VPU; no kernels needed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


class Encoding:
    """Protocol: stateless unless n_params > 0."""

    n_output_dims: int
    n_dims_to_encode: int
    n_params: int = 0

    def init(self, key):
        return None

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Encoding):
    n_dims_to_encode: int = 3
    scale: float = 1.0
    offset: float = 0.0

    @property
    def n_output_dims(self):
        return self.n_dims_to_encode

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        return (x * self.scale + self.offset).astype(compute_dtype)


@dataclasses.dataclass(frozen=True)
class SphericalHarmonics(Encoding):
    """Real SH basis up to ``degree`` (max 4 here; reference uses 4).

    The input is expected *warped* to [0,1]^3 (reference warp_direction,
    nerf_device.cuh:291) and is unwarped to the unit cube internally —
    matching tcnn's spherical_harmonics.h convention.
    """

    degree: int = 4
    n_dims_to_encode: int = 3

    @property
    def n_output_dims(self):
        return self.degree**2

    def __call__(self, params, d, max_level=None, compute_dtype=jnp.float32):
        if self.degree > 4:
            raise NotImplementedError("SH degree > 4 not yet implemented")
        d = d * 2.0 - 1.0  # unwarp from [0,1] to [-1,1]
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        x2, y2, z2 = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out = [jnp.full_like(x, 0.28209479177387814)]
        if self.degree >= 2:
            out += [
                -0.48860251190291987 * y,
                0.48860251190291992 * z,
                -0.48860251190291987 * x,
            ]
        if self.degree >= 3:
            out += [
                1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * z2 - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (x2 - y2),
            ]
        if self.degree >= 4:
            out += [
                0.59004358992664352 * y * (-3.0 * x2 + y2),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * z2),
                0.3731763325901154 * z * (5.0 * z2 - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * z2),
                1.4453057213202769 * z * (x2 - y2),
                0.59004358992664352 * x * (-x2 + 3.0 * y2),
            ]
        return jnp.stack(out, axis=-1).astype(compute_dtype)


def _quartic_cdf(u):
    """CDF of the quartic kernel 15/16 (1-u^2)^2 on [-1, 1]."""
    u = jnp.clip(u, -1.0, 1.0)
    return 15.0 / 16.0 * (u - 2.0 * u**3 / 3.0 + u**5 / 5.0) + 0.5


@dataclasses.dataclass(frozen=True)
class OneBlob(Encoding):
    """One-blob encoding (quartic-kernel bin integrals), tcnn-style."""

    n_bins: int = 16
    n_dims_to_encode: int = 3

    @property
    def n_output_dims(self):
        return self.n_dims_to_encode * self.n_bins

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        n = self.n_bins
        edges = jnp.arange(n + 1, dtype=jnp.float32) / n  # (n+1,)
        # (N, D, n+1): scaled distance from x to each bin edge
        u = (edges[None, None, :] - x[..., None]) * n
        cdf = _quartic_cdf(u)
        feats = cdf[..., 1:] - cdf[..., :-1]  # (N, D, n)
        return feats.reshape(*x.shape[:-1], -1).astype(compute_dtype)


@dataclasses.dataclass(frozen=True)
class Frequency(Encoding):
    """NeRF-style frequency encoding: sin/cos of x·2^k·π per dim."""

    n_frequencies: int = 12
    n_dims_to_encode: int = 3

    @property
    def n_output_dims(self):
        return self.n_dims_to_encode * self.n_frequencies * 2

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        freqs = 2.0 ** jnp.arange(self.n_frequencies, dtype=jnp.float32)
        ang = x[..., None] * freqs * math.pi  # (N, D, F)
        feats = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (N, D, F, 2)
        return feats.reshape(*x.shape[:-1], -1).astype(compute_dtype)


@dataclasses.dataclass(frozen=True)
class TriangleWave(Encoding):
    """Triangle-wave encoding (cheap frequency alternative)."""

    n_frequencies: int = 12
    n_dims_to_encode: int = 3

    @property
    def n_output_dims(self):
        return self.n_dims_to_encode * self.n_frequencies

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        freqs = 2.0 ** jnp.arange(self.n_frequencies, dtype=jnp.float32)
        y = x[..., None] * freqs
        t = y - jnp.floor(y)
        feats = jnp.abs(2.0 * t - 1.0) * 2.0 - 1.0
        return feats.reshape(*x.shape[:-1], -1).astype(compute_dtype)


@dataclasses.dataclass(frozen=True)
class Composite(Encoding):
    """Nested encodings over slices of the input dims (reference
    configs/nerf/base.json:37-48). Slices are consecutive by default;
    an explicit ``begins`` tuple allows overlapping slices — the
    tcnn ``dims_to_encode_begin`` key, used by configs/nerf/tensor.json
    (tri-plane-style HashGrids over dims (0,1), (1,2), (2,3))."""

    nested: tuple = ()
    begins: tuple | None = None

    @property
    def n_dims_to_encode(self):
        if self.begins is not None:
            return max(b + e.n_dims_to_encode
                       for b, e in zip(self.begins, self.nested))
        return sum(e.n_dims_to_encode for e in self.nested)

    @property
    def n_output_dims(self):
        return sum(e.n_output_dims for e in self.nested)

    @property
    def n_params(self):
        return sum(e.n_params for e in self.nested)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.nested), 1))
        return [e.init(k) for e, k in zip(self.nested, keys)]

    def __call__(self, params, x, max_level=None, compute_dtype=jnp.float32):
        outs = []
        d0 = 0
        if params is None:
            params = [None] * len(self.nested)
        for i, (e, p) in enumerate(zip(self.nested, params)):
            b = self.begins[i] if self.begins is not None else d0
            xs = x[..., b : b + e.n_dims_to_encode]
            outs.append(e(p, xs, max_level=max_level, compute_dtype=compute_dtype))
            d0 = b + e.n_dims_to_encode
        return jnp.concatenate(outs, axis=-1)


def encoding_from_config(cfg: dict, n_dims: int) -> Encoding:
    """Build an encoding from a tcnn-style JSON config (SURVEY.md §2.12)."""
    from .hashgrid import grid_encoding_from_config

    otype = cfg.get("otype", "Identity").lower()
    if "grid" in otype:
        return grid_encoding_from_config(cfg, n_dims)
    if otype == "identity":
        return Identity(n_dims, float(cfg.get("scale", 1.0)), float(cfg.get("offset", 0.0)))
    if otype == "sphericalharmonics":
        return SphericalHarmonics(int(cfg.get("degree", 4)), n_dims)
    if otype == "oneblob":
        return OneBlob(int(cfg.get("n_bins", 16)), n_dims)
    if otype == "frequency":
        return Frequency(int(cfg.get("n_frequencies", 12)), n_dims)
    if otype == "trianglewave":
        return TriangleWave(int(cfg.get("n_frequencies", 12)), n_dims)
    if otype == "composite":
        nested = []
        begins = []
        cursor = 0
        explicit = False
        specs = cfg.get("nested", [])
        for i, sub in enumerate(specs):
            begin = sub.get("dims_to_encode_begin")
            if begin is not None:
                explicit = True
            b = int(begin) if begin is not None else cursor
            nd = int(sub.get("n_dims_to_encode", 0))
            if nd == 0:
                # tcnn gives unset dims to the last nested encoding only;
                # anywhere else it is ambiguous → refuse loudly.
                if i != len(specs) - 1:
                    raise ValueError(
                        "Composite: n_dims_to_encode must be set on all "
                        "nested encodings except the last"
                    )
                nd = n_dims - b
            # clamp to the actual input width: the reference feeds
            # (pos, dt) = 4 dims to the pos encoding (nerf_network.h),
            # our encoding input is pos-only — tensor.json's (2,3)
            # slice becomes a 1-D grid over z
            nd = min(nd, n_dims - b)
            if nd <= 0:
                continue  # degenerate slice (e.g. no extra dims) → no-op
            sub = dict(sub, n_dims_to_encode=nd)
            nested.append(encoding_from_config(sub, nd))
            begins.append(b)
            cursor = b + nd
        if cursor > n_dims:
            raise ValueError(
                f"Composite: nested n_dims_to_encode exceed input dims ({n_dims})"
            )
        return Composite(tuple(nested), tuple(begins) if explicit else None)
    raise ValueError(f"unknown encoding otype: {cfg.get('otype')}")
