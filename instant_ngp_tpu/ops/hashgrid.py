"""Multiresolution (hash-)grid encoding — TPU-native.

Re-implements the behavior of tiny-cuda-nn's grid encoding (the API the
reference consumes via ``"otype": "HashGrid"`` configs, see
SURVEY.md §2.2 and reference configs/nerf/base.json:24-30) as a pure-JAX
op with exact index/hash arithmetic:

  * level scale:      s_l = 2^(l·log2(b)) · N_base − 1
  * level resolution: R_l = ceil(s_l) + 1
  * dense index while R_l^D ≤ table size, else spatial hash
    h(x) = (x₀·1 ⊻ x₁·2654435761 ⊻ x₂·805459861 ⊻ …) mod T
  * d-linear (or smoothstep) interpolation of 2^D corners
  * per-level parameter counts aligned to multiples of 8
  * coarse-to-fine masking via ``max_level`` (reference
    `set_max_level_gpu`, testbed_nerf.cu:3190-3230)

TPU-first design (round 2):

  * Parameters are a TUPLE of per-level tables (size_l, F) instead of
    one flat table. Each level is its own pytree leaf, so each level's
    gradient is produced directly at its own shape — no giant
    zero-init + scatter into a shared 50 MB buffer per level.
  * Each level runs through one custom-VJP op whose backward NEVER
    uses an XLA scatter by default: updates are lax.sort-ed by table
    row and segment-summed (sorted ids). On v5e, sort+segsum of 1M
    updates runs ~50-100× faster than the scalar scatter-add XLA emits
    for `.at[idx].add` (serial ~40-80 ns/elem on the scalar core);
    round-1's flat-scalar-scatter backward was 360 ms of a 470 ms
    train step.
  * Position gradients (needed when camera poses/focal are being
    optimized, reference dy_dx in tcnn grid backward) are computed
    analytically in the same backward; XLA DCEs the dx computation
    whenever the position input is not differentiated.

Everything is shape-static; per-level sizes/offsets are Python ints at
trace time.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes (tiny-cuda-nn convention; first dim uses 1 so that
# dense and hashed indices coincide along x).
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


# ---------------------------------------------------------------------------
# per-level static spec + geometry helpers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridLevelSpec:
    scale: float
    resolution: int
    size: int  # number of feature vectors in this level's table
    offset: int  # offset (in feature vectors) into the packed flat table
    hashed: bool


@dataclasses.dataclass(frozen=True)
class _LevelOp:
    """Hashable static config for one level's interp op (custom_vjp
    nondiff argument)."""

    n_dims: int
    n_features: int
    scale: float
    resolution: int
    size: int
    hashed: bool
    interpolation: str  # "linear" | "smoothstep" | "nearest"
    grad_method: str  # "sort" | "xla"


def _corner_setup(op: _LevelOp, x: jax.Array):
    """Per-axis floor/interp-weights for positions x (N, D) in [0,1].

    Returns (grid (N,D) int32, t (N,D) interp weights, dchain (N,D)
    = dt/dx including the level scale, for analytic position grads).
    """
    pos = x * np.float32(op.scale) + 0.5
    floor = jnp.floor(pos)
    frac = pos - floor
    if op.interpolation == "smoothstep":
        t = frac * frac * (3.0 - 2.0 * frac)
        dchain = 6.0 * frac * (1.0 - frac) * np.float32(op.scale)
    elif op.interpolation == "nearest":
        t = jnp.round(frac)
        dchain = jnp.zeros_like(frac)
    else:
        t = frac
        dchain = jnp.full_like(frac, np.float32(op.scale))
    return floor.astype(jnp.int32), t, dchain


def _corner_index(op: _LevelOp, grid: jax.Array, bits) -> jax.Array:
    """LOCAL table index (N,) for one corner. grid: (N, D) int32;
    bits: D python ints in {0,1}. Rank-1 math throughout — on TPU,
    (N,) arrays put N in the lane dim; higher-rank small trailing dims
    would be tile-padded to (8,128) and blow up memory."""
    D = op.n_dims
    idx = jnp.zeros_like(grid[:, 0], dtype=jnp.uint32)
    if op.hashed:
        for d in range(D):
            c = (grid[:, d] + bits[d]).astype(jnp.uint32)
            idx = idx ^ (c * np.uint32(_PRIMES[d] & 0xFFFFFFFF))
    else:
        stride = 1
        for d in range(D):
            c = (grid[:, d] + bits[d]).astype(jnp.uint32)
            idx = idx + c * np.uint32(stride)
            stride *= op.resolution
    return (idx % np.uint32(op.size)).astype(jnp.int32)


def _corner_weight(t: jax.Array, bits) -> jax.Array:
    """(N,) interpolation weight for one corner from t (N, D)."""
    w = None
    for d in range(t.shape[-1]):
        wd = t[:, d] if bits[d] else (1.0 - t[:, d])
        w = wd if w is None else w * wd
    return w


def _all_corners(op: _LevelOp, grid, t):
    """(C, N) stacked corner indices and weights."""
    C = 1 << op.n_dims
    idx_c, w_c = [], []
    for c in range(C):
        bits = [(c >> d) & 1 for d in range(op.n_dims)]
        idx_c.append(_corner_index(op, grid, bits))
        w_c.append(_corner_weight(t, bits))
    return jnp.stack(idx_c), jnp.stack(w_c)


def _uses_simplex(op: _LevelOp) -> bool:
    """Simplex interpolation applies to HASHED 3-D levels — the
    gather-bound ones. Dense levels keep exact trilinear (their forward
    is one bricked gather row and their backward is the separable MXU
    splat, so 8 corners cost nothing there)."""
    return op.interpolation == "simplex" and op.hashed and op.n_dims == 3


def _simplex_corners(op: _LevelOp, grid, t):
    """Freudenthal/Kuhn 4-corner simplex interpolation (TPU-first
    design; no reference counterpart — tcnn interpolates 2^D corners).

    The cell [0,1]³ splits into 6 tetrahedra by the ordering of the
    fractional coords; the containing tet's corners are the cumulative
    bit-patterns of the descending order and the barycentric weights
    are differences of the sorted fracs:

        c0 = 000, c1 = e_max, c2 = 1 − e_min, c3 = 111
        w  = (1 − t_max, t_max − t_mid, t_mid − t_min, t_min)

    Exactly linear inside each tet, C0 everywhere, reproduces linear
    fields, weights ≥ 0 summing to 1 — at HALF the gather rows of
    trilinear. On v5e the encoding gather (~7 ns/row) is the whole
    training-forward and render wall, so rows are the currency.

    Returns idx (4, N), w (4, N), rank masks (is_max, is_min) (N, D)
    float32 for the analytic position gradient.
    """
    amax = jnp.argmax(t, axis=-1)
    amin = jnp.argmin(t, axis=-1)
    # all-equal tie: argmax == argmin; pick a distinct min axis (the
    # affected weights are exactly 0 there, only index sanity matters)
    amin = jnp.where(amin == amax, (amax + 1) % 3, amin)
    eye = jnp.eye(3, dtype=jnp.int32)
    b_max = jnp.take(eye, amax, axis=0)  # (N, 3) one-hot of the max axis
    b_min = jnp.take(eye, amin, axis=0)
    zeros = jnp.zeros_like(b_max)
    bits4 = (zeros, b_max, 1 - b_min, jnp.ones_like(b_max))
    idx4 = jnp.stack(
        [_corner_index(op, grid, [b[:, d] for d in range(3)]) for b in bits4]
    )
    t_max = jnp.max(t, axis=-1)
    t_min = jnp.min(t, axis=-1)
    t_mid = jnp.sum(t, axis=-1) - t_max - t_min
    w4 = jnp.stack([1.0 - t_max, t_max - t_mid, t_mid - t_min, t_min])
    return idx4, w4, (b_max.astype(jnp.float32), b_min.astype(jnp.float32))


def _level_corners(op: _LevelOp, grid, t):
    """Dispatch: (idx (C,N), w (C,N), aux) for this level's
    interpolation. aux is the simplex rank-mask pair or None.
    nearest gathers its SINGLE corner (t is already round(frac), so
    the one-hot corner is t itself) — 1 row/level instead of 2^D."""
    if op.interpolation == "nearest":
        bits = [t[:, d].astype(jnp.int32) for d in range(op.n_dims)]
        idx = _corner_index(op, grid, bits)[None]
        return idx, jnp.ones_like(t[:, :1].T), None
    if _uses_simplex(op):
        return _simplex_corners(op, grid, t)
    idx, w = _all_corners(op, grid, t)
    return idx, w, None


# ---------------------------------------------------------------------------
# whole-encoding custom VJP (all levels; batched scatter-free backward)
# ---------------------------------------------------------------------------


def _encode_fwd_impl(enc: "GridEncoding", params, x):
    """Shared forward: per-level gather+interp. Returns (out, feats)
    with feats a per-level tuple of (C_l, N, F) — kept as residuals so
    the backward's dx never re-gathers (row gathers measured ~3-7
    ns/row on v5e). C_l varies per level: 2^D trilinear, 4 simplex."""
    F = enc.n_features_per_level
    outs, feats_all = [], []
    for level, table in zip(enc.levels, params):
        op = enc._level_op(level)
        grid, t, _ = _corner_setup(op, x)
        idx, w, _aux = _level_corners(op, grid, t)  # (C, N)
        C, N = idx.shape
        feats = jnp.take(table, idx.reshape(C * N), axis=0).reshape(C, N, F)
        outs.append(jnp.einsum("cn,cnf->nf", w.astype(feats.dtype), feats))
        feats_all.append(feats)
    out = jnp.concatenate(outs, axis=-1)  # (N, L·F)
    return out, tuple(feats_all)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def hashgrid_encode(enc: "GridEncoding", params, x) -> jax.Array:
    """Encode x (N, D) → (N, L·F). params: tuple of per-level tables."""
    out, _ = _encode_fwd_impl(enc, params, x)
    return out


def _hge_fwd(enc, params, x):
    out, feats = _encode_fwd_impl(enc, params, x)
    return out, (x, feats)


def _hge_bwd(enc, res, g):
    from .scatter import scatter_add_merge, scatter_add_xla, splat_dense

    x, feats = res
    F = enc.n_features_per_level
    L = enc.n_levels
    D = enc.n_dims
    C = 1 << D
    N = x.shape[0]
    g = g.astype(jnp.float32)
    g_levels = [g[:, l * F : (l + 1) * F] for l in range(L)]

    # recompute per-level geometry (pure VPU, cheap vs storing it)
    geoms = []
    for level in enc.levels:
        op = enc._level_op(level)
        grid, t, dchain = _corner_setup(op, x)
        idx, w, aux = _level_corners(op, grid, t)
        geoms.append((op, grid, t, dchain, idx, w, aux))

    # ---- d/dtable ---------------------------------------------------
    dtables = [None] * L
    method = enc.grad_method
    use_splat = method == "auto" and D in (2, 3)
    # per-sample uniforms for stochastic-corner selection, derived from
    # the position bits (changes every step with the march jitter; no
    # PRNG key reaches a custom-VJP backward)
    u_rand = None
    n_draws = enc.hashed_grad_corners
    if n_draws >= 1:
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)  # (N, D)
        h = jnp.zeros_like(bits[:, 0])
        for d in range(D):
            h = h ^ (bits[:, d] * np.uint32(_PRIMES[(d + 1) % len(_PRIMES)]))
        h = h * np.uint32(0x9E3779B1)
        u_rand = (h >> 8).astype(jnp.float32) * np.float32(2.0**-24)
    merge_groups: dict[tuple[int, int], list[int]] = {}
    for l, (op, grid, t, dchain, idx, w, aux) in enumerate(geoms):
        C = idx.shape[0]  # 2^D trilinear, 4 simplex
        if (op.hashed and method != "xla" and 1 <= n_draws < C):
            # Stochastic corner table gradient (TPU-first design note):
            # every scatter formulation on TPU costs ~10-40 ns per
            # serial element (scripts/bench_primitives), so the C
            # corner updates per sample dominate training. Each of k
            # independent draws picks corner c with probability w_c and
            # deposits g/k — an unbiased estimator of the full update
            # (Σ_c w_c = 1) at k/C the scatter cost with variance ∝ 1/k
            # (k = hashed_grad_corners; the anneal raises k over
            # training as the noise floor approaches). Draws are
            # decorrelated across levels and k by folding both into
            # the position-hash uniform.
            g_k = g_levels[l] * np.float32(1.0 / n_draws)
            parts = []
            for k in range(n_draws):
                u_l = (u_rand + np.float32(((l * 7 + k) * 0.6180339887) % 1.0)) % 1.0
                cdf = jnp.cumsum(w, axis=0)  # (C, N), last row == 1
                c_sel = jnp.sum(cdf < u_l[None, :] * cdf[-1], axis=0)
                c_sel = jnp.clip(c_sel, 0, C - 1)
                idx_sel = jnp.take_along_axis(idx, c_sel[None, :], axis=0)[0]
                parts.append(idx_sel)
            if n_draws == 1:
                dtables[l] = scatter_add_xla(parts[0], g_k, op.size)
            else:
                idx_all = jnp.concatenate(parts)
                upd_all = jnp.tile(g_k, (n_draws, 1))
                dtables[l] = scatter_add_xla(idx_all, upd_all, op.size)
        elif method == "xla":
            upd = (w[:, :, None] * g_levels[l][None, :, :]).reshape(C * N, F)
            dtables[l] = scatter_add_xla(idx.reshape(C * N), upd, op.size)
        elif use_splat and not op.hashed:
            dtables[l] = splat_dense(
                grid, t, g_levels[l], op.resolution, op.size,
                compute_dtype=jnp.bfloat16,
            )
        else:
            merge_groups.setdefault((op.size, C), []).append(l)
    for (size, C_g), lvls in merge_groups.items():
        # one batched sort-reduce for all levels of this (size, C)
        idx_stack = jnp.stack([geoms[l][4].reshape(C_g * N) for l in lvls])
        upd_stack = jnp.stack(
            [
                (geoms[l][5][:, :, None] * g_levels[l][None, :, :]).reshape(C_g * N, F)
                for l in lvls
            ]
        )
        tabs = scatter_add_merge(idx_stack, upd_stack, size)
        for i, l in enumerate(lvls):
            dtables[l] = tabs[i]

    # ---- d/dx: analytic (tcnn grid backward dy_dx) ------------------
    # trilinear: dL/dx_d = Σ_c gf_c · sign_d(c) · Π_{d'≠d} a_{d'} · dchain
    # simplex:   dw/dt is ±1 by the axis' rank among the fracs
    #            (w = diffs of sorted fracs), so
    #            dL/dt_d = is_max_d·(gf1−gf0) + is_mid_d·(gf2−gf1)
    #                      + is_min_d·(gf3−gf2)
    dx = jnp.zeros((N, D), jnp.float32)
    for l, (op, grid, t, dchain, idx, w, aux) in enumerate(geoms):
        gdotf = jnp.einsum(
            "nf,cnf->cn", g_levels[l], feats[l].astype(jnp.float32)
        )  # (C, N)
        if aux is not None:  # simplex level
            is_max, is_min = aux  # (N, D)
            is_mid = 1.0 - is_max - is_min
            dt = (
                is_max * (gdotf[1] - gdotf[0])[:, None]
                + is_mid * (gdotf[2] - gdotf[1])[:, None]
                + is_min * (gdotf[3] - gdotf[2])[:, None]
            )
            dx = dx + dt * dchain
            continue
        C = idx.shape[0]
        cols = []
        for d in range(D):
            acc = None
            for c in range(C):
                bits = [(c >> dd) & 1 for dd in range(D)]
                prod = None
                for dd in range(D):
                    if dd == d:
                        continue
                    a = t[:, dd] if bits[dd] else (1.0 - t[:, dd])
                    prod = a if prod is None else prod * a
                if prod is None:  # D == 1
                    prod = jnp.ones_like(t[:, 0])
                term = gdotf[c] * (prod if bits[d] else -prod)
                acc = term if acc is None else acc + term
            cols.append(acc * dchain[:, d])
        dx = dx + jnp.stack(cols, axis=-1)
    dparams = tuple(dtables)
    return dparams, dx.astype(x.dtype)


hashgrid_encode.defvjp(_hge_fwd, _hge_bwd)


# ---------------------------------------------------------------------------
# retained round-1 op (used by Takikawa encoding + diagnostic tests)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def gather_interp(params, idx, w):
    """Weighted corner gather: out[n,f] = Σ_c w[c,n]·params[idx[c,n],f].

    Custom VJP: parameter gradient via the sort-based merge reduction
    (scatter-free; see ops.scatter.scatter_add_merge)."""
    C, N = idx.shape
    F = params.shape[1]
    feats = jnp.take(params, idx.reshape(C * N), axis=0).reshape(C, N, F)
    return jnp.einsum("cn,cnf->nf", w.astype(params.dtype), feats)


def _gather_interp_fwd(params, idx, w):
    C, N = idx.shape
    F = params.shape[1]
    feats = jnp.take(params, idx.reshape(C * N), axis=0).reshape(C, N, F)
    out = jnp.einsum("cn,cnf->nf", w.astype(params.dtype), feats)
    return out, (params.shape, idx, w, feats)


def _gather_interp_bwd(res, g):
    # flat scalar scatter: the fastest measured exact reduction on v5e
    # (the sort-merge alternative measured ~1.5× slower end-to-end;
    # see docs/ROUND2_NOTES.md primitive table)
    from .scatter import scatter_add_xla

    (T, F), idx, w, feats = res
    C, N = idx.shape
    dw = jnp.einsum("nf,cnf->cn", g, feats.astype(g.dtype))
    vals = (w[:, :, None].astype(jnp.float32) * g[None, :, :].astype(jnp.float32))
    dparams = scatter_add_xla(idx.reshape(C * N), vals.reshape(C * N, F), T)
    zero_idx = jnp.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dparams, zero_idx, dw


gather_interp.defvjp(_gather_interp_fwd, _gather_interp_bwd)


def _next_multiple(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridEncoding:
    """Static configuration of a multiresolution grid encoding.

    Parameters are a tuple of per-level (size_l, F) float32 tables
    (one pytree leaf per level). `pack_params`/`unpack_params` convert
    to/from the tcnn flat layout for snapshots.
    """

    n_dims: int = 3
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 2.0
    interpolation: str = "linear"  # "linear" | "smoothstep" | "nearest"
    grid_type: str = "hash"  # "hash" | "dense" | "tiled"
    # Table-gradient algorithm:
    #   "auto"  — dense levels via separable bf16 MXU splat, hashed
    #             levels via the batched sort-merge reduction (default)
    #   "merge" — sort-merge reduction for every level (exact fp32)
    #   "xla"   — scalar scatter-add fallback (serial, exact)
    #   "autodiff" — no custom VJP at all; reference for tests
    grad_method: str = "auto"
    # Hashed-level gradient corners: ≥C (exact; C = 2^D trilinear, 4
    # simplex) or k < C stochastic draws (each deposits g/k at a
    # corner drawn with probability w_c — unbiased, k/C the scatter
    # cost, variance ∝ 1/k; see the design note in _hge_bwd). Dense
    # levels always use all corners (their splat backward is
    # matmul-cheap). Default 1: measured on fox/v5e, ahead on
    # time-to-PSNR at every budget (scripts/ab_corners.py); the
    # NerfTask anneal raises it to exact mid-training.
    hashed_grad_corners: int = 1

    @property
    def levels(self) -> tuple[GridLevelSpec, ...]:
        log2_b = math.log2(self.per_level_scale) if self.n_levels > 1 else 0.0
        out = []
        offset = 0
        max_params = 2**31
        for l in range(self.n_levels):
            scale = 2.0 ** (l * log2_b) * self.base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            dense_size = res**self.n_dims if float(res) ** self.n_dims <= max_params else max_params
            size = _next_multiple(min(dense_size, max_params), 8)
            if self.grid_type == "tiled":
                size = min(size, self.base_resolution**self.n_dims)
            elif self.grid_type == "hash":
                size = min(size, 1 << self.log2_hashmap_size)
            hashed = self.grid_type == "hash" and (res**self.n_dims) > size
            out.append(GridLevelSpec(scale, res, size, offset, hashed))
            offset += size
        return tuple(out)

    @property
    def n_dims_to_encode(self) -> int:
        # Encoding-protocol name (ops/encodings.py) — Composite slices
        # its input by this
        return self.n_dims

    @property
    def n_entries(self) -> int:
        lv = self.levels
        return lv[-1].offset + lv[-1].size

    @property
    def n_params(self) -> int:
        return self.n_entries * self.n_features_per_level

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def _level_op(self, level: GridLevelSpec) -> _LevelOp:
        return _LevelOp(
            n_dims=self.n_dims,
            n_features=self.n_features_per_level,
            scale=level.scale,
            resolution=level.resolution,
            size=level.size,
            hashed=level.hashed,
            interpolation=self.interpolation,
            grad_method=self.grad_method,
        )

    def init(self, key: jax.Array) -> tuple[jax.Array, ...]:
        """Per-level tables, uniform in [-1e-4, 1e-4] (tcnn convention)."""
        F = self.n_features_per_level
        keys = jax.random.split(key, self.n_levels)
        return tuple(
            jax.random.uniform(k, (lv.size, F), jnp.float32, -1e-4, 1e-4)
            for k, lv in zip(keys, self.levels)
        )

    def pack_params(self, params: Sequence[jax.Array]) -> jax.Array:
        """Concatenate per-level tables into the tcnn flat (T, F) layout."""
        return jnp.concatenate(list(params), axis=0)

    def unpack_params(self, flat) -> tuple:
        """Split a flat (T, F) table into per-level leaves. Accepts
        jnp or np arrays; returns the same kind."""
        return tuple(
            flat[lv.offset : lv.offset + lv.size] for lv in self.levels
        )

    def __call__(
        self,
        params: Sequence[jax.Array],
        x: jax.Array,
        max_level: Optional[jax.Array] = None,
        compute_dtype=jnp.float32,
    ) -> jax.Array:
        """Encode positions.

        Args:
          params: per-level tables, tuple of (size_l, F); a single
            packed (n_entries, F) array is also accepted.
          x: (N, D) positions in [0, 1].
          max_level: optional scalar or (N,) in [0, 1]; levels with
            l >= max_level * L contribute zero (coarse-to-fine training).
        Returns:
          (N, L*F) features, level-major.
        """
        if not isinstance(params, (tuple, list)):
            params = self.unpack_params(params)
        params = tuple(params)
        L, F = self.n_levels, self.n_features_per_level
        if self.grad_method == "autodiff":
            out, _ = _encode_fwd_impl(self, params, x)
        else:
            out = hashgrid_encode(self, params, x)
        if max_level is not None:
            max_level = jnp.asarray(max_level)
            lvl = jnp.repeat(jnp.arange(L, dtype=jnp.float32), F)
            if max_level.ndim == 0:
                mask = lvl[None, :] < max_level * L
            else:
                mask = lvl[None, :] < max_level[:, None] * L
            out = out * mask.astype(out.dtype)
        return out.astype(compute_dtype)

    # ------------------------------------------------------------------
    # bricked inference tables (rendering fast path)
    # ------------------------------------------------------------------
    def build_bricks(self, params: Sequence[jax.Array]):
        """Per-DENSE-level brick tables for inference: row e holds the
        2^D corner features of cell e, concatenated corner-major —
        one (C·F)-float gather per sample-level instead of C separate
        rows. Measured on v5e: a 16-float row gathers at ~1.4× the
        cost of a 2-float row, so this is ~5× less gather time for
        dense levels. Exact (cell→row is bijective for dense levels;
        hashed levels cannot be bricked exactly — more cells than rows
        — and return None).
        """
        if not isinstance(params, (tuple, list)):
            params = self.unpack_params(params)
        D = self.n_dims
        C = 1 << D
        out = []
        for level, table in zip(self.levels, params):
            if level.hashed or D not in (2, 3):
                out.append(None)
                continue
            op = self._level_op(level)
            R = level.resolution
            e = jnp.arange(level.size, dtype=jnp.int32)
            coords = []
            rem = e
            for d in range(D):
                coords.append(rem % R)
                rem = rem // R
            grid = jnp.stack(coords, -1)  # (size, D) cell coords
            rows = []
            for c in range(C):
                bits = [(c >> d) & 1 for d in range(D)]
                rows.append(jnp.take(table, _corner_index(op, grid, bits), axis=0))
            # bf16 rows: on v5e a bf16 gather costs a flat ~15 ns/row up
            # to 64 B width, while f32 rows scale with width (41 ns at
            # 128 B) — and inference compute is bf16 anyway
            # (scripts/bench_gather_tpu).
            out.append(jnp.concatenate(rows, axis=-1).astype(jnp.bfloat16))
        return tuple(out)

    def encode_infer(self, params, x, bricks=None, max_level=None,
                     compute_dtype=jnp.float32, stochastic_corner=False):
        """Inference-only encode using bricked dense levels (no
        gradients). Falls back to the training path when bricks is
        None.

        stochastic_corner: hashed levels gather ONE corner drawn with
        probability equal to its interpolation weight (position-hashed
        uniform) instead of all C — an unbiased per-level FEATURE
        sample at 1/C the gather rows. MEASURED VERDICT (fox, v5e,
        docs/ROUND3_NOTES.md): not viable as a render fast path — the
        density MLP + exp activation turn unbiased feature noise into
        heavily biased opacity (17 dB vs 24 dB exact at step 512) and
        the end-to-end render time barely moved (the round pipeline is
        not purely gather-bound at these sizes). Kept as an estimator
        primitive (it IS unbiased in feature space; tests cover it),
        not wired to any default path.
        """
        if bricks is None and not stochastic_corner:
            return self(params, x, max_level=max_level,
                        compute_dtype=compute_dtype)
        if bricks is None:
            bricks = (None,) * self.n_levels
        if not isinstance(params, (tuple, list)):
            params = self.unpack_params(params)
        D = self.n_dims
        C = 1 << D
        L, F = self.n_levels, self.n_features_per_level
        u_rand = None
        if stochastic_corner:
            bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
            hsh = jnp.zeros_like(bits[:, 0])
            for dd in range(D):
                hsh = hsh ^ (bits[:, dd] * np.uint32(_PRIMES[(dd + 1) % len(_PRIMES)]))
            hsh = hsh * np.uint32(0x9E3779B1)
            u_rand = (hsh >> 8).astype(jnp.float32) * np.float32(2.0**-24)
        outs = []
        for li, (level, table, brick) in enumerate(zip(self.levels, params, bricks)):
            op = self._level_op(level)
            grid, t, _ = _corner_setup(op, x)
            if brick is None:
                idx, w, _aux = _level_corners(op, grid, t)
                Cl, N = idx.shape
                if stochastic_corner and level.hashed and Cl > 1:
                    u_l = (u_rand + np.float32(li * 0.6180339887)) % 1.0
                    cdf = jnp.cumsum(w, axis=0)
                    c_sel = jnp.clip(
                        jnp.sum(cdf < u_l[None, :] * cdf[-1], axis=0), 0, Cl - 1)
                    idx_sel = jnp.take_along_axis(idx, c_sel[None, :], axis=0)[0]
                    outs.append(jnp.take(table, idx_sel, axis=0))
                    continue
                feats = jnp.take(table, idx.reshape(-1), axis=0).reshape(Cl, N, F)
                outs.append(jnp.einsum("cn,cnf->nf", w.astype(feats.dtype), feats))
            else:
                R = level.resolution
                cell = jnp.zeros_like(grid[:, 0], dtype=jnp.uint32)
                stride = 1
                for d in range(D):
                    cell = cell + grid[:, d].astype(jnp.uint32) * np.uint32(stride)
                    stride *= R
                cell = (cell % np.uint32(level.size)).astype(jnp.int32)
                rows = jnp.take(brick, cell, axis=0)  # (N, C·F)
                w = jnp.stack(
                    [_corner_weight(t, [(c >> d) & 1 for d in range(D)])
                     for c in range(C)], -1)  # (N, C)
                feats = rows.reshape(rows.shape[0], C, F)
                outs.append(jnp.einsum("nc,ncf->nf", w.astype(feats.dtype), feats))
        out = jnp.concatenate(outs, axis=-1)
        if max_level is not None:
            max_level = jnp.asarray(max_level)
            lvl = jnp.repeat(jnp.arange(L, dtype=jnp.float32), F)
            if max_level.ndim == 0:
                mask = lvl[None, :] < max_level * L
            else:
                mask = lvl[None, :] < max_level[:, None] * L
            out = out * mask.astype(out.dtype)
        return out.astype(compute_dtype)

    # retained for tests / diagnostics
    def corner_indices_and_weights(self, x: jax.Array):
        """(N, L, C) GLOBAL indices (packed-table space) + interpolation
        weights (small-N diagnostic path)."""
        idx_levels, w_levels = [], []
        for level in self.levels:
            op = self._level_op(level)
            grid, t, _ = _corner_setup(op, x)
            idx, w = _all_corners(op, grid, t)  # (C, N)
            idx_levels.append(idx.T + np.int32(level.offset))
            w_levels.append(w.T)
        return jnp.stack(idx_levels, 1), jnp.stack(w_levels, 1)


def grid_encoding_from_config(cfg: dict, n_dims: int) -> GridEncoding:
    """Build from a tcnn-style JSON encoding config (SURVEY.md §2.12)."""
    otype = cfg.get("otype", "HashGrid").lower()
    if "dense" in otype:
        grid_type = "dense"
    elif "tiled" in otype:
        grid_type = "tiled"
    else:
        grid_type = cfg.get("type", "Hash").lower() if "grid" == otype else "hash"
    n_features_per_level = int(cfg.get("n_features_per_level", 2))
    if cfg.get("n_features", 0):
        n_levels = int(cfg["n_features"]) // n_features_per_level
    else:
        n_levels = int(cfg.get("n_levels", 16))
    return GridEncoding(
        n_dims=n_dims,
        n_levels=n_levels,
        n_features_per_level=n_features_per_level,
        log2_hashmap_size=int(cfg.get("log2_hashmap_size", 19)),
        base_resolution=int(cfg.get("base_resolution", 16)),
        per_level_scale=float(cfg.get("per_level_scale", 2.0)),
        interpolation=str(cfg.get("interpolation", "Linear")).lower(),
        grid_type=grid_type,
    )
