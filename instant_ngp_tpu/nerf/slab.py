"""Slab-sweep renderer — the gather-free TPU recast of the reference's
fused render megakernel (testbed_nerf.cu:1928-2002, render_nerf.cuh).

The CUDA reference makes rendering fast by keeping the whole model in
registers inside one JIT megakernel; the ray-march + per-sample model
eval stays, only the dispatch overhead goes away.  On TPU the cost
structure is different: per-sample HBM *gathers* are the wall
(~8-15 ns/row regardless of width; docs/ROUND3_NOTES.md "Gather
economics"), so a fast renderer must not issue per-sample random
access at all.  This module restructures rendering so the inner loop
is dense linear algebra:

1.  The field is baked into DENSE per-cascade voxel volumes
    (bake_dense): activated [r,g,b,sigma] at voxel centers, bf16,
    occupancy-masked, inner-cascade regions zeroed.
2.  A frame is rendered by sweeping each volume slab-by-slab along its
    dominant axis (lax.scan).  Perspective is factored Lacroute-style:
    rays are parameterized by their intersection with a fixed
    baseplane (the slab plane nearest the eye), and the mapping from
    slab k to the baseplane is a pure epipolar scale about the eye —
    an AFFINE resample, computed as two small matmuls per slab with
    on-the-fly interpolation matrices.  The MXU does the sampling; no
    gathers touch the inner loop.
3.  Nested cascades composite exactly: each outer-cascade sweep splits
    its contribution into a FRONT layer (before the ray enters the
    next-inner cascade) and a BACK layer, using a per-pixel mask on
    the slab depth.  Layers merge front-to-back on a shared baseplane
    (more epipolar-scale matmuls), leaving three screen layers:
    F(outer-front) ⊕ L0(finest) ⊕ B(outer-back).
4.  The only random access in the whole frame is the final
    baseplane→screen warp: each layer is packed into 2x2-neighborhood
    rows of 64 B ("quad packing") so a full BILINEAR sample costs ONE
    bf16 gather per pixel per layer (bf16 gathers are width-free to
    64 B).

Cost model at 1080p, 256³ finest cascade, B=1024 baseplane: sweeps are
~0.5 GFLOP/slab of (B,n)x(n,B·4) matmuls → a few ms on the MXU; the
warp is 3 gathers/pixel ≈ tens of ms; everything else is elementwise.
Total ~10-100 ms/frame vs seconds for the per-sample march — the
difference between 0.2 and >10 M rays/s.

Pixels are grouped by dominant ray axis & sign in volume space (up to
6 sweep groups); each group gets its own sweep/baseplane.  Host code
plans the groups; device code is three jitted programs (sweep, merge,
warp) per volume shape.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import NERF_GRIDSIZE, network_to_density, network_to_rgb, warp_direction

G = NERF_GRIDSIZE

# channels carried per layer: premultiplied rgb, transmittance,
# weighted depth sum
LAYER_CH = 5


@dataclasses.dataclass
class DenseVolumes:
    """Per-cascade dense activated field: volumes[m] is (n_m,n_m,n_m,4)
    bf16 [r,g,b,sigma] at voxel centers; cascade m spans the scene-space
    cube centered at 0.5 with half-extent 2^(m-1) (m=0: [0,1]^3)."""

    volumes: list  # of jax arrays
    res: list      # of ints n_m
    n_cascades: int


def cascade_extent(m: int):
    half = 0.5 * (2.0 ** m)
    return 0.5 - half, 0.5 + half


def bake_dense(
    model,
    params,
    bitfield: np.ndarray,
    n_cascades: int,
    aabb_min,
    aabb_max,
    rgb_activation,
    density_activation,
    origin: np.ndarray | None = None,
    res0: int = 256,
    res_outer: int = G,
    chunk: int = 1 << 19,
    bricks=None,
    eval_fn=None,
) -> DenseVolumes:
    """Bake the model into dense per-cascade volumes.

    Only occupied voxels (per the training occupancy bitfield) are
    evaluated; the rest stay zero.  Voxels of cascade m>0 whose center
    lies inside cascade m-1's extent are zeroed — the finer cascade
    owns them, so the nested composite never double-counts.
    """
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    if eval_fn is None:
        eval_fn = make_voxel_eval(model, rgb_activation, density_activation)

    def occ_at(occ, n):
        if n >= occ.shape[0]:
            rep = n // occ.shape[0]
            return occ.repeat(rep, 0).repeat(rep, 1).repeat(rep, 2)
        f = occ.shape[0] // n
        return occ.reshape(n, f, n, f, n, f).any((1, 3, 5))

    volumes, res_list = [], []
    for m in range(n_cascades):
        n = res0 if m == 0 else res_outer
        occ = occ_at(np.asarray(bitfield[m]), n)
        if m > 0:
            # zero the inner-cascade region (centers strictly inside
            # the previous cascade): cascade m-1 spans the middle half
            # of cascade m's extent in each axis
            c = np.arange(n, dtype=np.float32)
            centers = (c + 0.5) / n  # mip-m unit coords
            inner = (centers > 0.25) & (centers < 0.75)
            occ = occ & ~(inner[:, None, None] & inner[None, :, None]
                          & inner[None, None, :])
        ijk = np.argwhere(occ).astype(np.int32)
        vol = np.zeros((n * n * n, 4), np.float32)
        if len(ijk):
            n_chunks = (len(ijk) + chunk - 1) // chunk
            pad = n_chunks * chunk - len(ijk)
            ijk_d = jnp.asarray(np.pad(ijk, ((0, pad), (0, 0))))
            origin_d = (jnp.asarray(origin, jnp.float32)
                        if origin is not None
                        else jnp.asarray(FIXED_BAKE_DIR))
            aabb = (jnp.asarray(aabb_min), jnp.asarray(aabb_max))
            outs = [
                eval_fn(params, bricks, ijk_d[s : s + chunk],
                        jnp.int32(m), jnp.int32(n), aabb, origin_d,
                        origin is not None)
                for s in range(0, n_chunks * chunk, chunk)
            ]
            vals = np.asarray(jnp.concatenate(outs))[: len(ijk)]
            flat = (ijk[:, 0].astype(np.int64) * n + ijk[:, 1]) * n + ijk[:, 2]
            vol[flat] = vals
        volumes.append(jnp.asarray(vol.reshape(n, n, n, 4), jnp.bfloat16))
        res_list.append(n)
    return DenseVolumes(volumes=volumes, res=res_list,
                        n_cascades=n_cascades)


FIXED_BAKE_DIR = np.float32([0.5774, 0.5774, 0.5774])


def make_voxel_eval(model, rgb_activation, density_activation):
    """Jitted voxel-center evaluator: (C,3) int cells of cascade m at
    resolution n → (C,4) activated [r,g,b,sigma]."""

    @functools.partial(jax.jit, static_argnums=(7,))
    def eval_chunk(params, bricks, cells, mip, n, aabb, origin_or_dir,
                   use_origin: bool):
        aabb_min, aabb_max = aabb
        unit = (cells.astype(jnp.float32) + 0.5) / n.astype(jnp.float32)
        world = (unit - 0.5) * jnp.exp2(mip.astype(jnp.float32)) + 0.5
        pos_w = (world - aabb_min) / (aabb_max - aabb_min)
        if use_origin:
            d = world - origin_or_dir
            d = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        else:
            d = jnp.broadcast_to(origin_or_dir, world.shape)
        out = model(params, pos_w, warp_direction(d), bricks=bricks)
        rgb = network_to_rgb(out[:, :3].astype(jnp.float32), rgb_activation)
        sigma = network_to_density(out[:, 3].astype(jnp.float32),
                                   density_activation)
        return jnp.concatenate([rgb, sigma[:, None]], -1)

    return eval_chunk


# ---------------------------------------------------------------------------
# sweep


def _interp_matrix(sample_idx, n: int):
    """(B,) fractional texel coords → (B, n) linear-interp weights.
    Rows whose coord falls outside [-1, n] are all-zero (no wraparound,
    no clamping — outside the volume contributes nothing)."""
    j = jax.lax.broadcasted_iota(jnp.float32, (sample_idx.shape[0], n), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(sample_idx[:, None] - j))


def _ray_box_entry(o, dirs, lo, hi):
    """Per-pixel entry t of rays (o + t*dir) into the box [lo, hi]^3.
    +inf for rays that miss; 0 if the origin is inside."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12,
                          jnp.where(dirs >= 0, 1e-12, -1e-12), dirs)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = tmax >= jnp.maximum(tmin, 0.0)
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


@functools.partial(jax.jit, static_argnames=("n", "B"))
def sweep(
    vol_t,      # (n, n, n, 4) bf16, axis 0 = sweep axis (permuted)
    e_p,        # (3,) eye, permuted coords
    sign,       # f32 ±1: sweep direction along axis 0
    lo_p,       # (3,) cascade extent lower corner, permuted
    hi_p,       # (3,)
    z_base,     # f32 baseplane plane coordinate (axis 0)
    bp_lo,      # (2,) baseplane window lower (u, v)
    bp_hi,      # (2,)
    inner_lo_p,  # (3,) next-inner cascade box (±inf when innermost)
    inner_hi_p,
    *,
    n: int,
    B: int,
):
    """Sweep one cascade volume front-to-back; returns (front, back)
    layers, each (B, B, LAYER_CH): [premult rgb, T, sum w*t]."""
    f32 = jnp.float32
    dz = (hi_p[0] - lo_p[0]) / n
    u0 = bp_lo[0] + (jnp.arange(B, dtype=f32) + 0.5) / B * (bp_hi[0] - bp_lo[0])
    v0 = bp_lo[1] + (jnp.arange(B, dtype=f32) + 0.5) / B * (bp_hi[1] - bp_lo[1])
    uu, vv = jnp.meshgrid(u0, v0, indexing="ij")           # (B, B)
    # per-pixel ray through the baseplane point
    zb_rel = z_base - e_p[0]
    du, dv = uu - e_p[1], vv - e_p[2]
    dist = jnp.sqrt(du * du + dv * dv + zb_rel * zb_rel)
    q = dist / jnp.abs(zb_rel)            # dt per unit axial distance
    # inner-box entry t along each ray (t in euclidean units)
    dirs = jnp.stack([jnp.broadcast_to(zb_rel, uu.shape), du, dv],
                     -1) / dist[..., None]
    t_inner = _ray_box_entry(e_p, dirs, inner_lo_p, inner_hi_p)

    def body(carry, k):
        rgb_f, T_f, dw_f, rgb_b, T_b, dw_b = carry
        ksl = jnp.where(sign > 0, k, n - 1 - k)
        z_k = lo_p[0] + (ksl.astype(f32) + 0.5) * dz
        ahead = (z_k - e_p[0]) * sign > 0.49 * dz  # slab ahead of eye
        s_k = (z_k - e_p[0]) / zb_rel
        # baseplane pixel (i,j) samples the slab at the epipolar scale
        u_s = e_p[1] + (u0 - e_p[1]) * s_k
        v_s = e_p[2] + (v0 - e_p[2]) * s_k
        ui = (u_s - lo_p[1]) / (hi_p[1] - lo_p[1]) * n - 0.5
        vi = (v_s - lo_p[2]) / (hi_p[2] - lo_p[2]) * n - 0.5
        Wu = _interp_matrix(ui, n)        # (B, n)
        Wv = _interp_matrix(vi, n)        # (B, n)
        S = jax.lax.dynamic_index_in_dim(vol_t, ksl, 0, keepdims=False)
        S = S.astype(jnp.bfloat16)
        tmp = jnp.einsum("un,nvc->uvc", Wu.astype(jnp.bfloat16), S,
                         preferred_element_type=jnp.float32)
        slab = jnp.einsum("vn,unc->uvc", Wv.astype(jnp.bfloat16),
                          tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        sigma = jnp.maximum(slab[..., 3], 0.0)
        col = jnp.maximum(slab[..., :3], 0.0)
        # weights were un-normalized interp (rows sum to <=1 at the
        # border, 0 outside) — colors are premultiplied by coverage,
        # which is exactly the zero-outside behavior we want
        t_k = (z_k - e_p[0]) * sign * q   # euclidean distance from eye
        alpha = 1.0 - jnp.exp(-sigma * dz * q)
        alpha = jnp.where(ahead, alpha, 0.0)
        mf = t_k < t_inner
        a_f = jnp.where(mf, alpha, 0.0)
        a_b = jnp.where(mf, 0.0, alpha)
        w_f = T_f * a_f
        w_b = T_b * a_b
        rgb_f = rgb_f + w_f[..., None] * col
        dw_f = dw_f + w_f * t_k
        T_f = T_f * (1.0 - a_f)
        rgb_b = rgb_b + w_b[..., None] * col
        dw_b = dw_b + w_b * t_k
        T_b = T_b * (1.0 - a_b)
        return (rgb_f, T_f, dw_f, rgb_b, T_b, dw_b), None

    z = jnp.zeros((B, B))
    init = (jnp.zeros((B, B, 3)), jnp.ones((B, B)), z,
            jnp.zeros((B, B, 3)), jnp.ones((B, B)), z)
    (rgb_f, T_f, dw_f, rgb_b, T_b, dw_b), _ = jax.lax.scan(
        body, init, jnp.arange(n))
    front = jnp.concatenate([rgb_f, T_f[..., None], dw_f[..., None]], -1)
    back = jnp.concatenate([rgb_b, T_b[..., None], dw_b[..., None]], -1)
    return front, back


# ---------------------------------------------------------------------------
# merge: resample a layer between two baseplanes of the same axis group
# and composite front-to-back


@functools.partial(jax.jit, static_argnames=("B_out",))
def resample_layer(layer, e_p, z_src, src_lo, src_hi, z_dst, dst_lo,
                   dst_hi, *, B_out: int):
    """Epipolar-rescale a (B,B,C) layer from baseplane z_src (window
    src_lo..src_hi) onto baseplane z_dst (window dst_lo..dst_hi) at
    resolution B_out.  Outside the source window the layer is empty:
    rgb/depth 0, T 1 — handled by resampling (layer - empty) with
    zero-padding and adding empty back."""
    B = layer.shape[0]
    f32 = jnp.float32
    s = (z_src - e_p[0]) / (z_dst - e_p[0])
    u_d = dst_lo[0] + (jnp.arange(B_out, dtype=f32) + 0.5) / B_out \
        * (dst_hi[0] - dst_lo[0])
    v_d = dst_lo[1] + (jnp.arange(B_out, dtype=f32) + 0.5) / B_out \
        * (dst_hi[1] - dst_lo[1])
    u_s = e_p[1] + (u_d - e_p[1]) * s
    v_s = e_p[2] + (v_d - e_p[2]) * s
    ui = (u_s - src_lo[0]) / (src_hi[0] - src_lo[0]) * B - 0.5
    vi = (v_s - src_lo[1]) / (src_hi[1] - src_lo[1]) * B - 0.5
    Wu = _interp_matrix(ui, B)
    Wv = _interp_matrix(vi, B)
    empty = jnp.zeros((LAYER_CH,), f32).at[3].set(1.0)
    delta = layer - empty
    out = jnp.einsum("vn,unc->uvc", Wv,
                     jnp.einsum("un,nvc->uvc", Wu, delta))
    return out + empty


def composite_layers(a, b):
    """Front-to-back composite of two (…,LAYER_CH) layers: a over b."""
    Ta = a[..., 3:4]
    return jnp.concatenate(
        [a[..., :3] + Ta * b[..., :3],
         Ta * b[..., 3:4],
         a[..., 4:5] + Ta * b[..., 4:5]], -1)


# ---------------------------------------------------------------------------
# quad packing + screen warp


@jax.jit
def quad_pack(layer):
    """(B,B,C) → (B*B, 4*C) bf16 rows where row (i*B+j) holds the 2x2
    neighborhood [(i,j),(i,j+1),(i+1,j),(i+1,j+1)] — a full bilinear
    footprint in ONE ≤64 B gather."""
    rows, cols = layer.shape[0], layer.shape[1]
    r0 = layer
    r1 = jnp.concatenate([layer[:, 1:], layer[:, -1:]], 1)
    r2 = jnp.concatenate([layer[1:], layer[-1:]], 0)
    r3 = jnp.concatenate([r2[:, 1:], r2[:, -1:]], 1)
    packed = jnp.concatenate([r0, r1, r2, r3], -1)
    return packed.reshape(rows * cols, -1).astype(jnp.bfloat16)


def sample_packed(packed, B: int, ui, vi):
    """Bilinear-sample a quad-packed layer at fractional texel coords
    (ui, vi) (any shape).  One gather per sample."""
    i0 = jnp.clip(jnp.floor(ui).astype(jnp.int32), 0, B - 1)
    j0 = jnp.clip(jnp.floor(vi).astype(jnp.int32), 0, B - 1)
    fu = jnp.clip(ui - i0.astype(jnp.float32), 0.0, 1.0)
    fv = jnp.clip(vi - j0.astype(jnp.float32), 0.0, 1.0)
    rows = jnp.take(packed, i0 * B + j0, axis=0).astype(jnp.float32)
    C = rows.shape[-1] // 4
    r = rows.reshape(*rows.shape[:-1], 2, 2, C)
    w00 = (1 - fu) * (1 - fv)
    w01 = (1 - fu) * fv
    w10 = fu * (1 - fv)
    w11 = fu * fv
    out = (w00[..., None] * r[..., 0, 0, :] + w01[..., None] * r[..., 0, 1, :]
           + w10[..., None] * r[..., 1, 0, :]
           + w11[..., None] * r[..., 1, 1, :])
    # outside the window: empty layer (T=1)
    inside = ((ui >= -0.5) & (ui <= B - 0.5) & (vi >= -0.5)
              & (vi <= B - 0.5))
    empty = jnp.zeros((C,), jnp.float32).at[3].set(1.0)
    return jnp.where(inside[..., None], out, empty)


# ---------------------------------------------------------------------------
# full-frame orchestration

_PERMS = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]


@functools.partial(jax.jit, static_argnames=("B0", "Bo", "n_groups"))
def _warp_composite(dirs, eye, f_pk, l_pk, b_pk, zb_tab, win_lo_tab,
                    win_hi_tab, bg, *, B0: int, Bo: int, n_groups: int):
    """Per-pixel screen warp + 3-layer composite.

    dirs: (N,3) unit ray directions (scene space); eye: (3,).
    f_pk/b_pk: (n_groups*Bo*Bo, 4*LAYER_CH) quad-packed outer layers;
    l_pk: (n_groups*B0*B0, ...) innermost layer.
    zb_tab: (n_groups, 3) baseplane plane-coord per layer [F, L0, B];
    win_*_tab: (n_groups, 3, 2) baseplane windows per layer.
    Returns (N, LAYER_CH) composited [premult rgb, T, depth].
    """
    ax = jnp.argmax(jnp.abs(dirs), axis=-1)                # (N,)
    d_a = jnp.take_along_axis(dirs, ax[:, None], -1)[:, 0]
    sgn = jnp.where(d_a >= 0, 0, 1)
    g = ax * 2 + sgn                                       # (N,) group id
    # permuted components (a, u, v) per pixel
    du = jnp.take_along_axis(dirs, ((ax + 1) % 3)[:, None], -1)[:, 0]
    dv = jnp.take_along_axis(dirs, ((ax + 2) % 3)[:, None], -1)[:, 0]
    e_a = jnp.take(eye, ax)
    e_u = jnp.take(eye, (ax + 1) % 3)
    e_v = jnp.take(eye, (ax + 2) % 3)

    def layer_uv(li, B):
        zb = jnp.take(zb_tab[:, li], g)
        lo = jnp.take(win_lo_tab[:, li], g, axis=0)        # (N, 2)
        hi = jnp.take(win_hi_tab[:, li], g, axis=0)
        s = (zb - e_a) / d_a
        u = e_u + du * s
        v = e_v + dv * s
        ui = (u - lo[:, 0]) / (hi[:, 0] - lo[:, 0]) * B - 0.5
        vi = (v - lo[:, 1]) / (hi[:, 1] - lo[:, 1]) * B - 0.5
        return ui, vi

    def sample_stack(pk, li, B):
        ui, vi = layer_uv(li, B)
        i0 = jnp.clip(jnp.floor(ui).astype(jnp.int32), 0, B - 1)
        j0 = jnp.clip(jnp.floor(vi).astype(jnp.int32), 0, B - 1)
        fu = jnp.clip(ui - i0.astype(jnp.float32), 0.0, 1.0)
        fv = jnp.clip(vi - j0.astype(jnp.float32), 0.0, 1.0)
        rows = jnp.take(pk, g * (B * B) + i0 * B + j0,
                        axis=0).astype(jnp.float32)
        r = rows.reshape(-1, 2, 2, LAYER_CH)
        out = ((1 - fu) * (1 - fv))[:, None] * r[:, 0, 0] \
            + ((1 - fu) * fv)[:, None] * r[:, 0, 1] \
            + (fu * (1 - fv))[:, None] * r[:, 1, 0] \
            + (fu * fv)[:, None] * r[:, 1, 1]
        inside = ((ui >= -0.5) & (ui <= B - 0.5) & (vi >= -0.5)
                  & (vi <= B - 0.5))
        empty = jnp.zeros((LAYER_CH,), jnp.float32).at[3].set(1.0)
        return jnp.where(inside[:, None], out, empty)

    F = sample_stack(f_pk, 0, Bo)
    L = sample_stack(l_pk, 1, B0)
    Bk = sample_stack(b_pk, 2, Bo)
    out = composite_layers(composite_layers(F, L), Bk)
    rgb = out[..., :3] + out[..., 3:4] * bg[:3] * bg[3]
    alpha = 1.0 - out[..., 3] * (1.0 - bg[3])
    return jnp.concatenate([rgb, alpha[:, None], out[..., 4:5]], -1)


def _plan_group(eye_p, n, lo, hi, sign, dz):
    """Pick the baseplane plane-coordinate for one (cascade, group):
    the center of the first slab strictly ahead of the eye."""
    if sign > 0:
        k0 = int(np.ceil((eye_p + 0.49 * dz - lo) / dz - 0.5))
        k0 = min(max(k0, 0), n - 1)
        return lo + (k0 + 0.5) * dz
    k0 = int(np.ceil((hi - eye_p + 0.49 * dz) / dz - 0.5))
    k0 = min(max(k0, 0), n - 1)
    return hi - (k0 + 0.5) * dz


def render_frame(
    dvols: DenseVolumes,
    eye,
    dirs,
    background=(0.0, 0.0, 0.0, 0.0),
    B0: int = 512,
    Bo: int = 256,
):
    """Render unit ray dirs (N,3) from `eye` through the dense volumes.
    Returns (N, 5) [premult rgb, alpha, depth] as a jax array."""
    eye = np.asarray(eye, np.float32)
    dirs_np = np.asarray(dirs, np.float32)
    N = dirs_np.shape[0]
    nc = dvols.n_cascades

    ax = np.argmax(np.abs(dirs_np), axis=-1)
    d_a = np.take_along_axis(dirs_np, ax[:, None], -1)[:, 0]
    g_np = ax * 2 + (d_a < 0)
    groups = np.unique(g_np)

    # device-side transposed volumes, built once per frame per axis used
    vol_t = {}
    for g in groups:
        a = g // 2
        if a not in vol_t:
            perm = _PERMS[a]
            vol_t[a] = [jnp.transpose(dvols.volumes[m], perm + (3,))
                        for m in range(nc)]

    zb_tab = np.zeros((6, 3), np.float32)
    win_lo_tab = np.ones((6, 3, 2), np.float32)
    win_hi_tab = np.full((6, 3, 2), 2.0, np.float32)  # degenerate default
    f_stack = np.zeros((6, Bo, Bo, LAYER_CH), np.float32)
    f_stack[..., 3] = 1.0
    b_stack = f_stack.copy()
    l_stack = np.zeros((6, B0, B0, LAYER_CH), np.float32)
    l_stack[..., 3] = 1.0
    f_dev = jnp.asarray(f_stack)
    b_dev = jnp.asarray(b_stack)
    l_dev = jnp.asarray(l_stack)

    inf3 = np.full(3, np.inf, np.float32)
    for g in groups:
        a, sgn = int(g // 2), (-1.0 if g % 2 else 1.0)
        perm = _PERMS[a]
        e_p = eye[list(perm)]
        mask = g_np == g
        du = dirs_np[mask][:, perm[1]] / dirs_np[mask][:, perm[0]]
        dv = dirs_np[mask][:, perm[2]] / dirs_np[mask][:, perm[0]]

        layers = []  # per cascade (front, back, z_b, win_lo, win_hi)
        for m in range(nc):
            n = dvols.res[m]
            lo, hi = cascade_extent(m)
            dz = (hi - lo) / n
            z_b = _plan_group(e_p[0], n, lo, hi, sgn, dz)
            # frustum footprint on this baseplane, clipped to extent
            s = (z_b - e_p[0])
            u0 = e_p[1] + du * s
            v0 = e_p[2] + dv * s
            # window = the group's pixel footprint on the baseplane.
            # NOT clipped to the volume extent: rays entering through
            # a side face intersect the baseplane outside the extent,
            # and the epipolar scale brings them inside on later slabs
            # (|du|,|dv| <= 1 by dominant-axis grouping bounds this).
            pad = 2 * dz
            wlo = np.float32([u0.min() - pad, v0.min() - pad])
            whi = np.float32([u0.max() + pad, v0.max() + pad])
            whi = np.maximum(whi, wlo + 1e-4)
            if m == 0:
                ilo, ihi = inf3, inf3  # miss → everything in front
            else:
                l_in, h_in = cascade_extent(m - 1)
                ilo = np.full(3, l_in, np.float32)
                ihi = np.full(3, h_in, np.float32)
            B = B0 if m == 0 else Bo
            front, back = sweep(
                vol_t[a][m], jnp.asarray(e_p), jnp.float32(sgn),
                jnp.asarray(np.full(3, lo, np.float32)),
                jnp.asarray(np.full(3, hi, np.float32)),
                jnp.float32(z_b), jnp.asarray(wlo), jnp.asarray(whi),
                jnp.asarray(ilo), jnp.asarray(ihi), n=n, B=B)
            layers.append((front, back, z_b, wlo, whi))

        # innermost: single layer on its own plane
        l0 = composite_layers(layers[0][0], layers[0][1])
        zb_tab[g, 1] = layers[0][2]
        win_lo_tab[g, 1] = layers[0][3]
        win_hi_tab[g, 1] = layers[0][4]
        l_dev = l_dev.at[g].set(l0)

        if nc > 1:
            # outer layers merge on the OUTERMOST cascade's baseplane
            zM, loM, hiM = layers[-1][2], layers[-1][3], layers[-1][4]
            e_d = jnp.asarray(e_p)

            def to_outer(layer, m):
                if m == nc - 1:
                    return layer
                _, _, z_s, lo_s, hi_s = layers[m]
                return resample_layer(
                    layer, e_d, jnp.float32(z_s), jnp.asarray(lo_s),
                    jnp.asarray(hi_s), jnp.float32(zM), jnp.asarray(loM),
                    jnp.asarray(hiM), B_out=Bo)

            F = to_outer(layers[nc - 1][0], nc - 1)
            for m in range(nc - 2, 0, -1):
                F = composite_layers(F, to_outer(layers[m][0], m))
            Bk = to_outer(layers[1][1], 1)
            for m in range(2, nc):
                Bk = composite_layers(Bk, to_outer(layers[m][1], m))
            zb_tab[g, 0] = zb_tab[g, 2] = zM
            win_lo_tab[g, 0] = win_lo_tab[g, 2] = loM
            win_hi_tab[g, 0] = win_hi_tab[g, 2] = hiM
            f_dev = f_dev.at[g].set(F)
            b_dev = b_dev.at[g].set(Bk)

    f_pk = quad_pack(f_dev.reshape(6 * Bo, Bo, LAYER_CH))
    b_pk = quad_pack(b_dev.reshape(6 * Bo, Bo, LAYER_CH))
    l_pk = quad_pack(l_dev.reshape(6 * B0, B0, LAYER_CH))
    return _warp_composite(
        jnp.asarray(dirs_np), jnp.asarray(eye), f_pk, l_pk, b_pk,
        jnp.asarray(zb_tab), jnp.asarray(win_lo_tab),
        jnp.asarray(win_hi_tab), jnp.asarray(background, jnp.float32),
        B0=B0, Bo=Bo, n_groups=6)
