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
    (bake_dense): activated [σ·r, σ·g, σ·b, σ] at voxel centers, bf16,
    occupancy-masked, inner-cascade regions zeroed.  Color is stored
    σ-PREMULTIPLIED so masked (all-zero) voxels are zero-weight under
    trilinear resampling; the sweep divides after interpolating.
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
    """Nested dense activated field levels: volumes[m] is (n_m,n_m,n_m,4)
    bf16 [σ·r, σ·g, σ·b, σ] (σ-premultiplied color) at voxel centers.  Level m covers the world-space
    box boxes[m] (boxes[m-1] strictly inside boxes[m]).  When boxes is
    None the levels default to the scene-centered NGP cascade extents
    (cube centered at 0.5 with half-extent 2^(m-1)).

    For inside-out captures (fox: cameras INSIDE the scene, subject
    right in front of each camera but outside the unit cube) the
    scene-centered pyramid puts the on-screen subject at the COARSE
    levels — an eye-centered clipmap (task._get_slab) allocates fine
    voxels by proximity instead, like the exact renderer's cone-rate
    sampling."""

    volumes: list  # of jax arrays
    res: list      # of ints n_m
    n_cascades: int
    boxes: np.ndarray | None = None  # (nc, 2, 3) world [lo, hi]
    vt_cache: dict | None = None     # axis → transposed volumes (lazy)
    feat_proj: tuple | None = None   # (mu(16,), sd(16,), P(16,F)) PCA

    @property
    def n_feat(self) -> int:
        """Deferred-shading feature channels carried per voxel."""
        return int(self.volumes[0].shape[-1]) - 4

    @property
    def layer_ch(self) -> int:
        """Swept-layer channel count: [rgb, T, depth, features…]."""
        return LAYER_CH + self.n_feat

    def box(self, m: int):
        if self.boxes is not None:
            return (np.asarray(self.boxes[m][0], np.float32),
                    np.asarray(self.boxes[m][1], np.float32))
        lo, hi = cascade_extent(m)
        return np.full(3, lo, np.float32), np.full(3, hi, np.float32)


def cascade_extent(m: int):
    half = 0.5 * (2.0 ** m)
    return 0.5 - half, 0.5 + half


def clipmap_boxes(eye, aabb_min, aabb_max, finest_extent: float = 0.25,
                  ) -> np.ndarray:
    """Eye-centered nested clipmap boxes, extents geometric ×2 from
    `finest_extent` up to the scene AABB (the outermost box), each
    centered as close to the eye as nesting inside its parent allows.

    The finest extent bounds the renderer's angular resolution: level
    content sits at distance ≥ extent/4 from the eye, so a level's
    angular voxel size is ~4/res rad regardless of extent — but only
    down to the finest box, whose interior content (distance <
    finest_extent/4) is undersampled.  0.25 puts that horizon at ~0.06
    world units — closer than any fox training camera gets to content.
    Centers snap to an extent/8 lattice so small camera motion reuses a
    cached bake."""
    aabb_min = np.asarray(aabb_min, np.float32)
    aabb_max = np.asarray(aabb_max, np.float32)
    eye = np.asarray(eye, np.float32)
    outer_extent = float(np.max(aabb_max - aabb_min))
    n_levels = max(1, int(np.round(np.log2(outer_extent / finest_extent)))
                   + 1)
    boxes = np.zeros((n_levels, 2, 3), np.float32)
    boxes[n_levels - 1, 0] = aabb_min
    boxes[n_levels - 1, 1] = aabb_max
    for m in range(n_levels - 2, -1, -1):
        half = 0.5 * finest_extent * (2.0 ** m)
        quantum = max(finest_extent * 2.0 ** m / 8.0, 1e-3)
        lo_p, hi_p = boxes[m + 1]
        c = np.clip(eye, lo_p + half, hi_p - half)
        c = np.round(c / quantum) * quantum
        c = np.clip(c, lo_p + half, hi_p - half)  # snap can violate
        boxes[m, 0] = c - half
        boxes[m, 1] = c + half
    return boxes


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
    boxes: np.ndarray | None = None,
    feat_proj=None,
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
        eval_fn = make_voxel_eval(model, rgb_activation, density_activation,
                                  feat_proj=feat_proj)
    C = 4 + (0 if feat_proj is None else int(np.shape(feat_proj[2])[1]))
    bitfield = np.asarray(bitfield)
    Gb = bitfield.shape[1]
    max_mip = n_cascades - 1
    # boxes may define MORE levels than scene cascades (an eye-centered
    # clipmap refines below the unit cube); occupancy always probes the
    # scene-cascade bitfield of the position
    n_levels = len(boxes) if boxes is not None else n_cascades

    def occupied_np(P):
        """Numpy replica of occupancy.occupied_at ∘ raymarch.mip_from_pos:
        a world position is occupied iff its SCENE cascade's bitfield
        cell is set — level boxes may be eye-centered, the training
        grid stays scene-centered."""
        maxval = np.max(np.abs(P - 0.5), axis=-1)
        mip = np.clip(np.frexp(np.maximum(maxval, 1e-30))[1] + 1, 0,
                      max_mip)
        pm = (P - 0.5) * np.exp2(-mip)[:, None] + 0.5
        i = np.floor(pm * Gb).astype(np.int32)
        inb = ((i >= 0) & (i < Gb)).all(-1)
        i = np.clip(i, 0, Gb - 1)
        return bitfield[mip, i[:, 0], i[:, 1], i[:, 2]] & inb

    volumes, res_list = [], []
    for m in range(n_levels):
        n = res0 if m == 0 else res_outer
        if boxes is None:
            lo_c, hi_c = cascade_extent(m)
            box_lo = np.full(3, lo_c, np.float32)
            box_hi = np.full(3, hi_c, np.float32)
        else:
            box_lo = np.asarray(boxes[m][0], np.float32)
            box_hi = np.asarray(boxes[m][1], np.float32)
        cs = [box_lo[a] + (np.arange(n, dtype=np.float32) + 0.5) / n
              * (box_hi[a] - box_lo[a]) for a in range(3)]
        P = np.stack(np.meshgrid(*cs, indexing="ij"), -1).reshape(-1, 3)
        occ = occupied_np(P)
        if m > 0:
            # zero voxels whose centers lie inside the next-inner box:
            # the finer level owns them, so the nested F/B composite
            # never double-counts
            if boxes is None:
                ilo_c, ihi_c = cascade_extent(m - 1)
                ilo = np.full(3, ilo_c, np.float32)
                ihi = np.full(3, ihi_c, np.float32)
            else:
                ilo = np.asarray(boxes[m - 1][0], np.float32)
                ihi = np.asarray(boxes[m - 1][1], np.float32)
            occ &= ~((P > ilo) & (P < ihi)).all(-1)
        ijk = np.stack(np.unravel_index(np.flatnonzero(occ), (n, n, n)),
                       -1).astype(np.int32)
        del P, occ
        # one overflow row at the end: padded chunk rows scatter there,
        # keeping the whole bake ON DEVICE (the old host round-trip
        # fetched ~100 MB of evals through the tunnel per bake)
        vol = jnp.zeros((n * n * n + 1, C), jnp.bfloat16)
        if len(ijk):
            n_chunks = (len(ijk) + chunk - 1) // chunk
            pad = n_chunks * chunk - len(ijk)
            ijk_p = np.pad(ijk, ((0, pad), (0, 0)))
            flat = ((ijk_p[:, 0].astype(np.int64) * n + ijk_p[:, 1]) * n
                    + ijk_p[:, 2])
            flat[len(ijk):] = n * n * n  # overflow slot
            ijk_d = jnp.asarray(ijk_p)
            flat_d = jnp.asarray(flat, jnp.int32)
            origin_d = (jnp.asarray(origin, jnp.float32)
                        if origin is not None
                        else jnp.asarray(FIXED_BAKE_DIR))
            aabb = (jnp.asarray(aabb_min), jnp.asarray(aabb_max))
            box_lo_d = jnp.asarray(box_lo)
            box_size_d = jnp.asarray(box_hi - box_lo)
            for s in range(0, n_chunks * chunk, chunk):
                vals = eval_fn(params, bricks, ijk_d[s : s + chunk],
                               box_lo_d, box_size_d, jnp.int32(n), aabb,
                               origin_d, origin is not None)
                vol = vol.at[flat_d[s : s + chunk]].set(
                    vals.astype(jnp.bfloat16))
        volumes.append(vol[: n * n * n].reshape(n, n, n, C))
        res_list.append(n)
    return DenseVolumes(volumes=volumes, res=res_list,
                        n_cascades=n_levels, boxes=boxes,
                        feat_proj=feat_proj)


FIXED_BAKE_DIR = np.float32([0.5774, 0.5774, 0.5774])


# body-diagonal sub-voxel offsets for the transmittance-corrected
# sigma bake (±1/4 voxel along two diagonals — cheap, direction-free)
_SIGMA_TAPS = np.float32([
    [-0.25, -0.25, -0.25], [0.25, 0.25, 0.25],
    [-0.25, 0.25, -0.25], [0.25, -0.25, 0.25],
])


def make_voxel_eval(model, rgb_activation, density_activation,
                    feat_proj=None):
    """Jitted voxel-center evaluator: (C,3) int cells of the level box
    [box_lo, box_lo+box_size] at resolution n → (C,4) activated
    [σ_eff·r, σ_eff·g, σ_eff·b, sigma_eff] (σ-premultiplied color).

    sigma_eff is TRANSMITTANCE-corrected: the slab renderer integrates
    at one sample per voxel (dz = the voxel size), 4-8× coarser than
    the exact march, and E[exp(−σ·dz)] ≠ exp(−E[σ]·dz) when σ varies
    inside the voxel (fox fur: the center-sampled bake saturated
    opacity on the low-density outer fuzz). Bake
    σ_eff = −log(mean_taps exp(−σ_tap·dz))/dz from 4 sub-voxel density
    taps + the center so one coarse step reproduces the voxel's true
    mean transmittance.

    feat_proj=(mu, sd, P): deferred view dependence (the SNeRG split,
    Hedman et al. recast post-hoc). The 16-dim density-MLP output f is
    standardized and projected to F=P.shape[1] dims; the volume gains F
    extra σ-premultiplied channels [σ·((f−mu)/sd)@P]. The renderer
    composites them like color and decodes per PIXEL with the exact
    rgb MLP on the PCA-reconstructed feature (task._render_slab) —
    view-dependent shading without a per-camera rebake."""

    @functools.partial(jax.jit, static_argnums=(8,))
    def eval_chunk(params, bricks, cells, box_lo, box_size, n, aabb,
                   origin_or_dir, use_origin: bool):
        aabb_min, aabb_max = aabb
        nf = n.astype(jnp.float32)
        world = box_lo + (cells.astype(jnp.float32) + 0.5) / nf * box_size
        pos_w = (world - aabb_min) / (aabb_max - aabb_min)
        if use_origin:
            d = world - origin_or_dir
            d = d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        else:
            d = jnp.broadcast_to(origin_or_dir, world.shape)
        # density features once; rgb head on [features ⊕ SH(dir)] — the
        # same math as model.__call__, with f exposed for projection
        d_out = model.density(params, pos_w, bricks=bricks)
        dir_feats = model.dir_encoding(params.get("dir_enc"),
                                       warp_direction(d))
        rgb_in = [d_out, dir_feats]
        if model.n_extra_dims > 0:
            rgb_in.append(jnp.zeros((pos_w.shape[0], model.n_extra_dims),
                                    d_out.dtype))
        rgb_logits = model.rgb_network(params["rgb_net"],
                                       jnp.concatenate(rgb_in, -1))
        rgb = network_to_rgb(rgb_logits[:, :3].astype(jnp.float32),
                             rgb_activation)
        sigma_c = network_to_density(d_out[:, 0].astype(jnp.float32),
                                     density_activation)
        # sub-voxel density taps (density-only path: no dir encoding)
        dz = box_size[0] / nf  # voxel size in scene units (cubical box)
        sigmas = [sigma_c]
        for tap in _SIGMA_TAPS:
            world_t = box_lo + (cells.astype(jnp.float32) + 0.5
                                + jnp.asarray(tap)) / nf * box_size
            pos_t = (world_t - aabb_min) / (aabb_max - aabb_min)
            logit = model.density(params, pos_t, bricks=bricks)[:, 0]
            sigmas.append(network_to_density(
                logit.astype(jnp.float32), density_activation))
        trans = jnp.mean(
            jnp.stack([jnp.exp(-s * dz) for s in sigmas]), axis=0)
        sigma_eff = -jnp.log(jnp.maximum(trans, 1e-20)) / dz
        # SIGMA-PREMULTIPLIED color: unoccupied voxels are all-zero, and
        # trilinear resampling of raw rgb blends surface color toward
        # black at every occupancy boundary (fox: thin shells + 68%
        # masked voxels ⇒ global darkening, measured 11 dB agreement).
        # Storing [σr, σg, σb, σ] makes empty voxels zero-WEIGHT instead
        # of zero-color: the sweep divides after interpolation.
        out = [rgb * sigma_eff[:, None], sigma_eff[:, None]]
        if feat_proj is not None:
            mu, sd, Pm = (jnp.asarray(a, jnp.float32) for a in feat_proj)
            f = (d_out.astype(jnp.float32) - mu) / sd @ Pm
            out.append(f * sigma_eff[:, None])
        return jnp.concatenate(out, -1)

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


@functools.partial(jax.jit, static_argnames=("n", "B", "L"))
def sweep_octave(
    vol_t,      # (n, n, n, 4) bf16, axis 0 = sweep axis (permuted)
    e_p,        # (3,) eye, permuted coords
    sign,       # f32 ±1: sweep direction along axis 0
    lo_p,       # (3,) cascade extent lower corner, permuted
    hi_p,       # (3,)
    k_first,    # i32 physical slab index of the octave's NEAREST slab
    z_base,     # f32 baseplane plane coordinate (axis 0)
    bp_lo,      # (2,) baseplane window lower (u, v)
    bp_hi,      # (2,)
    inner_lo_p,  # (3,) next-inner cascade box (±inf when innermost)
    inner_hi_p,
    *,
    n: int,
    B: int,
    L: int,
):
    """Sweep L consecutive slabs (one depth OCTAVE) front-to-back;
    returns (front, back) layers, each (B, B, LAYER_CH):
    [premult rgb, T, sum w*t].

    Octaves bound the epipolar resampling ratio: with the baseplane at
    the octave's far face, s_k = (z_k − eye)/(z_base − eye) stays in
    [~0.5, 1], so every slab is sampled at or above its native density
    regardless of where the eye sits (a single per-cascade baseplane
    collapses either the near or the far content when the eye is
    inside the volume — fox's cameras are)."""
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
    sgn_i = jnp.where(sign > 0, 1, -1).astype(jnp.int32)

    CV = vol_t.shape[-1]          # 4 (+F deferred-shading features)
    nv = CV - 1                   # non-σ value channels per voxel

    def body(carry, j):
        val_f, T_f, dw_f, val_b, T_b, dw_b = carry
        ksl_raw = k_first + sgn_i * j
        valid_k = (ksl_raw >= 0) & (ksl_raw < n)
        ksl = jnp.clip(ksl_raw, 0, n - 1)
        z_k = lo_p[0] + (ksl.astype(f32) + 0.5) * dz
        ahead = ((z_k - e_p[0]) * sign > 0.49 * dz) & valid_k
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
        # volumes store σ-premultiplied rgb (and features): divide the
        # interpolated [σr,σg,σb,σf…] by interpolated σ so empty
        # (all-zero) voxels are zero-weight, not black. Border coverage
        # (interp rows sum <1) cancels in the ratio and survives in σ ⇒
        # opacity fades at the window edge while color stays true.
        # rgb clamps at 0; features are signed and stay unclamped.
        inv_s = 1.0 / jnp.maximum(sigma, 1e-8)[..., None]
        col = jnp.maximum(slab[..., :3], 0.0) * inv_s
        vals = (col if CV == 4 else
                jnp.concatenate([col, slab[..., 4:] * inv_s], -1))
        t_k = (z_k - e_p[0]) * sign * q   # euclidean distance from eye
        alpha = 1.0 - jnp.exp(-sigma * dz * q)
        alpha = jnp.where(ahead, alpha, 0.0)
        mf = t_k < t_inner
        a_f = jnp.where(mf, alpha, 0.0)
        a_b = jnp.where(mf, 0.0, alpha)
        w_f = T_f * a_f
        w_b = T_b * a_b
        val_f = val_f + w_f[..., None] * vals
        dw_f = dw_f + w_f * t_k
        T_f = T_f * (1.0 - a_f)
        val_b = val_b + w_b[..., None] * vals
        dw_b = dw_b + w_b * t_k
        T_b = T_b * (1.0 - a_b)
        return (val_f, T_f, dw_f, val_b, T_b, dw_b), None

    z = jnp.zeros((B, B))
    init = (jnp.zeros((B, B, nv)), jnp.ones((B, B)), z,
            jnp.zeros((B, B, nv)), jnp.ones((B, B)), z)
    (val_f, T_f, dw_f, val_b, T_b, dw_b), _ = jax.lax.scan(
        body, init, jnp.arange(L))
    # layer layout [rgb, T, weighted depth, features…] — rgb/T/depth
    # keep their indices regardless of F
    front = jnp.concatenate([val_f[..., :3], T_f[..., None],
                             dw_f[..., None], val_f[..., 3:]], -1)
    back = jnp.concatenate([val_b[..., :3], T_b[..., None],
                            dw_b[..., None], val_b[..., 3:]], -1)
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
    empty = jnp.zeros((layer.shape[-1],), f32).at[3].set(1.0)
    delta = layer - empty
    out = jnp.einsum("vn,unc->uvc", Wv,
                     jnp.einsum("un,nvc->uvc", Wu, delta))
    return out + empty


def composite_layers(a, b):
    """Front-to-back composite of two (…, C) layers: a over b.
    Channel 3 is transmittance (multiplicative); every other channel
    (rgb, weighted depth, deferred-shading features) accumulates
    additively weighted by the front layer's T."""
    Ta = a[..., 3:4]
    return jnp.concatenate(
        [a[..., :3] + Ta * b[..., :3],
         Ta * b[..., 3:4],
         a[..., 4:] + Ta * b[..., 4:]], -1)


# ---------------------------------------------------------------------------
# quad packing + screen warp


@jax.jit
def quad_pack(layers):
    """(..., B, B, C) → (prod(...)·B·B, 4·C) bf16 rows where row
    (i*B+j) of each layer holds the 2x2 neighborhood
    [(i,j),(i,j+1),(i+1,j),(i+1,j+1)] — a full bilinear footprint in
    ONE ≤64 B gather. Edge clamping is PER LAYER (a stacked-image
    formulation bled across layer boundaries)."""
    r0 = layers
    r1 = jnp.concatenate([layers[..., :, 1:, :], layers[..., :, -1:, :]],
                         -2)
    r2 = jnp.concatenate([layers[..., 1:, :, :], layers[..., -1:, :, :]],
                         -3)
    r3 = jnp.concatenate([r2[..., :, 1:, :], r2[..., :, -1:, :]], -2)
    packed = jnp.concatenate([r0, r1, r2, r3], -1)
    return packed.reshape(-1, packed.shape[-1]).astype(jnp.bfloat16)


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


def _clip_halfplane(poly, c):
    """Sutherland–Hodgman single-edge clip: keep the region
    c[0]·x + c[1]·y + c[2] >= 0 of a convex polygon [(x, y), ...]."""
    out = []
    n = len(poly)
    for i in range(n):
        P, Q = poly[i], poly[(i + 1) % n]
        fp = c[0] * P[0] + c[1] * P[1] + c[2]
        fq = c[0] * Q[0] + c[1] * Q[1] + c[2]
        if fp >= 0:
            out.append(P)
        if (fp < 0) != (fq < 0):
            t = fp / (fp - fq)
            out.append((P[0] + t * (Q[0] - P[0]), P[1] + t * (Q[1] - P[1])))
    return out


def plan_groups_host(xform, wh, fl, pp):
    """EXACT per-group (du, dv) extremes for an undistorted PERSPECTIVE
    camera, computed on host — replaces the _group_stats device
    reduction, whose ~100-byte fetch is still a full host↔device SYNC
    before any sweep can dispatch (measured 0.16 s of a 0.45 s 1080p
    frame through the tunneled device).

    Math: the unnormalized world direction is AFFINE in pixel uv
    (p = M·[uvx, uvy, 1]); a dominant-axis group's membership region
    {s·p_a >= |p_u|, s·p_a >= |p_v|} ∩ image rect is an intersection of
    half-planes — a convex polygon — and du = p_u/p_a, dv = p_v/p_a are
    linear-fractional, hence quasilinear where p_a keeps one sign, so
    their extremes sit on polygon VERTICES.  Group boundaries are kept
    inclusive on both sides, so each window is a (zero-measure)
    superset of the pixel argmax assignment — never smaller.

    Returns (groups list, duv_lo (6,2) f32, duv_hi (6,2) f32)."""
    Rm = np.asarray(xform, np.float64)[:, :3]
    W, H = float(wh[0]), float(wh[1])
    fx, fy = float(fl[0]), float(fl[1])
    cx, cy = float(pp[0]), float(pp[1])
    M = Rm @ np.array([[W / fx, 0.0, -cx * W / fx],
                       [0.0, H / fy, -cy * H / fy],
                       [0.0, 0.0, 1.0]])
    x0, x1 = 0.5 / W, 1.0 - 0.5 / W
    y0, y1 = 0.5 / H, 1.0 - 0.5 / H
    rect = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    big = 1e9
    duv_lo = np.full((6, 2), big, np.float32)
    duv_hi = np.full((6, 2), -big, np.float32)
    groups = []
    for g in range(6):
        a = g // 2
        s = 1.0 if g % 2 == 0 else -1.0
        pa, pu, pv = s * M[a], M[(a + 1) % 3], M[(a + 2) % 3]
        poly = rect
        for c in (pa - pu, pa + pu, pa - pv, pa + pv):
            poly = _clip_halfplane(poly, c)
            if len(poly) < 3:
                break
        if len(poly) < 3:
            continue
        V = np.array([[x, y, 1.0] for x, y in poly])
        den = V @ pa
        if np.any(den <= 1e-12):
            # p_a -> 0 on the region only if the direction itself
            # degenerates; treat as absent rather than divide
            if np.all(den <= 1e-12):
                continue
            den = np.maximum(den, 1e-12)
        du = (V @ pu) / den * s   # d_u / d_a with SIGNED d_a
        dv = (V @ pv) / den * s
        duv_lo[g] = [du.min(), dv.min()]
        duv_hi[g] = [du.max(), dv.max()]
        groups.append(g)
    return groups, duv_lo, duv_hi


@jax.jit
def _group_stats(dirs):
    """Per-group planning summary computed ON DEVICE: (counts, lo, hi)
    with lo/hi the (du, dv) = (d_u/d_a, d_v/d_a) extremes per dominant
    axis-and-sign group.  The host fetches ~100 bytes instead of the
    full (N,3) direction array (24 MB at 1080p through the tunnel)."""
    ax = jnp.argmax(jnp.abs(dirs), axis=-1)
    d_a = jnp.take_along_axis(dirs, ax[:, None], -1)[:, 0]
    g = ax * 2 + (d_a < 0)
    du = jnp.take_along_axis(dirs, ((ax + 1) % 3)[:, None], -1)[:, 0] / d_a
    dv = jnp.take_along_axis(dirs, ((ax + 2) % 3)[:, None], -1)[:, 0] / d_a
    onehot = jax.nn.one_hot(g, 6, dtype=jnp.bool_)          # (N, 6)
    counts = onehot.sum(0)
    duv = jnp.stack([du, dv], -1)                            # (N, 2)
    big = jnp.float32(1e9)
    sel = onehot[..., None]                                  # (N, 6, 1)
    lo = jnp.min(jnp.where(sel, duv[:, None, :], big), axis=0)
    hi = jnp.max(jnp.where(sel, duv[:, None, :], -big), axis=0)
    return counts, lo, hi


def _warp_sharded(mesh, dirs, *args, **static):
    """Pixel-sharded final warp: dirs split along the mesh's data axis,
    packed layers + tables replicated (they are model state, like
    params). This is the multi-chip slab fan-out — the sweeps are
    bake-rate work (replicated or per-group), the per-pixel warp is the
    per-frame work that scales with devices. Reference analog: the
    multi-GPU render fan-out (testbed.cu render-to-screen dispatch)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    local = functools.partial(_warp_composite, **static)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis),) + (P(),) * len(args),
        out_specs=P(axis), check_vma=False)(dirs, *args)


@functools.partial(jax.jit,
                   static_argnames=("B0", "Bo", "n_groups", "nc"))
def _warp_composite(dirs, eye, outer_pk, l_pk, zb_tab, win_lo_tab,
                    win_hi_tab, bg, *, B0: int, Bo: int, n_groups: int,
                    nc: int):
    """Per-pixel screen warp + (2·nc−1)-layer composite.

    dirs: (N,3) unit ray directions (scene space); eye: (3,).
    outer_pk: (n_groups·(2nc−2)·Bo·Bo, 4·LAYER_CH) quad-packed outer
    layers ordered [F_{nc−1} … F_1, B_1 … B_{nc−1}] per group;
    l_pk: (n_groups·B0·B0, …) innermost layer.
    zb_tab: (n_groups, 2nc−1) baseplane plane-coord per layer in
    composite order [F_{nc−1} … F_1, L0, B_1 … B_{nc−1}];
    win_*_tab: (n_groups, 2nc−1, 2) matching baseplane windows.
    Returns (N, LAYER_CH) composited [premult rgb, T, depth].
    """
    # dominant axis + permuted components via pure SELECTS — a
    # take_along_axis here is a per-pixel gather, and ~10 of them cost
    # more gather rows than the layer sample itself (the warp is the
    # frame's serial wall; decomp measured 0.18 s of a 0.45 s frame)
    d0, d1, d2 = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    a0, a1, a2 = jnp.abs(d0), jnp.abs(d1), jnp.abs(d2)
    is0 = (a0 >= a1) & (a0 >= a2)          # argmax first-wins ties
    is1 = (~is0) & (a1 >= a2)
    sel = lambda x, y, z: jnp.where(is0, x, jnp.where(is1, y, z))  # noqa: E731
    d_a = sel(d0, d1, d2)
    du = sel(d1, d2, d0)
    dv = sel(d2, d0, d1)
    e_a = sel(eye[0], eye[1], eye[2])
    e_u = sel(eye[1], eye[2], eye[0])
    e_v = sel(eye[2], eye[0], eye[1])
    g = (jnp.where(is0, 0, jnp.where(is1, 2, 4))
         + (d_a < 0)).astype(jnp.int32)    # (N,) group id

    def table(tab):
        """(6,)-table lookup per pixel as 6 selects (no gather)."""
        out = jnp.broadcast_to(tab[0], g.shape)
        for k in range(1, 6):
            out = jnp.where(g == k, tab[k], out)
        return out

    n_layers = 2 * nc - 1
    mid = nc - 1  # composite-order index of the innermost layer
    C = l_pk.shape[-1] // 4  # layer channels (LAYER_CH + features)

    def layer_uv(li, B):
        zb = table(zb_tab[:, li])
        lo = jnp.stack([table(win_lo_tab[:, li, 0]),
                        table(win_lo_tab[:, li, 1])], -1)   # (N, 2)
        hi = jnp.stack([table(win_hi_tab[:, li, 0]),
                        table(win_hi_tab[:, li, 1])], -1)
        s = (zb - e_a) / d_a
        u = e_u + du * s
        v = e_v + dv * s
        ui = (u - lo[:, 0]) / (hi[:, 0] - lo[:, 0]) * B - 0.5
        vi = (v - lo[:, 1]) / (hi[:, 1] - lo[:, 1]) * B - 0.5
        return ui, vi

    def sample_stack(pk, li, row_base, B):
        ui, vi = layer_uv(li, B)
        i0 = jnp.clip(jnp.floor(ui).astype(jnp.int32), 0, B - 1)
        j0 = jnp.clip(jnp.floor(vi).astype(jnp.int32), 0, B - 1)
        fu = jnp.clip(ui - i0.astype(jnp.float32), 0.0, 1.0)
        fv = jnp.clip(vi - j0.astype(jnp.float32), 0.0, 1.0)
        rows = jnp.take(pk, row_base + i0 * B + j0,
                        axis=0).astype(jnp.float32)
        r = rows.reshape(-1, 2, 2, C)
        out = ((1 - fu) * (1 - fv))[:, None] * r[:, 0, 0] \
            + ((1 - fu) * fv)[:, None] * r[:, 0, 1] \
            + (fu * (1 - fv))[:, None] * r[:, 1, 0] \
            + (fu * fv)[:, None] * r[:, 1, 1]
        inside = ((ui >= -0.5) & (ui <= B - 0.5) & (vi >= -0.5)
                  & (vi <= B - 0.5))
        empty = jnp.zeros((C,), jnp.float32).at[3].set(1.0)
        return jnp.where(inside[:, None], out, empty)

    out = None
    for li in range(n_layers):
        if li == mid:
            lay = sample_stack(l_pk, li, g * (B0 * B0), B0)
        else:
            oi = li if li < mid else li - 1  # outer-stack slot
            lay = sample_stack(
                outer_pk, li, (g * (n_layers - 1) + oi) * (Bo * Bo), Bo)
        out = lay if out is None else composite_layers(out, lay)
    rgb = out[..., :3] + out[..., 3:4] * bg[:3] * bg[3]
    alpha = 1.0 - out[..., 3] * (1.0 - bg[3])
    if C > LAYER_CH:
        # deferred-shading mode: expose the pre-background transmittance
        # and the composited feature channels for the per-pixel decode →
        # [rgb, alpha, depth, T, feat…]
        return jnp.concatenate([rgb, alpha[:, None], out[..., 4:5],
                                out[..., 3:4], out[..., 5:]], -1)
    return jnp.concatenate([rgb, alpha[:, None], out[..., 4:5]], -1)


def make_deferred_decode(model, rgb_activation):
    """Per-PIXEL deferred view-dependent shading (the SNeRG split,
    recast post-hoc — no retraining, no per-camera rebake).

    The warp's feature-mode output is [rgb, alpha, depth, T, feat(F)]
    where feat is the alpha-composited PCA-projected density-MLP
    feature. Reconstruct the 16-dim feature through the stored PCA
    basis, run the EXACT rgb MLP twice — at the pixel's true view
    direction and at the bake's fixed direction — and add the
    opacity-weighted difference to the baked diffuse color. One dense
    (N,·)x(·,64) matmul pair per frame: MXU work, no gathers.

    Exactness regime: a ray dominated by one surface with locally
    constant features (SNeRG's assumption); mixing error is bounded by
    the rgb head's Lipschitz constant over the feature simplex."""

    @jax.jit
    def decode(out, dirs, rgb_params, dir_params, mu, sd, Pm, d0):
        W = 1.0 - out[:, 5]                       # content opacity Σw
        fbar = out[:, 6:] / jnp.maximum(W, 1e-6)[:, None]
        recon = fbar @ Pm.T * sd + mu             # (N, 16)
        de_v = model.dir_encoding(dir_params, warp_direction(dirs))
        de_0 = model.dir_encoding(
            dir_params, warp_direction(jnp.broadcast_to(d0, dirs.shape)))

        def head(de):
            inputs = [recon.astype(jnp.bfloat16), de]
            if model.n_extra_dims > 0:
                inputs.append(jnp.zeros(
                    (recon.shape[0], model.n_extra_dims), jnp.bfloat16))
            logits = model.rgb_network(rgb_params,
                                       jnp.concatenate(inputs, -1))
            return network_to_rgb(logits[:, :3].astype(jnp.float32),
                                  rgb_activation)

        spec = head(de_v) - head(de_0)
        rgb = out[:, :3] + W[:, None] * spec
        return jnp.concatenate([rgb, out[:, 3:5]], -1)

    return decode


def static_ladder(n: int) -> tuple:
    """Octave lengths (8, 8, 16, 32, …) until they cover n slabs —
    eye-INDEPENDENT, so a fused sweep compiled for this ladder serves
    every camera (out-of-range slabs are masked inside the kernel)."""
    out, c, length = [], 0, 8
    while c < n:
        out.append(length)
        c += length
        if len(out) >= 2:
            length *= 2
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("specs", "B0", "Bo"))
def sweep_group_merged(
    vols_t,      # tuple of nc (n_m,n_m,n_m,4) bf16, axis 0 = sweep axis
    e_p,         # (3,) eye, permuted coords
    sign,        # f32 ±1
    boxes_p,     # (nc, 2, 3) f32 level boxes, permuted coords
    k0s,         # (nc,) i32 index of first slab ahead of the eye
    duv_lo,      # (2,) group (du, dv) extremes
    duv_hi,      # (2,)
    *,
    specs: tuple,   # ((n_m, ladder_m), ...) — static per volume config
    B0: int,
    Bo: int,
):
    """ONE dispatch per (frame, group): sweeps every level's full
    static octave ladder, merges octaves far→near per level, folds the
    per-level F/B layers onto the innermost baseplane, and returns
    (layer (B0,B0,LAYER_CH), z0, wlo0 (2,), whi0 (2,)).

    The multi-dispatch orchestration (~130 dispatches/frame) was
    latency-bound through the tunneled device (measured 29.5 s/frame at
    1080p); every per-octave quantity here is a traced SCALAR, so one
    compiled program serves all cameras."""
    f32 = jnp.float32
    nc = len(specs)
    inf3 = jnp.full((3,), jnp.inf, f32)

    def footprint(z_b, dz):
        s = z_b - e_p[0]
        us = jnp.stack([duv_lo[0] * s, duv_hi[0] * s])
        vs = jnp.stack([duv_lo[1] * s, duv_hi[1] * s])
        pad = 2 * dz
        wlo = jnp.stack([e_p[1] + jnp.min(us) - pad,
                         e_p[2] + jnp.min(vs) - pad])
        whi = jnp.stack([e_p[1] + jnp.max(us) + pad,
                         e_p[2] + jnp.max(vs) + pad])
        return wlo, jnp.maximum(whi, wlo + 1e-4)

    per_level = []
    for m, (n, ladder) in enumerate(specs):
        blo_p, bhi_p = boxes_p[m, 0], boxes_p[m, 1]
        dz = (bhi_p[0] - blo_p[0]) / n
        ilo = boxes_p[m - 1, 0] if m > 0 else inf3
        ihi = boxes_p[m - 1, 1] if m > 0 else inf3
        B = B0 if m == 0 else Bo
        sgn_i = jnp.where(sign > 0, 1, -1).astype(jnp.int32)
        merged = None  # (front, back, z_b, wlo, whi), far→near fold
        off = 0
        plans = []
        for L in ladder:
            k_first = k0s[m] + sgn_i * off
            k_last = off + L - 1
            z_base = jnp.where(
                sign > 0,
                blo_p[0] + (k0s[m].astype(f32) + k_last + 1) * dz,
                blo_p[0] + (k0s[m].astype(f32) - k_last) * dz)
            plans.append((k_first, L, z_base))
            off += L
        for k_first, L, z_b in reversed(plans):
            wlo, whi = footprint(z_b, dz)
            front, back = sweep_octave(
                vols_t[m], e_p, sign, blo_p, bhi_p, k_first, z_b,
                wlo, whi, ilo, ihi, n=n, B=B, L=L)
            if merged is None:
                merged = (front, back, z_b, wlo, whi)
                continue
            mf, mb, z_far, lo_far, hi_far = merged
            args = (e_p, z_far, lo_far, hi_far, z_b, wlo, whi)
            mf = resample_layer(mf, *args, B_out=B)
            mb = resample_layer(mb, *args, B_out=B)
            merged = (composite_layers(front, mf),
                      composite_layers(back, mb), z_b, wlo, whi)
        per_level.append(merged)

    f0, b0, z0, wlo0, whi0 = per_level[0]
    layer = composite_layers(f0, b0)
    for m in range(1, nc):
        fm, bm, zm, wlom, whim = per_level[m]
        args = (e_p, zm, wlom, whim, z0, wlo0, whi0)
        fm = resample_layer(fm, *args, B_out=B0)
        bm = resample_layer(bm, *args, B_out=B0)
        layer = composite_layers(fm, composite_layers(layer, bm))
    return layer, z0, wlo0, whi0


def _plan_octaves(e_p0, n, lo, hi, sign):
    """Partition one (group, cascade) sweep into depth OCTAVES (host
    planning, all floats local).

    Octave boundaries are measured in slabs-ahead-of-the-eye: offsets
    [0,8), [8,16), [16,32), [32,64), … from the first slab ahead.
    Within each octave the eye-distance ratio is ≤ 2 (≤ ∞ only for the
    merged first bucket, whose content is voxel-blurred anyway at that
    proximity), so a per-octave baseplane at the octave's far edge
    keeps the epipolar resampling scale in [~0.5, 1]. Static lengths →
    one compiled sweep per (n, B, L).

    Returns a list of (k_first, L, z_base) with k_first the physical
    index of the octave's nearest slab."""
    dz = (hi - lo) / n
    if sign > 0:
        k0 = max(int(np.ceil((e_p0 + 0.49 * dz - lo) / dz - 0.5)), 0)
        m_ahead = n - k0
    else:
        k0 = min(int(np.floor((e_p0 - 0.49 * dz - lo) / dz - 0.5)), n - 1)
        m_ahead = k0 + 1
    if m_ahead <= 0:
        return []
    out = []
    c = 0
    length = 8
    while c < m_ahead:
        L = min(length, max(m_ahead - c, 1))
        # static lengths only: round the tail octave UP to its pow2
        # size; out-of-range slabs are masked inside the kernel
        L_static = length
        k_first = k0 + (c if sign > 0 else -c)
        k_last_off = c + L - 1
        if sign > 0:
            z_base = lo + (k0 + k_last_off + 1) * dz  # far edge
        else:
            z_base = lo + (k0 - k_last_off) * dz
        out.append((k_first, L_static, float(z_base)))
        c += L
        if len(out) >= 2:
            length *= 2
    return out


def _host_k0(e0: float, n: int, lo: float, hi: float, sign: float) -> int:
    """First slab index at-or-ahead of the eye along the sweep axis
    (host mirror of the kernel's masking conventions)."""
    dz = (hi - lo) / n
    if sign > 0:
        k0 = int(np.ceil((e0 + 0.49 * dz - lo) / dz - 0.5))
        return int(np.clip(max(k0, 0), -1, n))
    k0 = int(np.floor((e0 - 0.49 * dz - lo) / dz - 0.5))
    return int(np.clip(min(k0, n - 1), -1, n))


def _render_fused(dvols, eye, dirs_d, groups, duv_lo, duv_hi, vol_t,
                  background, B0, Bo, mesh=None):
    """Fused-path frame: ONE sweep_group_merged dispatch per present
    group + one warp. All per-octave planning is either static (the
    ladder) or traced scalars, so every camera shares the compiled
    programs."""
    nc = dvols.n_cascades
    specs = tuple((dvols.res[m], static_ladder(dvols.res[m]))
                  for m in range(nc))
    zb_tab = np.zeros((6, 1), np.float32)
    win_lo_tab = np.ones((6, 1, 2), np.float32)
    win_hi_tab = np.full((6, 1, 2), 2.0, np.float32)  # degenerate
    empty = None
    layers = {}
    for g in groups:
        g = int(g)
        a, sgn = g // 2, (-1.0 if g % 2 else 1.0)
        perm = _PERMS[a]
        e_p = eye[list(perm)]
        boxes_p = np.zeros((nc, 2, 3), np.float32)
        k0s = np.zeros(nc, np.int32)
        for m in range(nc):
            blo, bhi = dvols.box(m)
            boxes_p[m, 0] = blo[list(perm)]
            boxes_p[m, 1] = bhi[list(perm)]
            k0s[m] = _host_k0(float(e_p[0]), dvols.res[m],
                              float(boxes_p[m, 0, 0]),
                              float(boxes_p[m, 1, 0]), sgn)
        dlo, dhi = duv_lo[g], duv_hi[g]
        layer, _, _, _ = sweep_group_merged(
            tuple(vol_t[a]), jnp.asarray(e_p), jnp.float32(sgn),
            jnp.asarray(boxes_p), jnp.asarray(k0s), jnp.asarray(dlo),
            jnp.asarray(dhi), specs=specs, B0=B0, Bo=Bo)
        layers[g] = layer
        # host mirror of the level-0 first-octave baseplane + window
        n0 = dvols.res[0]
        lo0, hi0 = float(boxes_p[0, 0, 0]), float(boxes_p[0, 1, 0])
        dz0 = (hi0 - lo0) / n0
        L0 = specs[0][1][0]
        if sgn > 0:
            z0 = lo0 + (k0s[0] + L0) * dz0
        else:
            z0 = lo0 + (k0s[0] - (L0 - 1)) * dz0
        s = z0 - float(e_p[0])
        us = np.float32([dlo[0] * s, dhi[0] * s])
        vs = np.float32([dlo[1] * s, dhi[1] * s])
        pad = 2 * dz0
        wlo = np.float32([e_p[1] + us.min() - pad, e_p[2] + vs.min() - pad])
        whi = np.float32([e_p[1] + us.max() + pad, e_p[2] + vs.max() + pad])
        whi = np.maximum(whi, wlo + 1e-4)
        zb_tab[g, 0] = z0
        win_lo_tab[g, 0] = wlo
        win_hi_tab[g, 0] = whi
    if empty is None:
        Cl = dvols.layer_ch
        empty = jnp.broadcast_to(
            jnp.zeros((Cl,), jnp.float32).at[3].set(1.0), (B0, B0, Cl))
    l_dev = jnp.stack([layers.get(g, empty) for g in range(6)])
    l_pk = quad_pack(l_dev)
    outer_pk = jnp.zeros((1, 4 * dvols.layer_ch), jnp.bfloat16)
    warp = (_warp_composite if mesh is None
            else functools.partial(_warp_sharded, mesh))
    return warp(
        dirs_d, jnp.asarray(eye), outer_pk, l_pk, jnp.asarray(zb_tab),
        jnp.asarray(win_lo_tab), jnp.asarray(win_hi_tab),
        jnp.asarray(np.asarray(background, np.float32)),
        B0=B0, Bo=Bo, n_groups=6, nc=1)


def render_frame(
    dvols: DenseVolumes,
    eye,
    dirs,
    background=(0.0, 0.0, 0.0, 0.0),
    B0: int = 512,
    Bo: int = 256,
    merge_layers: bool = True,
    plan=None,
    mesh=None,
):
    """Render unit ray dirs (N,3) from `eye` through the dense volumes.
    Returns (N, 5) [premult rgb, alpha, depth] as a jax array.

    Orchestration: per (dominant-axis group, cascade), the volume is
    swept in depth octaves (bounded epipolar ratio — see
    _plan_octaves), the octave layers are merged far→near onto the
    nearest octave's baseplane (footprint→footprint epipolar maps, so
    angular resolution is preserved), and the final per-pixel warp
    composites the 2·nc−1 per-cascade-side layers
    F_{nc−1} … F_1, L0, B_1 … B_{nc−1} (exact depth order: inner
    regions of outer volumes are zeroed at bake)."""
    eye = np.asarray(eye, np.float32)
    dirs_d = dirs if isinstance(dirs, jax.Array) else jnp.asarray(
        np.asarray(dirs, np.float32))
    nc = dvols.n_cascades
    # merge_layers: all 2·nc−1 cascade layers are epipolar-merged onto
    # the innermost (finest, nearest) baseplane per group BEFORE the
    # warp — every merge is a footprint→footprint map over the same
    # ray bundle (exact in angle, one bilinear resample of blur), and
    # the per-pixel warp then costs ONE gather instead of 2·nc−1
    # (gathers are the frame's serial wall; see module docstring)
    n_layers = 1 if merge_layers else 2 * nc - 1
    mid = 0 if merge_layers else nc - 1

    if plan is not None:
        # host-computed exact perspective plan (plan_groups_host):
        # no device round-trip before the sweeps can dispatch
        groups, duv_lo, duv_hi = plan
    else:
        counts, duv_lo, duv_hi = (np.asarray(x)
                                  for x in _group_stats(dirs_d))
        groups = np.nonzero(counts > 0)[0]

    # device-side transposed volumes, cached on the bake (one transpose
    # per axis per BAKE, not per frame)
    if dvols.vt_cache is None:
        dvols.vt_cache = {}
    vol_t = dvols.vt_cache
    for g in groups:
        a = g // 2
        if a not in vol_t:
            perm = _PERMS[a]
            vol_t[a] = [jnp.transpose(dvols.volumes[m], perm + (3,))
                        for m in range(nc)]

    if merge_layers:
        return _render_fused(dvols, eye, dirs_d, groups, duv_lo, duv_hi,
                             vol_t, background, B0, Bo, mesh=mesh)

    zb_tab = np.zeros((6, n_layers), np.float32)
    win_lo_tab = np.ones((6, n_layers, 2), np.float32)
    win_hi_tab = np.full((6, n_layers, 2), 2.0, np.float32)  # degenerate
    Cl = dvols.layer_ch
    l_stack = np.zeros((6, B0, B0, Cl), np.float32)
    l_stack[..., 3] = 1.0
    l_dev = jnp.asarray(l_stack)
    outer_dev = None
    if nc > 1 and not merge_layers:
        o_stack = np.zeros((6, n_layers - 1, Bo, Bo, Cl), np.float32)
        o_stack[..., 3] = 1.0
        outer_dev = jnp.asarray(o_stack)

    inf3 = np.full(3, np.inf, np.float32)
    for g in groups:
        a, sgn = int(g // 2), (-1.0 if g % 2 else 1.0)
        perm = _PERMS[a]
        e_p = eye[list(perm)]
        e_d = jnp.asarray(e_p)
        dlo, dhi = duv_lo[g], duv_hi[g]  # (du, dv) extremes, this group

        def footprint(z_b, dz):
            """Group ray footprint on plane z_b (± a 2-voxel pad),
            from the device-reduced (du, dv) extremes: u on the plane
            is e_u + du·(z_b − e_a), monotone in du, so the group's
            extremes give the exact window."""
            s = z_b - e_p[0]
            us = np.float32([dlo[0] * s, dhi[0] * s])
            vs = np.float32([dlo[1] * s, dhi[1] * s])
            pad = 2 * dz
            wlo = np.float32([e_p[1] + us.min() - pad,
                              e_p[2] + vs.min() - pad])
            whi = np.float32([e_p[1] + us.max() + pad,
                              e_p[2] + vs.max() + pad])
            return wlo, np.maximum(whi, wlo + 1e-4)

        per_cascade = []  # (front, back, z_near, wlo, whi) MERGED
        for m in range(nc):
            n = dvols.res[m]
            box_lo, box_hi = dvols.box(m)
            blo_p = box_lo[list(perm)]
            bhi_p = box_hi[list(perm)]
            lo, hi = float(blo_p[0]), float(bhi_p[0])  # sweep-axis extent
            dz = (hi - lo) / n
            if m == 0:
                ilo, ihi = inf3, inf3  # miss → everything in front
            else:
                in_lo, in_hi = dvols.box(m - 1)
                ilo = in_lo[list(perm)]
                ihi = in_hi[list(perm)]
            B = B0 if m == 0 else Bo
            octs = _plan_octaves(float(e_p[0]), n, lo, hi, sgn)
            merged = None  # (front, back, z_b, wlo, whi), far→near fold
            for k_first, L, z_b in reversed(octs):
                wlo, whi = footprint(z_b, dz)
                front, back = sweep_octave(
                    vol_t[a][m], e_d, jnp.float32(sgn),
                    jnp.asarray(blo_p), jnp.asarray(bhi_p),
                    jnp.int32(k_first), jnp.float32(z_b),
                    jnp.asarray(wlo), jnp.asarray(whi),
                    jnp.asarray(ilo), jnp.asarray(ihi), n=n, B=B, L=L)
                if merged is None:
                    merged = (front, back, z_b, wlo, whi)
                    continue
                # resample the farther merged pair onto THIS octave's
                # (nearer) baseplane and composite behind it — the
                # footprint→footprint epipolar map is 1:1 in angle
                mf, mb, z_far, lo_far, hi_far = merged
                args = (e_d, jnp.float32(z_far), jnp.asarray(lo_far),
                        jnp.asarray(hi_far), jnp.float32(z_b),
                        jnp.asarray(wlo), jnp.asarray(whi))
                mf = resample_layer(mf, *args, B_out=B)
                mb = resample_layer(mb, *args, B_out=B)
                merged = (composite_layers(front, mf),
                          composite_layers(back, mb), z_b, wlo, whi)
            if merged is None:  # eye beyond the far face: no slabs
                z_fake = float(e_p[0] + sgn)
                wlo, whi = footprint(z_fake, dz)
                empty = jnp.broadcast_to(
                    jnp.zeros((Cl,)).at[3].set(1.0), (B, B, Cl))
                merged = (empty, empty, z_fake, wlo, whi)
            per_cascade.append(merged)

        # innermost: F and B are one layer (inner box at ∞ ⇒ all front)
        f0, b0, z0, wlo0, whi0 = per_cascade[0]
        l0 = composite_layers(f0, b0)
        if merge_layers:
            # fold every outer cascade onto the L0 baseplane (inner→
            # outer keeps composite order F_m ⊕ … ⊕ L0 ⊕ … ⊕ B_m by
            # associativity of the over operator)
            for m in range(1, nc):
                fm, bm, zm, wlom, whim = per_cascade[m]
                args = (e_d, jnp.float32(zm), jnp.asarray(wlom),
                        jnp.asarray(whim), jnp.float32(z0),
                        jnp.asarray(wlo0), jnp.asarray(whi0))
                fm = resample_layer(fm, *args, B_out=B0)
                bm = resample_layer(bm, *args, B_out=B0)
                l0 = composite_layers(fm, composite_layers(l0, bm))
            zb_tab[g, 0] = z0
            win_lo_tab[g, 0] = wlo0
            win_hi_tab[g, 0] = whi0
            l_dev = l_dev.at[g].set(l0)
            continue
        zb_tab[g, mid] = z0
        win_lo_tab[g, mid] = wlo0
        win_hi_tab[g, mid] = whi0
        l_dev = l_dev.at[g].set(l0)
        for m in range(1, nc):
            fm, bm, zm, wlom, whim = per_cascade[m]
            li_f = mid - m          # F_m composite slot
            li_b = mid + m          # B_m composite slot
            for li, lay in ((li_f, fm), (li_b, bm)):
                zb_tab[g, li] = zm
                win_lo_tab[g, li] = wlom
                win_hi_tab[g, li] = whim
                oi = li if li < mid else li - 1
                outer_dev = outer_dev.at[g, oi].set(lay)

    l_pk = quad_pack(l_dev)
    outer_pk = (quad_pack(outer_dev) if outer_dev is not None
                else jnp.zeros((1, 4 * dvols.layer_ch), jnp.bfloat16))
    warp = (_warp_composite if mesh is None
            else functools.partial(_warp_sharded, mesh))
    return warp(
        dirs_d, jnp.asarray(eye), outer_pk, l_pk,
        jnp.asarray(zb_tab), jnp.asarray(win_lo_tab),
        jnp.asarray(win_hi_tab), jnp.asarray(background, jnp.float32),
        B0=B0, Bo=Bo, n_groups=6, nc=1 if merge_layers else nc)
