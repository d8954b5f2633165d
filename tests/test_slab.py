"""Slab-sweep renderer (nerf/slab.py): unit tests for the epipolar
resampling pieces and end-to-end agreement with a brute-force ray
marcher over the same dense voxel field."""
import jax.numpy as jnp
import numpy as np
import pytest

from instant_ngp_tpu.nerf import slab as S


def test_interp_matrix_partition_of_unity():
    idx = jnp.asarray(np.linspace(-2.0, 10.0, 97, dtype=np.float32))
    W = np.asarray(S._interp_matrix(idx, 8))
    sums = W.sum(1)
    inside = (np.asarray(idx) >= 0) & (np.asarray(idx) <= 7)
    assert np.allclose(sums[inside], 1.0, atol=1e-5)
    outside = (np.asarray(idx) < -1) | (np.asarray(idx) > 8)
    assert np.allclose(sums[outside], 0.0)


def test_quad_pack_bilinear_matches_direct():
    rng = np.random.default_rng(0)
    B = 16
    layer = jnp.asarray(rng.random((B, B, S.LAYER_CH), np.float32))
    pk = S.quad_pack(layer)
    ui = jnp.asarray(rng.uniform(0, B - 1.01, (64,)).astype(np.float32))
    vi = jnp.asarray(rng.uniform(0, B - 1.01, (64,)).astype(np.float32))
    got = np.asarray(S.sample_packed(pk, B, ui, vi))
    lf = np.asarray(layer, np.float32)
    i0 = np.floor(np.asarray(ui)).astype(int)
    j0 = np.floor(np.asarray(vi)).astype(int)
    fu = (np.asarray(ui) - i0)[:, None]
    fv = (np.asarray(vi) - j0)[:, None]
    want = ((1 - fu) * (1 - fv) * lf[i0, j0]
            + (1 - fu) * fv * lf[i0, j0 + 1]
            + fu * (1 - fv) * lf[i0 + 1, j0]
            + fu * fv * lf[i0 + 1, j0 + 1])
    # bf16 packing costs ~3 decimal digits
    assert np.allclose(got, want, atol=2e-2)


def test_resample_layer_identity_and_ramp():
    B = 32
    e_p = jnp.asarray(np.float32([-2.0, 0.5, 0.5]))
    # linear ramp layer on plane z=0.1, window [0,1]^2
    u = (np.arange(B) + 0.5) / B
    ramp = np.zeros((B, B, S.LAYER_CH), np.float32)
    ramp[..., 0] = u[:, None]
    ramp[..., 3] = 1.0 - 0.5 * u[None, :]
    lay = jnp.asarray(ramp)
    lo = jnp.asarray(np.float32([0.0, 0.0]))
    hi = jnp.asarray(np.float32([1.0, 1.0]))
    same = np.asarray(S.resample_layer(
        lay, e_p, jnp.float32(0.1), lo, hi, jnp.float32(0.1), lo, hi,
        B_out=B))
    assert np.allclose(same[2:-2, 2:-2], ramp[2:-2, 2:-2], atol=1e-4)

    # rescale to a farther plane: epipolar scale s = (0.1-e)/(0.5-e)
    z2 = 0.5
    out = np.asarray(S.resample_layer(
        lay, e_p, jnp.float32(0.1), lo, hi, jnp.float32(z2), lo, hi,
        B_out=B))
    s = (0.1 - (-2.0)) / (z2 - (-2.0))
    # sample a few interior points: dst (u,v) maps to src e + (u-e)*s
    for iu in (8, 16, 24):
        u_d = (iu + 0.5) / B
        u_s = 0.5 + (u_d - 0.5) * s
        want_r = u_s  # ramp value = u coordinate
        got = out[iu, 16, 0]
        assert abs(got - want_r) < 2e-2


def _brute_force(vols, eye, dirs, n_steps=3000):
    """Fine-step numpy ray marcher over the DenseVolumes field with
    nearest-cascade selection and trilinear interpolation."""
    eye = np.asarray(eye, np.float64)
    nc = vols.n_cascades
    grids = [np.asarray(v, np.float32).astype(np.float64)
             for v in vols.volumes]

    def field(p):
        # finest level containing p
        for m in range(nc):
            lo, hi = vols.box(m)
            if np.all(p >= lo) and np.all(p <= hi):
                n = vols.res[m]
                u = (p - lo) / (hi - lo) * n - 0.5
                i = np.clip(np.floor(u).astype(int), 0, n - 1)
                f = np.clip(u - i, 0, 1)
                i1 = np.minimum(i + 1, n - 1)
                g = grids[m]
                v = 0.0
                for dx, wx in ((i[0], 1 - f[0]), (i1[0], f[0])):
                    for dy, wy in ((i[1], 1 - f[1]), (i1[1], f[1])):
                        for dz, wz in ((i[2], 1 - f[2]), (i1[2], f[2])):
                            v = v + wx * wy * wz * g[dx, dy, dz]
                return v
        return np.zeros(4)

    out = []
    loM, hiM = vols.box(nc - 1)
    for d in np.asarray(dirs, np.float64):
        # clip to outer box
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        t0 = (loM - eye) * inv
        t1 = (hiM - eye) * inv
        tmin = max(np.minimum(t0, t1).max(), 0.0)
        tmax = np.maximum(t0, t1).min()
        if tmax <= tmin:
            out.append([0, 0, 0, 1, 0])
            continue
        ts = np.linspace(tmin, tmax, n_steps)
        dt = ts[1] - ts[0]
        T, rgb, dw = 1.0, np.zeros(3), 0.0
        for t in ts:
            v = field(eye + t * d)
            a = 1.0 - np.exp(-max(v[3], 0.0) * dt)
            # volumes store σ-premultiplied color: divide after interp
            col = np.maximum(v[:3], 0) / max(v[3], 1e-8)
            rgb = rgb + T * a * col
            dw = dw + T * a * t
            T = T * (1 - a)
            if T < 1e-4:
                break
        out.append([*rgb, T, dw])
    return np.asarray(out)


def _camera_dirs(eye, target, n=9, fov_deg=30.0):
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.float64([0, 0, 1]) if abs(fwd[2]) < 0.9 else np.float64([0, 1, 0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    half = np.tan(np.radians(fov_deg / 2))
    us = np.linspace(-half, half, n)
    dirs = []
    for a in us:
        for b in us:
            d = fwd + a * right + b * up
            dirs.append(d / np.linalg.norm(d))
    return np.asarray(dirs, np.float32)


def _smooth_blob(n, center, radius, sigma_max, color):
    """Smooth single-cascade density blob (smooth fields keep the
    slab-vs-brute-force comparison meaningful at modest resolution)."""
    c = (np.arange(n) + 0.5) / n
    X, Y, Z = np.meshgrid(c, c, c, indexing="ij")
    r2 = ((X - center[0]) ** 2 + (Y - center[1]) ** 2
          + (Z - center[2]) ** 2) / radius ** 2
    w = np.exp(-3.0 * r2)
    vol = np.zeros((n, n, n, 4), np.float32)
    vol[..., 3] = sigma_max * w
    for i in range(3):
        # σ-premultiplied color (the DenseVolumes convention)
        vol[..., i] = color[i] * vol[..., 3]
    return vol


def test_single_cascade_matches_brute_force():
    n = 32
    vol = _smooth_blob(n, (0.5, 0.5, 0.5), 0.3, 40.0, (0.8, 0.4, 0.2))
    dv = S.DenseVolumes(volumes=[jnp.asarray(vol, jnp.bfloat16)],
                        res=[n], n_cascades=1)
    eye = np.float32([0.5, 0.5, -1.5])
    dirs = _camera_dirs(eye, [0.5, 0.5, 0.5], n=7, fov_deg=25)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=64, Bo=32))
    ref = _brute_force(dv, eye, dirs)
    # got columns: [premult rgb, ALPHA, depth]; ref: [rgb, T, depth]
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.06
    assert np.abs(got[:, 3] - (1 - ref[:, 3])).max() < 0.06


def test_single_cascade_oblique_axis_groups():
    # eye placed so rays split across dominant axes
    n = 32
    vol = _smooth_blob(n, (0.55, 0.45, 0.5), 0.25, 30.0, (0.2, 0.7, 0.9))
    dv = S.DenseVolumes(volumes=[jnp.asarray(vol, jnp.bfloat16)],
                        res=[n], n_cascades=1)
    eye = np.float32([-0.9, -0.8, -0.7])
    dirs = _camera_dirs(eye, [0.5, 0.5, 0.5], n=7, fov_deg=40)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=64, Bo=32))
    ref = _brute_force(dv, eye, dirs)
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.08
    assert np.abs(got[:, 3] - (1 - ref[:, 3])).max() < 0.08


def test_nested_cascades_match_brute_force():
    n0, n1 = 32, 32
    vol0 = _smooth_blob(n0, (0.5, 0.5, 0.5), 0.3, 30.0, (0.9, 0.3, 0.1))
    # outer shell blob offset outside the unit cube
    vol1 = _smooth_blob(n1, (0.15, 0.5, 0.5), 0.2, 20.0, (0.1, 0.4, 0.8))
    # zero the inner region (bake_dense invariant)
    c = (np.arange(n1) + 0.5) / n1
    inner = (c > 0.25) & (c < 0.75)
    m = inner[:, None, None] & inner[None, :, None] & inner[None, None, :]
    vol1[m] = 0.0
    dv = S.DenseVolumes(
        volumes=[jnp.asarray(vol0, jnp.bfloat16),
                 jnp.asarray(vol1, jnp.bfloat16)],
        res=[n0, n1], n_cascades=2)
    eye = np.float32([0.5, 0.5, -1.2])  # inside cascade 1, outside 0
    dirs = _camera_dirs(eye, [0.4, 0.5, 0.5], n=7, fov_deg=45)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=64, Bo=64))
    ref = _brute_force(dv, eye, dirs)
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.09
    assert np.abs(got[:, 3] - (1 - ref[:, 3])).max() < 0.09


def test_task_integration_slab_render():
    import jax

    import __graft_entry__ as g
    from instant_ngp_tpu.nerf.task import NerfTask

    ds = g._synthetic_dataset()
    task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=256,
                    max_samples_per_ray=4, n_march_iters=8)
    task.train(1)
    task.slab_res0 = 32
    img = np.asarray(task.render(16, 16, np.asarray(ds.xforms_start[0]),
                                 render_quality="slab"))
    assert img.shape == (16, 16, 4)
    assert np.isfinite(img).all()


def test_eye_inside_outer_cascade_matches_brute_force():
    """The fox failure mode (round-4 agreement was 10 dB): the camera
    sits INSIDE the outer cascade. With the baseplane at the sweep's
    exit face the epipolar scale stays <= 1 and far content keeps its
    native sampling density."""
    n0, n1 = 32, 32
    vol0 = _smooth_blob(n0, (0.5, 0.5, 0.5), 0.25, 30.0, (0.9, 0.3, 0.1))
    # outer content far from center so it's visible from inside
    vol1 = _smooth_blob(n1, (0.85, 0.5, 0.5), 0.12, 25.0, (0.1, 0.4, 0.8))
    c = (np.arange(n1) + 0.5) / n1
    inner = (c > 0.25) & (c < 0.75)
    m = inner[:, None, None] & inner[None, :, None] & inner[None, None, :]
    vol1[m] = 0.0
    dv = S.DenseVolumes(
        volumes=[jnp.asarray(vol0, jnp.bfloat16),
                 jnp.asarray(vol1, jnp.bfloat16)],
        res=[n0, n1], n_cascades=2)
    # eye INSIDE cascade 1 ([-0.5, 1.5]^3) but outside cascade 0
    eye = np.float32([0.5, 0.45, -0.35])
    dirs = _camera_dirs(eye, [0.6, 0.5, 0.6], n=7, fov_deg=50)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=96, Bo=96))
    ref = _brute_force(dv, eye, dirs)
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.08
    assert np.abs(got[:, 3] - (1 - ref[:, 3])).max() < 0.08


def test_clipmap_boxes_nested_and_quantized():
    aabb_min, aabb_max = np.float32([-1.5] * 3), np.float32([2.5] * 3)
    eye = np.float32([-1.31, 0.18, 1.55])
    boxes = S.clipmap_boxes(eye, aabb_min, aabb_max, finest_extent=1.0)
    assert len(boxes) == 3
    assert np.allclose(boxes[2, 0], aabb_min)
    assert np.allclose(boxes[2, 1], aabb_max)
    for m in range(2):
        # strict nesting + correct size
        assert np.all(boxes[m, 0] >= boxes[m + 1, 0] - 1e-6)
        assert np.all(boxes[m, 1] <= boxes[m + 1, 1] + 1e-6)
        assert np.allclose(boxes[m, 1] - boxes[m, 0], 2.0 ** m)
        # snapped centers ⇒ small eye motion reuses the bake
        q = 2.0 ** m / 8.0
        c = (boxes[m, 0] + boxes[m, 1]) / 2
        assert np.allclose(c / q, np.round(c / q), atol=1e-4)
    b2 = S.clipmap_boxes(eye + 0.005, aabb_min, aabb_max,
                         finest_extent=1.0)
    assert np.allclose(boxes, b2)
    # default finest extent 0.25 ⇒ five levels for a 4-unit scene
    b5 = S.clipmap_boxes(eye, aabb_min, aabb_max)
    assert len(b5) == 5
    assert np.allclose(b5[0, 1] - b5[0, 0], 0.25)


def test_plan_groups_host_matches_device_stats():
    """The host polygon planner must produce, for every present group,
    a (du, dv) window that CONTAINS the device-reduced extremes of the
    actual pixel rays (it is exact over the continuous pixel rect, so
    it can only be equal-or-wider than any discrete sampling)."""
    rng = np.random.default_rng(7)
    W, H = 96, 64
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = np.stack([(xs.reshape(-1) + 0.5) / W,
                   (ys.reshape(-1) + 0.5) / H], -1).astype(np.float32)
    for trial in range(6):
        # random rotation + intrinsics (wide FOV to span many groups)
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        xform = np.concatenate([q, rng.normal(size=(3, 1))],
                               1).astype(np.float32)
        fl = (W / (1.2 + trial * 0.4), H / (1.0 + trial * 0.3))
        pp = (0.5 + 0.1 * rng.normal(), 0.5 + 0.1 * rng.normal())
        cx, cy = pp
        u = (uv[:, 0] - cx) * W / fl[0]
        v = (uv[:, 1] - cy) * H / fl[1]
        d = np.stack([u, v, np.ones_like(u)], -1) @ q.T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        counts, lo_d, hi_d = (np.asarray(x) for x in S._group_stats(
            jnp.asarray(d.astype(np.float32))))
        groups, lo_h, hi_h = S.plan_groups_host(xform, (W, H), fl, pp)
        for g in range(6):
            if counts[g] == 0:
                continue
            assert g in groups, f"trial {trial}: group {g} missed"
            assert np.all(lo_h[g] <= lo_d[g] + 1e-4), (trial, g)
            assert np.all(hi_h[g] >= hi_d[g] - 1e-4), (trial, g)
            # and not absurdly wider (exactness sanity): the host
            # window never exceeds the sampled one by more than the
            # spread a single pixel of boundary overlap can add
            spread = np.maximum(hi_d[g] - lo_d[g], 0.2)
            assert np.all(lo_h[g] >= lo_d[g] - 0.35 * spread - 0.15)
            assert np.all(hi_h[g] <= hi_d[g] + 0.35 * spread + 0.15)


def test_masked_neighbors_do_not_darken_color():
    """Regression for the round-4 fox mush (11 dB agreement): a thin
    WHITE shell whose neighbors are masked (all-zero) voxels must
    render white, not gray — σ-premultiplied color makes empty voxels
    zero-weight under trilinear resampling instead of blending black
    into every surface."""
    n = 32
    vol = np.zeros((n, n, n, 4), np.float32)
    # a 2-voxel-thick opaque white wall at z ≈ 0.5, floating in
    # masked/empty space (exactly the fox floor/fur regime)
    vol[:, :, 15:17, 3] = 200.0
    vol[:, :, 15:17, :3] = 200.0 * 1.0  # σ·rgb for rgb = white
    dv = S.DenseVolumes(volumes=[jnp.asarray(vol, jnp.bfloat16)],
                        res=[n], n_cascades=1)
    eye = np.float32([0.5, 0.5, -1.0])
    dirs = _camera_dirs(eye, [0.5, 0.5, 0.5], n=5, fov_deg=20)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=64, Bo=32))
    alpha = got[:, 3]
    assert alpha.min() > 0.95          # wall is opaque
    # unpremultiplied color must stay white (old convention: ~0.5 gray)
    rgb = got[:, :3] / np.maximum(alpha[:, None], 1e-6)
    assert rgb.min() > 0.9
    ref = _brute_force(dv, eye, dirs)
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.08


def test_deferred_view_dependence():
    """Deferred SNeRG-style decode (slab.make_deferred_decode): one
    diffuse+feature bake serves every camera; agreement with the exact
    render must be at least as good as the diffuse-only bake, and the
    machinery (PCA basis, feature channels, per-pixel decode) must be
    live end to end."""
    import __graft_entry__ as g
    from instant_ngp_tpu.nerf.task import NerfTask

    ds = g._synthetic_dataset()
    task = NerfTask(ds, g._tiny_nerf_config(), n_rays_per_batch=256,
                    max_samples_per_ray=4, n_march_iters=8)
    task.train(3)
    task.slab_res0 = 48
    xf = np.asarray(ds.xforms_start[0])
    exact = np.asarray(task.render(24, 24, xf))[..., :3]

    task.slab_deferred_vd = True
    img_def = np.asarray(task.render(24, 24, xf,
                                     render_quality="slab"))[..., :3]
    dvols = task._slab_cache[1]
    assert dvols.n_feat == 3 and dvols.feat_proj is not None
    # PCA columns orthonormal
    P = dvols.feat_proj[2]
    assert np.allclose(P.T @ P, np.eye(3), atol=1e-4)

    task.slab_deferred_vd = False
    task._slab_cache = None
    img_diff = np.asarray(task.render(24, 24, xf,
                                      render_quality="slab"))[..., :3]
    assert task._slab_cache[1].n_feat == 0

    mse_def = float(np.mean((img_def - exact) ** 2))
    mse_diff = float(np.mean((img_diff - exact) ** 2))
    assert np.isfinite(img_def).all()
    # never worse than diffuse (equal when the model happens to be
    # view-independent); strictly better on view-dependent content
    assert mse_def <= mse_diff * 1.02 + 1e-6, (mse_def, mse_diff)


def test_eye_centered_boxes_match_brute_force():
    """Clipmap levels (eye-centered, shifted boxes) agree with brute
    force — the round-4 fox fix: fine voxels follow the camera, not the
    scene center."""
    aabb_min, aabb_max = np.float32([-1.5] * 3), np.float32([2.5] * 3)
    eye = np.float32([-0.9, 0.6, 0.4])
    boxes = S.clipmap_boxes(eye, aabb_min, aabb_max, finest_extent=1.0)
    n = 32
    vols = []
    rng = np.random.default_rng(3)
    for m in range(3):
        lo, hi = boxes[m]
        v = _smooth_blob(n, (0.5, 0.5, 0.5), 0.3, 20.0 / 2.0 ** m,
                         (0.8 / (m + 1), 0.3 * (m + 1) / 3, 0.5))
        # blob coords above are in box-unit space already (box() maps)
        if m > 0:
            ilo, ihi = boxes[m - 1]
            c = [lo[a] + (np.arange(n) + 0.5) / n * (hi[a] - lo[a])
                 for a in range(3)]
            P = np.stack(np.meshgrid(*c, indexing="ij"), -1)
            inner = ((P > ilo) & (P < ihi)).all(-1)
            v[inner] = 0.0
        vols.append(jnp.asarray(v, jnp.bfloat16))
    dv = S.DenseVolumes(volumes=vols, res=[n] * 3, n_cascades=3,
                        boxes=boxes)
    dirs = _camera_dirs(eye, [0.2, 0.4, 0.5], n=7, fov_deg=55)
    got = np.asarray(S.render_frame(dv, eye, dirs, B0=96, Bo=96))
    ref = _brute_force(dv, eye, dirs)
    assert np.abs(got[:, :3] - ref[:, :3]).max() < 0.08
    assert np.abs(got[:, 3] - (1 - ref[:, 3])).max() < 0.08
