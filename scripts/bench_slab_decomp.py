"""Stage decomposition of one warm 1080p slab frame on TPU.

Loads the trained fox snapshot, bakes once, then times each stage of
render_frame separately (prep_rays, group stats fetch, per-group fused
sweep, quad_pack, warp) with a device fetch after each timed block —
independent dispatches without a data-chained fetch report fantasy
numbers on the tunneled TPU (see .claude/skills/verify).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np

SNAPS = ["/tmp/fox_r4.ingp", "/tmp/fox_conv_s18.ingp"]


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import math

    import jax
    import jax.numpy as jnp

    from instant_ngp_tpu.nerf import slab as S
    from instant_ngp_tpu.testbed import Testbed

    snap = next(s for s in SNAPS if Path(s).exists())
    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    tb.load_snapshot(snap)
    task = tb.task
    ds = task.dataset
    v = 0
    xform = np.asarray(ds.xforms_start[v], np.float32)
    eye = xform[:, 3]
    w, h = ds.resolution
    W, H = 1920, 1080
    fl = (ds.focal_lengths[v, 0] * W / w, ds.focal_lengths[v, 1] * H / h)

    out = {"snap": snap}
    log("bake...")
    t0 = time.time()
    dvols = task._get_slab(eye=eye)
    jax.block_until_ready(dvols.volumes[0])
    out["bake_s"] = round(time.time() - t0, 2)

    # rays
    n = W * H
    n_pad = max(1024, 1 << int(math.ceil(math.log2(n))))
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = np.stack([(xs.reshape(-1) + 0.5) / W,
                   (ys.reshape(-1) + 0.5) / H], -1).astype(np.float32)
    uv = np.pad(uv, ((0, n_pad - n), (0, 0)), constant_values=0.5)
    _, d, _, _ = task._jit_prep_rays(
        jnp.asarray(uv), jnp.asarray([W, H], jnp.float32),
        jnp.asarray(fl, jnp.float32),
        jnp.asarray(tuple(ds.principal_points[v]), jnp.float32),
        jnp.asarray(xform))
    jax.block_until_ready(d)

    B0, Bo = 1024, 512
    nc = dvols.n_cascades

    # warm the full frame once (compiles)
    log("warm full frame...")
    t0 = time.time()
    r = S.render_frame(dvols, eye, d, B0=B0, Bo=Bo)
    jax.block_until_ready(r)
    out["full_warm_s"] = round(time.time() - t0, 2)

    # full warm frame, timed
    for trial in range(3):
        t0 = time.time()
        r = S.render_frame(dvols, eye, d, B0=B0, Bo=Bo)
        jax.block_until_ready(r)
        out[f"full_{trial}_s"] = round(time.time() - t0, 3)

    # stage: group stats
    t0 = time.time()
    counts, duv_lo, duv_hi = (np.asarray(x) for x in S._group_stats(d))
    out["group_stats_s"] = round(time.time() - t0, 3)
    groups = np.nonzero(counts > 0)[0]
    out["n_groups"] = int(len(groups))
    out["counts"] = [int(c) for c in counts]

    vol_t = dvols.vt_cache
    specs = tuple((dvols.res[m], S.static_ladder(dvols.res[m]))
                  for m in range(nc))
    out["specs"] = [[int(s[0]), list(s[1])] for s in specs]

    # stage: each group's fused sweep (warm — render_frame compiled it)
    for g in groups:
        g = int(g)
        a, sgn = g // 2, (-1.0 if g % 2 else 1.0)
        perm = S._PERMS[a]
        e_p = eye[list(perm)]
        boxes_p = np.zeros((nc, 2, 3), np.float32)
        k0s = np.zeros(nc, np.int32)
        for m in range(nc):
            blo, bhi = dvols.box(m)
            boxes_p[m, 0] = blo[list(perm)]
            boxes_p[m, 1] = bhi[list(perm)]
            k0s[m] = S._host_k0(float(e_p[0]), dvols.res[m],
                                float(boxes_p[m, 0, 0]),
                                float(boxes_p[m, 1, 0]), sgn)
        args = (tuple(vol_t[a]), jnp.asarray(e_p), jnp.float32(sgn),
                jnp.asarray(boxes_p), jnp.asarray(k0s),
                jnp.asarray(duv_lo[g]), jnp.asarray(duv_hi[g]))
        layer, _, _, _ = S.sweep_group_merged(*args, specs=specs,
                                              B0=B0, Bo=Bo)
        jax.block_until_ready(layer)
        t0 = time.time()
        layer, _, _, _ = S.sweep_group_merged(*args, specs=specs,
                                              B0=B0, Bo=Bo)
        jax.block_until_ready(layer)
        out[f"sweep_g{g}_s"] = round(time.time() - t0, 3)

    # stage: warp alone — reuse the full frame path but time quad_pack +
    # warp with a fixed layer stack
    empty = jnp.broadcast_to(
        jnp.zeros((S.LAYER_CH,), jnp.float32).at[3].set(1.0),
        (B0, B0, S.LAYER_CH))
    l_dev = jnp.stack([empty] * 6)
    jax.block_until_ready(l_dev)
    pk = S.quad_pack(l_dev)
    jax.block_until_ready(pk)
    t0 = time.time()
    pk = S.quad_pack(l_dev)
    jax.block_until_ready(pk)
    out["quad_pack_s"] = round(time.time() - t0, 3)

    zb_tab = np.full((6, 1), 2.0, np.float32)
    win_lo = np.zeros((6, 1, 2), np.float32)
    win_hi = np.ones((6, 1, 2), np.float32)
    bg = jnp.asarray(np.float32([0, 0, 0, 0]))
    wargs = (d, jnp.asarray(eye), jnp.zeros((1, 4 * S.LAYER_CH),
                                            jnp.bfloat16),
             pk, jnp.asarray(zb_tab), jnp.asarray(win_lo),
             jnp.asarray(win_hi), bg)
    r = S._warp_composite(*wargs, B0=B0, Bo=Bo, n_groups=6, nc=1)
    jax.block_until_ready(r)
    t0 = time.time()
    r = S._warp_composite(*wargs, B0=B0, Bo=Bo, n_groups=6, nc=1)
    jax.block_until_ready(r)
    out["warp_s"] = round(time.time() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        tries = int(os.environ.get("SLAB_RETRIED", "0"))
        if "UNAVAILABLE" in str(e) and tries < 6:
            wait = min(60 * (tries + 1), 300)
            log(f"TPU unavailable — retry {tries + 1}/6 after {wait}s")
            time.sleep(wait)
            os.environ["SLAB_RETRIED"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
