"""Isolate the slab-agreement failure: render cascade 0 ONLY (crop the
exact renderer to the unit cube, zero the outer slab volumes) and
compare. If cascade-0-only agreement is high, the sweep core is sound
and the loss comes from the multi-cascade window/merge scale problem."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np


def main():
    import jax.numpy as jnp

    from instant_ngp_tpu.io.image import save_image
    from instant_ngp_tpu.nerf import slab as S
    from instant_ngp_tpu.testbed import Testbed

    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    tb.load_snapshot("/tmp/fox_r4.ingp")
    task = tb.task
    ds = task.dataset
    out = {}

    v = 0
    xform = np.asarray(ds.xforms_start[v], np.float32)
    w, h = ds.resolution
    fl2 = (ds.focal_lengths[v, 0] * 256 / w,
           ds.focal_lengths[v, 1] * 256 / h)
    kw2 = dict(focal_length=fl2,
               principal_point=tuple(ds.principal_points[v]),
               background=(0, 0, 0, 0))

    # exact, cropped to cascade 0 (the unit cube)
    task.render_aabb_min = np.zeros(3, np.float32)
    task.render_aabb_max = np.ones(3, np.float32)
    t0 = time.time()
    img_e = np.asarray(task.render(256, 256, xform, **kw2))
    out["exact_crop_s"] = round(time.time() - t0, 2)

    # slab with outer cascades zeroed; view-dependent bake
    task.slab_bake_view_dependent = True
    dv = task._get_slab(origin=xform[:, 3])
    dv0 = S.DenseVolumes(
        volumes=[dv.volumes[0]] + [jnp.zeros_like(x) for x in dv.volumes[1:]],
        res=dv.res, n_cascades=dv.n_cascades)
    n = 256 * 256
    ys, xs = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    uv = np.stack([(xs.reshape(-1) + 0.5) / 256,
                   (ys.reshape(-1) + 0.5) / 256], -1).astype(np.float32)
    _, d, _, _ = task._jit_prep_rays(
        jnp.asarray(uv), jnp.asarray([256, 256], jnp.float32),
        jnp.asarray(fl2, jnp.float32),
        jnp.asarray(ds.principal_points[v], jnp.float32),
        jnp.asarray(xform))
    for B0 in (512, 1024):
        t0 = time.time()
        o5 = np.asarray(S.render_frame(dv0, xform[:, 3], np.asarray(d),
                                       B0=B0, Bo=B0 // 2))[:n]
        dt = time.time() - t0
        img_s = o5[:, :4].reshape(256, 256, 4)
        mse = float(np.mean((np.clip(img_e[..., :3], 0, 1)
                             - np.clip(img_s[..., :3], 0, 1)) ** 2))
        out[f"c0_psnr_B{B0}"] = round(-10 * np.log10(max(mse, 1e-10)), 2)
        out[f"c0_s_B{B0}"] = round(dt, 2)
        save_image(f"/tmp/slab_c0_B{B0}.png", np.clip(img_s, 0, 1))
    save_image("/tmp/exact_c0.png", np.clip(img_e, 0, 1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
