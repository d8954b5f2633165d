"""Diagnose baked-vs-exact disagreement: cache resolutions, table-row
vs fresh-eval agreement, query() self-consistency at cell centers."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np


def main():
    import jax.numpy as jnp
    from instant_ngp_tpu.testbed import Testbed
    from instant_ngp_tpu.nerf import baked as B

    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    tb.load_snapshot("/tmp/fox_bakebench.ingp")
    task = tb.task
    ds = task.dataset
    v = 0
    xform = np.asarray(ds.xforms_start[v], np.float32)
    origin = xform[:, 3]
    cache = task._get_baked(origin=origin)
    out = {
        "res": np.asarray(cache.res).tolist(),
        "offsets": np.asarray(cache.offsets).tolist(),
        "n_rows": cache.n_rows,
        "aabb": [np.asarray(task.aabb_min).tolist(),
                 np.asarray(task.aabb_max).tolist()],
    }
    table = np.asarray(cache.table, np.float32).reshape(-1, 8, 4)
    sig = table[: cache.n_rows, :, 3]
    out["table_sigma_mean"] = round(float(sig.mean()), 3)
    out["table_sigma_p99"] = round(float(np.percentile(sig, 99)), 3)
    out["table_sigma_frac_gt5"] = round(float((sig > 5).mean()), 4)
    out["table_rgb_mean"] = round(float(table[: cache.n_rows, :, :3].mean()), 3)

    # check the index maps cell centers back to their own rows
    index = np.asarray(cache.index)
    res = np.asarray(cache.res)
    offs = np.asarray(cache.offsets)
    rng = np.random.default_rng(0)
    n0 = int(res[0])
    blk0 = index[offs[0] : offs[0] + n0 ** 3]
    occ_rows = np.nonzero(blk0 >= 0)[0]
    out["mip0_occupied_cells"] = len(occ_rows)
    pick = rng.choice(occ_rows, 4096, replace=False)
    i = pick // (n0 * n0)
    j = (pick // n0) % n0
    k = pick % n0
    # cell centers in scene space (mip 0: unit cube)
    p = np.stack([(i + 0.5) / n0, (j + 0.5) / n0, (k + 0.5) / n0], -1)
    q = np.asarray(B.query(cache, jnp.asarray(p, jnp.float32)))
    rows = blk0[pick]
    want = table[rows].mean(1)  # trilinear at center = corner mean
    err = np.abs(q - want)
    out["query_center_mae"] = round(float(err.mean()), 4)
    out["query_center_max"] = round(float(err.max()), 3)

    # fresh bake-eval on those same cells vs the stored table rows
    eval_fn = task._bake_eval
    if eval_fn is None:
        eval_fn = B.make_bake_eval(task.model, task.rgb_activation,
                                   task.density_activation)
    cells = np.stack([i, j, k], -1).astype(np.int32)
    mips = np.zeros(len(cells), np.int32)
    bricks = task._get_bricks(task.state.params)
    fresh = np.asarray(eval_fn(
        task.state.params, bricks, jnp.asarray(cells), jnp.asarray(mips),
        cache.res, (jnp.asarray(task.aabb_min), jnp.asarray(task.aabb_max)),
        jnp.asarray(origin, jnp.float32), True))
    stored = table[rows]
    d_sig = np.abs(fresh[..., 3] - stored[..., 3])
    d_rgb = np.abs(fresh[..., :3] - stored[..., :3])
    out["fresh_vs_stored_sigma_mae"] = round(float(d_sig.mean()), 3)
    out["fresh_vs_stored_rgb_mae"] = round(float(d_rgb.mean()), 4)
    out["fresh_sigma_mean"] = round(float(fresh[..., 3].mean()), 3)
    out["stored_sigma_mean"] = round(float(stored[..., 3].mean()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
