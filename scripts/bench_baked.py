"""Baked-cache render benchmark on fox (TPU).

First run trains 512 steps and snapshots to /tmp/fox_bakebench.ingp;
later runs restore it, so render measurements iterate without paying
training again. Prints one JSON line with bake time and rays/s for
exact vs baked at 256² and 1080p.
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

SNAP = "/tmp/fox_bakebench.ingp"
STEPS = int(os.environ.get("BAKEBENCH_STEPS", 512))


def main():
    from instant_ngp_tpu.testbed import Testbed

    tb = Testbed("nerf")
    tb.load_training_data("/root/reference/data/nerf/fox")
    if Path(SNAP).exists():
        tb.load_snapshot(SNAP)
        print(f"# restored {SNAP} at step {tb.training_step}",
              file=sys.stderr, flush=True)
    else:
        tb.reload_network_from_file("configs/nerf/tpu.json")
        t0 = time.time()
        tb.task.train(STEPS)
        print(f"# trained {STEPS} steps in {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        tb.save_snapshot(SNAP, include_optimizer_state=False)

    task = tb.task
    ds = task.dataset
    w, h = ds.resolution
    v = 0
    xform = ds.xforms_start[v]
    out = {"step": task.training_step}

    def render(res_w, res_h, quality):
        fl = (ds.focal_lengths[v, 0] * res_w / w,
              ds.focal_lengths[v, 1] * res_h / h)
        kw = dict(focal_length=fl, principal_point=tuple(ds.principal_points[v]),
                  background=(0, 0, 0, 0), render_quality=quality)
        task.render(res_w, res_h, xform, **kw)  # warm compile + bake
        t0 = time.time()
        task.render(res_w, res_h, xform, **kw)
        dt = time.time() - t0
        return round(res_w * res_h / dt / 1e6, 4), round(dt, 3)

    out["exact_256"], out["exact_256_s"] = render(256, 256, "exact")
    # bake cost, measured separately with a warm eval program
    task._baked_cache = None
    task.bake(origin=np.asarray(xform)[:, 3])  # compile warm-up
    t0 = time.time()
    cache = task.bake(origin=np.asarray(xform)[:, 3])
    out["bake_s"] = round(time.time() - t0, 2)
    out["bake_rows"] = cache.n_rows
    out["baked_256"], out["baked_256_s"] = render(256, 256, "baked")
    out["baked_1080p"], out["baked_1080p_s"] = render(1920, 1080, "baked")
    out["exact_1080p"], out["exact_1080p_s"] = render(1920, 1080, "exact")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
