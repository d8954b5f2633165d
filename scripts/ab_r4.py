"""Round-4 fox A/B at equal TRAIN budget (default 240 s), one arm per
process:

    python scripts/ab_r4.py base       # round-3 flagship config
    python scripts/ab_r4.py s18        # valid-sample target 2^18
    python scripts/ab_r4.py s18decay   # s18 + late LR decay
    python scripts/ab_r4.py gi32       # grid update interval 16->32 @512

Eval uses render_batch (all views, one compacted pool). Training time
excludes eval, like bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import numpy as np

from instant_ngp_tpu.common import linear_to_srgb, srgb_to_linear
from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.io.nerf_loader import load_nerf
from instant_ngp_tpu.metrics import mse_to_psnr
from instant_ngp_tpu.nerf.task import NerfTask

BUDGET_S = float(os.environ.get("AB_BUDGET_S", 240))

ds = load_nerf("/root/reference/data/nerf/fox")
w, h = ds.resolution
ew, eh = w // 4, h // 4
views = np.linspace(0, ds.n_images - 1, 3).astype(int)

GT = []
for v in views:
    img = ds.images[v].astype(np.float32) / 255.0
    lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
    lin = lin[: eh * 4, : ew * 4].reshape(eh, 4, ew, 4, 3).mean((1, 3))
    GT.append(np.asarray(linear_to_srgb(lin)))


def eval_psnr(task):
    frames = task.render_batch(
        ew, eh, [ds.xforms_start[v] for v in views],
        focal_lengths=[(ds.focal_lengths[v, 0] * ew / w,
                        ds.focal_lengths[v, 1] * eh / h) for v in views],
        principal_points=[tuple(ds.principal_points[v]) for v in views],
        background=(0, 0, 0, 0))
    ses = [np.mean((np.clip(f[..., :3], 0, 1) - gt) ** 2)
           for f, gt in zip(frames, GT)]
    return mse_to_psnr(float(np.mean(ses)))


def make_task(arm):
    cfg = load_network_config("base.json", mode="nerf")
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    if arm.startswith("f4l8") or arm.startswith("f8l4"):
        # TPU gather economics: row count (L x corners) is the cost,
        # row WIDTH is free to 64 B (docs/ROUND3_NOTES.md "Gotchas").
        # Same total features (L*F=32) => identical MLP shapes; the
        # factory re-derives per_level_scale for the shorter ladder.
        enc = cfg["encoding"]
        enc["n_levels"] = 8 if arm.startswith("f4l8") else 4
        enc["n_features_per_level"] = 4 if arm.startswith("f4l8") else 8
        enc.pop("per_level_scale", None)
        # the budget-tuned decay rides along (established win)
        opt = cfg["optimizer"]["nested"]
        opt["decay_start"] = 768
        opt["decay_interval"] = 512
    if arm == "basedecay":
        # base config + LR decay sized to the 240 s budget (~1536
        # steps): lr × 0.33^((step-768)/512) ⇒ ~0.19× at cutoff
        opt = cfg["optimizer"]["nested"]
        opt["decay_start"] = 768
        opt["decay_interval"] = 512
    elif "decay" in arm:
        # late LR decay sized to the short-budget regime
        opt = cfg["optimizer"]["nested"]
        opt["decay_start"] = 1024
        opt["decay_interval"] = 512
    kw = dict(n_rays_per_batch=1 << 12, max_samples_per_ray=32,
              n_march_iters=192)
    if "s18" in arm:
        kw["target_batch_size"] = 1 << 19  # valid-sample target = 2^18
    task = NerfTask(ds, cfg, **kw)
    if "s18" in arm:
        task.max_ray_bucket_log2 = 14
    return task


def run(arm):
    buckets = ((2048, 4096, 8192, 16384) if "s18" in arm
               else (2048, 4096, 8192))
    task = make_task(arm)
    for b in buckets:
        task._n_rays_current = b
        task.train(1)
    task.train(140)  # crosses the first CDF rebuild
    for b in buckets[:2]:
        task._n_rays_current = b
        task.train(1)
    task.exact_corners_after = 0
    for b in buckets:
        task._n_rays_current = b
        task.train(1)
    t_ev = time.time()
    eval_psnr(task)
    print(f"# warm eval {time.time()-t_ev:.1f}s", flush=True)
    t_ev = time.time()
    eval_psnr(task)
    print(f"# steady eval {time.time()-t_ev:.1f}s", flush=True)

    task = make_task(arm)
    elapsed = 0.0
    best = 0.0
    while elapsed < BUDGET_S:
        t0 = time.time()
        task.train(128)
        elapsed += time.time() - t0
        if "gi32" in arm and task.training_step >= 512:
            task.grid_update_interval = 32
        p = eval_psnr(task)
        best = max(best, p)
        print(f"{arm} step={task.training_step} t={elapsed:.1f}s "
              f"psnr={p:.2f}", flush=True)
    print(f"RESULT {arm} best={best:.2f} steps={task.training_step}",
          flush=True)


if __name__ == "__main__":
    try:
        run(sys.argv[1] if len(sys.argv) > 1 else "base")
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        tries = int(os.environ.get("AB_RETRIED", "0"))
        if "UNAVAILABLE" in str(e) and tries < 6:
            wait = min(60 * (tries + 1), 300)
            print(f"# TPU unavailable — retry {tries+1}/6 after {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
            os.environ["AB_RETRIED"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
