"""A/B fox at equal 240 s TRAIN budget: 2^17 valid samples/step
(current flagship) vs 2^18 (the reference's full target batch).

Motivation: the 2^16 experiment showed per-step sample count matters
more than step rate (docs/ROUND3_NOTES.md "Sample cap 2^16"); this
probes the other direction. Run one arm per process:
    python scripts/ab_batch.py s17
    python scripts/ab_batch.py s18
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


def eval_psnr(task):
    ses = []
    for v in views:
        fl = (ds.focal_lengths[v, 0] * ew / w, ds.focal_lengths[v, 1] * eh / h)
        frame = task.render(ew, eh, ds.xforms_start[v], focal_length=fl,
                            principal_point=tuple(ds.principal_points[v]),
                            background=(0, 0, 0, 0))
        img = ds.images[v].astype(np.float32) / 255.0
        lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
        lin = lin[: eh * 4, : ew * 4].reshape(eh, 4, ew, 4, 3).mean((1, 3))
        gt = np.asarray(linear_to_srgb(lin))
        ses.append(np.mean((np.clip(frame[..., :3], 0, 1) - gt) ** 2))
    return mse_to_psnr(float(np.mean(ses)))


def make_task(arm):
    cfg = load_network_config("base.json", mode="nerf")
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    kw = dict(n_rays_per_batch=1 << 12, max_samples_per_ray=32,
              n_march_iters=192)
    if arm == "s18":
        kw["target_batch_size"] = 1 << 19  # valid-sample target = 2^18
    task = NerfTask(ds, cfg, **kw)
    if arm == "s18":
        task.max_ray_bucket_log2 = 14
    return task


def run(arm):
    # warmup: compile every bucket shape both anneal phases touch
    task = make_task(arm)
    buckets = (2048, 4096, 8192, 16384) if arm == "s18" else (2048, 4096, 8192)
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

    task = make_task(arm)
    elapsed = 0.0
    while elapsed < BUDGET_S:
        t0 = time.time()
        task.train(128)
        elapsed += time.time() - t0
        p = eval_psnr(task)
        print(f"{arm} step={task.training_step} t={elapsed:.1f}s "
              f"psnr={p:.2f}", flush=True)
    # keep a converged snapshot around for render benchmarks
    from instant_ngp_tpu import snapshot as snapshot_io
    from instant_ngp_tpu.testbed import jax_to_np_tree

    cfg = load_network_config("base.json", mode="nerf")
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    snapshot_io.save_snapshot(
        f"/tmp/fox_conv_{arm}.ingp",
        cfg,
        jax_to_np_tree(task.state.params), "nerf",
        training_step=task.training_step,
        density_grid=np.asarray(task.state.grid.density),
        nerf_extra={"aabb_scale": ds.aabb_scale,
                    "rgb": {"rays_per_batch": task.n_rays_per_batch},
                    "dataset": snapshot_io.dataset_to_json(ds)})


if __name__ == "__main__":
    try:
        run(sys.argv[1] if len(sys.argv) > 1 else "s17")
    except Exception as e:  # noqa: BLE001
        import traceback

        traceback.print_exc(file=sys.stderr)
        # same TPU-worker-crash re-exec retry as bench.py main
        tries = int(os.environ.get("AB_RETRIED", "0"))
        if ("UNAVAILABLE" in str(e) or "remote_compile" in str(e)) and tries < 6:
            wait = min(60 * (tries + 1), 300)
            print(f"# TPU worker crash — retry {tries + 1}/6 after {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
            os.environ["AB_RETRIED"] = str(tries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
