"""A/B fox: trilinear (8-corner) vs simplex (4-corner) hashed levels.

Same protocol as ab_corners.py: both variants run the standard corner
anneal; rows are (variant, step, train-only wall seconds, psnr).
Simplex halves the gather rows of every hashed level in BOTH the
training forward and rendering — the measured wall on v5e — at the
cost of tetrahedral instead of trilinear interpolation.
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


def make_task(interp):
    cfg = load_network_config("base.json", mode="nerf")
    if interp is not None:
        cfg.setdefault("encoding", {})["interpolation"] = interp
    return NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=192)


def run(name, interp, n_chunks=8):
    task = make_task(interp)
    # warm all buckets + anneal variants
    for bucket in (2048, 4096, 8192):
        task._n_rays_current = bucket
        task.train(1)
    task.exact_corners_after = 0
    for bucket in (2048, 4096, 8192):
        task._n_rays_current = bucket
        task.train(1)
    eval_psnr(task)
    task = make_task(interp)
    train_s = 0.0
    for _ in range(n_chunks):
        t0 = time.time()
        task.train(128)
        train_s += time.time() - t0
        p = eval_psnr(task)
        print(f"{name} step={task.training_step} t={train_s:.1f}s psnr={p:.2f}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "linear"):
        run("linear", None)
    if which in ("both", "simplex"):
        run("simplex", "Simplex")
