"""A/B fox: exact 8-corner hashed-level backward vs stochastic 1-corner.

Prints (variant, step, wall_s, psnr) rows; compares time-to-quality.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np

from instant_ngp_tpu.common import linear_to_srgb, srgb_to_linear
from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.io.nerf_loader import load_nerf
from instant_ngp_tpu.metrics import mse_to_psnr
from instant_ngp_tpu.nerf.task import NerfTask

ds = load_nerf("/root/reference/data/nerf/fox")
cfg = load_network_config("base.json", mode="nerf")
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


def run(name, corners):
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=192)
    enc = dataclasses.replace(task.model.pos_encoding,
                              hashed_grad_corners=corners)
    task.model = dataclasses.replace(task.model, pos_encoding=enc)
    # warm all buckets
    for bucket in (4096, 8192):
        task._n_rays_current = bucket
        task.train(1)
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=192)
    task.model = dataclasses.replace(task.model, pos_encoding=enc)
    t0 = time.time()
    for _ in range(6):
        task.train(128)
        el = time.time() - t0
        p = eval_psnr(task)
        print(f"{name} step={task.training_step} t={el:.1f}s psnr={p:.2f}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "exact"):
        run("exact8", 8)
    if which in ("both", "sto"):
        run("sto1", 1)
