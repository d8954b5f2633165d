"""Decompose the fox train-step cost by toggling one knob at a time.

task.train(n) wall-clock is the one reliable timing surface (state
chains through every step). Each variant recompiles; run in background.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np

from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.io.nerf_loader import load_nerf
from instant_ngp_tpu.nerf.task import NerfTask

ds = load_nerf('/root/reference/data/nerf/fox')
cfg = load_network_config('configs/nerf/base.json')


def run(name, **kw):
    grad_method = kw.pop('grad_method', None)
    task = NerfTask(ds, cfg, max_samples_per_ray=32, n_march_iters=192)
    for k, v in kw.items():
        setattr(task, k, v)
    if grad_method is not None:
        enc = dataclasses.replace(task.model.pos_encoding, grad_method=grad_method)
        task.model = dataclasses.replace(task.model, pos_encoding=enc)
    task.train(1)   # compile
    task.train(16)  # compile alt buckets + settle adaptation
    t0 = time.time()
    task.train(48)
    dt = (time.time() - t0) / 48
    print(f"{name:38s} {dt*1e3:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    run("baseline (auto, compact on)")
    run("grad_method=xla", grad_method="xla")
    run("grad_method=merge (sort everywhere)", grad_method="merge")
    run("compact off", compact_samples=None)
    run("error_map off", use_error_map=False)
    run("density_reg off", density_reg_scale=0.0)
