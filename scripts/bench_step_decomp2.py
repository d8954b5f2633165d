"""Round-3 train-step decomposition on fox: exact-phase (post-anneal)
step composition with the simplex flagship config.

task.train(n) wall-clock is the one reliable timing surface. Run on the
TPU in background; each variant compiles fresh programs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
try:
    import _jaxcache  # noqa: F401
except Exception:
    pass

import dataclasses

import jax
import numpy as np

from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.io.nerf_loader import load_nerf
from instant_ngp_tpu.nerf.task import NerfTask

ds = load_nerf("/root/reference/data/nerf/fox")


def make(interp=None, **kw):
    cfg = load_network_config("base.json", mode="nerf")
    if interp:
        cfg.setdefault("encoding", {})["interpolation"] = interp
    grad_method = kw.pop("grad_method", None)
    corners = kw.pop("corners", None)
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=192)
    for k, v in kw.items():
        setattr(task, k, v)
    repl = {}
    if grad_method is not None:
        repl["grad_method"] = grad_method
    if corners is not None:
        repl["hashed_grad_corners"] = corners
    if repl:
        enc = dataclasses.replace(task.model.pos_encoding, **repl)
        task.model = dataclasses.replace(task.model, pos_encoding=enc)
        task.rebuild_jit_programs()
    return task


def run(name, n=48, **kw):
    task = make(**kw)
    task.train(1)
    task.train(16)
    t0 = time.time()
    task.train(n)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1e3:8.1f} ms/step", flush=True)
    return task


# exact phase is where the budget goes (anneal switches at 512)
run("exact trilinear (r2 flagship)", exact_corners_after=0)
t = run("exact simplex", interp="Simplex", exact_corners_after=0)
run("sto simplex", interp="Simplex", exact_corners_after=None)
# march iters is a constructor knob
def run_march(name, iters):
    cfg = load_network_config("base.json", mode="nerf")
    cfg.setdefault("encoding", {})["interpolation"] = "Simplex"
    task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12,
                    max_samples_per_ray=32, n_march_iters=iters)
    task.exact_corners_after = 0
    task.train(1); task.train(16)
    t0 = time.time(); task.train(48)
    print(f"{name:44s} {(time.time()-t0)/48*1e3:8.1f} ms/step", flush=True)

run_march("exact simplex, march_iters=96", 96)
run("exact simplex, no grid updates", interp="Simplex", exact_corners_after=0,
    grid_update_interval=10**9)
run("exact simplex, compact=2^16", interp="Simplex", exact_corners_after=0,
    compact_samples=1 << 16)
run("exact simplex, no error map", interp="Simplex", exact_corners_after=0,
    use_error_map=False)
run("exact simplex, grad=xla", interp="Simplex", exact_corners_after=0,
    grad_method="xla")

# isolate: grid update cost (partial, every 16 steps)
import jax.numpy as jnp

task = t
jax.block_until_ready(task.state.params["density_net"][0])
t0 = time.time()
for i in range(8):
    task.state = task._jit_update_grid(
        task.state, jax.random.PRNGKey(i), jnp.int32(1000), full=False)
jax.block_until_ready(task.state.grid.density)
print(f"grid partial update: {(time.time()-t0)/8*1e3:.1f} ms "
      f"(amortized {(time.time()-t0)/8/16*1e3:.1f} ms/step)", flush=True)
