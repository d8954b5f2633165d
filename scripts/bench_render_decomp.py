"""Decompose NeRF render cost on the chip: march vs network vs loop.

Trains fox briefly (real occupancy grid), then times:
  1. full _render_rays at 256x256
  2. march_rays alone (one K-window for all rays)
  3. model forward alone on the same sample count
  4. density-only forward
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from instant_ngp_tpu.config import load_network_config
from instant_ngp_tpu.io.nerf_loader import load_nerf
from instant_ngp_tpu.nerf.task import NerfTask
from instant_ngp_tpu.nerf.sampler import march_rays

ds = load_nerf("/root/reference/data/nerf/fox")
cfg = load_network_config("base.json", mode="nerf")
task = NerfTask(ds, cfg, n_rays_per_batch=1 << 12, max_samples_per_ray=32,
                n_march_iters=192)
print("# training 192 steps for a realistic occupancy grid...", flush=True)
task.train(192)

W = H = 256
R = W * H
v = 0
fl = (ds.focal_lengths[v, 0] * W / ds.resolution[0],
      ds.focal_lengths[v, 1] * H / ds.resolution[1])

# full render
for rep in range(3):
    t0 = time.time()
    frame = task.render(W, H, ds.xforms_start[v], focal_length=fl,
                        principal_point=tuple(ds.principal_points[v]),
                        background=(0, 0, 0, 0))
    dt = time.time() - t0
    print(f"full render {W}x{H}: {dt:.3f}s  {R/dt/1e6:.2f} M rays/s", flush=True)

# components on a fixed ray batch
from instant_ngp_tpu.render.camera import uv_to_dir_cam
from instant_ngp_tpu.common import LensMode

ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
uv = jnp.asarray(np.stack([(xs.ravel() + 0.5) / W, (ys.ravel() + 0.5) / H], -1),
                 jnp.float32)
dir_cam = uv_to_dir_cam(uv, (W, H),
                        jnp.broadcast_to(jnp.asarray([fl]), (R, 2)),
                        jnp.broadcast_to(jnp.asarray([ds.principal_points[v]]), (R, 2)),
                        lens_mode=LensMode(ds.lens_mode),
                        lens_params=jnp.asarray(ds.lens_params))
xf = jnp.asarray(ds.xforms_start[v], jnp.float32)
d = dir_cam @ xf[:, :3].T
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = jnp.broadcast_to(xf[:, 3], d.shape)

params = task.opt.inference_params(task.state.opt_state, task.state.params)
bits = task.state.grid.skipmip
amin = jnp.asarray(task.aabb_min)
amax = jnp.asarray(task.aabb_max)
jitter = jnp.full((R,), 0.5)


@jax.jit
def march_only(o, d):
    ts, dts, valid, t_exit, n_valid = march_rays(
        o, d, bits, amin, amax, jitter, task.march_cfg)
    return ts.sum() + t_exit.sum()


BRICKS = task._get_bricks(params)


@jax.jit
def model_only(pts, dirs):
    out = task.model(params, pts, dirs)
    return out.sum()


@jax.jit
def model_bricked(pts, dirs):
    out = task.model(params, pts, dirs, bricks=BRICKS)
    return out.sum()


@jax.jit
def density_only(pts):
    return task.model.density(params, pts).sum()


def timeit(name, fn, *args, reps=5):
    out = fn(*args); jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best

timeit("march_rays 64K rays x 192 iters", march_only, o, d)
N = R * 32
pts = jax.random.uniform(jax.random.PRNGKey(0), (N, 3))
dirs = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
t_model = timeit("model fwd 2M samples", model_only, pts, dirs)
t_brick = timeit("model fwd 2M samples (bricked)", model_bricked, pts, dirs)
t_dens = timeit("density fwd 2M samples", density_only, pts)
print(f"# model: {t_model/N*1e9:.2f} ns/sample; bricked {t_brick/N*1e9:.2f}",
      flush=True)
