"""Neural volume primitive: NanoVDB density grid → (pos) → (RGB, σ).

Parity with testbed_volume.cu (SURVEY.md §2.6):
  * training data from a Woodcock/delta-tracking path tracer through
    the GT grid: paths record up to MAX_TRAIN_VERTICES=4 (pos, density)
    vertices; each gets the path's terminal radiance
    (procedural sun/sky envmap × throughput) as its RGB target
    (volume_generate_training_data_kernel :93-169)
  * defaults albedo=0.95, scattering=0, distance_scale=1/100
    (testbed.h:980-982)
  * L2 loss on 4-dim output
  * rendering: transmittance marching of the learned field

TPU recast: the per-thread event loop becomes a fixed-128-iteration
lax.scan over all paths in lockstep with masked vertex recording — the
GT grid lives in HBM as a dense array (gathers), no NanoVDB tree on
device.
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..models.factory import autoconfig_grid_encoding
from ..models.network import NetworkWithInputEncoding
from ..ops.losses import loss_fn, loss_type_from_string
from ..ops.optimizers import optimizer_from_config

MAX_TRAIN_VERTICES = 4


def proc_envmap(dirs, up_dir, sun_dir, sky_col):
    """Procedural sun/sky (reference testbed_volume.cu:44-58)."""
    skyam = jnp.sum(dirs * up_dir, -1) * 0.5 + 0.5
    sunam = jnp.maximum(0.0, jnp.sum(dirs * sun_dir, -1)) ** 64
    suncol = jnp.asarray([255.0, 215.0, 195.0]) / 255.0
    return sky_col[None, :] * skyam[:, None] + suncol[None, :] * (20.0 * sunam[:, None])


class VolumeTask:
    def __init__(
        self,
        nvdb_path_or_grid,
        config: dict,
        seed: int = 1337,
        batch_size: int = 1 << 17,
        albedo: float = 0.95,
        scattering: float = 0.0,
        inv_distance_scale: float = 100.0,
    ):
        if isinstance(nvdb_path_or_grid, (str, Path)):
            from ..io.nanovdb import read_nvdb_dense

            dense, imin = read_nvdb_dense(nvdb_path_or_grid)
        else:
            dense = np.asarray(nvdb_path_or_grid, np.float32)

        self.grid_res = np.array(dense.shape)
        # scene AABB: fit the index box into [0,1]³ preserving aspect
        longest = float(self.grid_res.max())
        self.world2index_scale = longest
        extent = self.grid_res / longest
        self.aabb_min = (0.5 - extent / 2).astype(np.float32)
        self.aabb_max = (0.5 + extent / 2).astype(np.float32)

        self.density_grid = jnp.asarray(dense)
        self.global_majorant = float(dense.max())
        self.albedo = albedo
        self.scattering = scattering
        self.distance_scale = 1.0 / max(inv_distance_scale, 0.01)
        self.batch_size = batch_size
        self.up_dir = np.array([0.0, 1.0, 0.0], np.float32)
        self.sun_dir = np.array([0.577, 0.577, 0.577], np.float32)
        self.sky_col = np.array([0.35, 0.55, 0.85], np.float32)

        config = dict(config)
        config["encoding"] = autoconfig_grid_encoding(
            config.get("encoding", {}), "volume",
            volume_world2index_scale=self.world2index_scale,
        )
        self.config = config
        self.model = NetworkWithInputEncoding.from_config(config, n_input_dims=3, n_output_dims=4)
        self.loss = loss_fn(loss_type_from_string(config.get("loss", {}).get("otype", "L2")))

        key = jax.random.PRNGKey(seed)
        self.params = self.model.init(key)
        self.opt = optimizer_from_config(
            config.get("optimizer", {}), matrix_mask=self.model.matrix_mask(self.params)
        )
        self.opt_state = self.opt.init(self.params)
        self.training_step = 0
        self._key = jax.random.PRNGKey(seed ^ 0x0DD)

        self._jit_step = jax.jit(self._step)
        self._jit_render = jax.jit(self._render_rays)

    # ------------------------------------------------------------------
    def _grid_density_at(self, pos, grid=None):
        """GT density at world pos (nearest voxel, like the reference's
        jittered nearest read)."""
        grid = self.density_grid if grid is None else grid
        rel = (pos - jnp.asarray(self.aabb_min)) / (
            jnp.asarray(self.aabb_max) - jnp.asarray(self.aabb_min)
        )
        idx = jnp.floor(rel * jnp.asarray(self.grid_res, jnp.float32)).astype(jnp.int32)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(self.grid_res)), axis=-1)
        idx = jnp.clip(idx, 0, jnp.asarray(self.grid_res) - 1)
        flat = (idx[..., 0] * self.grid_res[1] + idx[..., 1]) * self.grid_res[2] + idx[..., 2]
        vals = jnp.take(grid.reshape(-1), flat)
        return jnp.where(inb, vals, 0.0)

    def _generate_batch(self, key, grid=None):
        """Delta-tracking path tracer → (pos (B,3), target (B,4), valid)."""
        n_paths = self.batch_size // MAX_TRAIN_VERTICES
        k1, k2, k3 = jax.random.split(key, 3)
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        diag = aabb_max - aabb_min

        # start outside on a sphere, aim at a random point in the box
        d0 = jax.random.normal(k1, (n_paths, 3))
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        pos = d0 * 2.0 + 0.5
        target_pt = jax.random.uniform(k2, (n_paths, 3)) * diag + aabb_min
        dirs = target_pt - pos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        from ..ops.raymarch import ray_intersect_aabb

        tmin, tmax = ray_intersect_aabb(pos, dirs, aabb_min, aabb_max)
        pos = pos + (tmin + 1e-6)[:, None] * dirs

        scale = self.distance_scale / self.global_majorant
        keys = jax.random.split(k3, 128)

        def step(carry, kk):
            pos, dirs, throughput, alive, n_rec, rec_pos, rec_den = carry
            ka, kb, kc = jax.random.split(kk, 3)
            zeta1 = jax.random.uniform(ka, (n_paths,))
            dt = -jnp.log(1.0 - zeta1) * scale
            pos = pos + dirs * dt[:, None]
            inside = jnp.all((pos >= aabb_min) & (pos <= aabb_max), axis=-1)
            alive = alive & inside

            density = self._grid_density_at(pos, grid)
            occupied = density > 0.0
            record = alive & occupied & (n_rec < MAX_TRAIN_VERTICES)
            slot = jnp.clip(n_rec, 0, MAX_TRAIN_VERTICES - 1)
            rec_pos = jnp.where(
                (record[:, None] & (jax.lax.broadcasted_iota(jnp.int32, (n_paths, MAX_TRAIN_VERTICES), 1) == slot[:, None]))[..., None],
                pos[:, None, :], rec_pos,
            )
            onehot = jax.lax.broadcasted_iota(jnp.int32, (n_paths, MAX_TRAIN_VERTICES), 1) == slot[:, None]
            rec_den = jnp.where(record[:, None] & onehot, density[:, None], rec_den)
            n_rec = n_rec + record.astype(jnp.int32)

            extinction_prob = density / self.global_majorant
            scatter_prob = extinction_prob * self.albedo
            zeta2 = jax.random.uniform(kb, (n_paths,))
            null = zeta2 >= extinction_prob
            scatter = (~null) & (zeta2 < scatter_prob)
            absorb = (~null) & ~scatter
            new_dir = jax.random.normal(kc, (n_paths, 3))
            new_dir = dirs * self.scattering + new_dir / jnp.linalg.norm(
                new_dir, axis=-1, keepdims=True
            )
            new_dir = new_dir / jnp.linalg.norm(new_dir, axis=-1, keepdims=True)
            dirs = jnp.where((alive & scatter)[:, None], new_dir, dirs)
            throughput = jnp.where(alive & absorb, 0.0, throughput)
            alive = alive & ~absorb
            return (pos, dirs, throughput, alive, n_rec, rec_pos, rec_den), None

        init = (
            pos, dirs, jnp.ones((n_paths,)), jnp.ones((n_paths,), bool),
            jnp.zeros((n_paths,), jnp.int32),
            jnp.zeros((n_paths, MAX_TRAIN_VERTICES, 3)),
            jnp.zeros((n_paths, MAX_TRAIN_VERTICES)),
        )
        (pos, dirs, throughput, alive, n_rec, rec_pos, rec_den), _ = jax.lax.scan(
            step, init, keys
        )

        radiance = proc_envmap(
            dirs, jnp.asarray(self.up_dir), jnp.asarray(self.sun_dir),
            jnp.asarray(self.sky_col),
        ) * throughput[:, None]

        B = n_paths * MAX_TRAIN_VERTICES
        pts = rec_pos.reshape(B, 3)
        tgt_rgb = jnp.repeat(radiance, MAX_TRAIN_VERTICES, axis=0)
        tgt = jnp.concatenate([tgt_rgb, rec_den.reshape(B, 1)], -1)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (n_paths, MAX_TRAIN_VERTICES), 1)
            < n_rec[:, None]
        ).reshape(B)
        return pts, tgt, valid

    def _step(self, params, opt_state, grid, key):
        # GT grid passed as a jit argument, not captured (HLO-constant bloat)
        pts, tgt, valid = self._generate_batch(key, grid)

        def loss_value(p):
            pred = self.model(p, pts).astype(jnp.float32)
            per = jnp.mean(self.loss(tgt, pred), axis=-1)
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        loss, grads = jax.value_and_grad(loss_value)(params)
        params, opt_state = self.opt.update(grads, opt_state, params)
        return params, opt_state, loss

    def train(self, n_steps: int = 1) -> float:
        loss = None
        for _ in range(n_steps):
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._jit_step(
                self.params, self.opt_state, self.density_grid, sub
            )
            self.training_step += 1
        return float(loss) if loss is not None else 0.0

    # ------------------------------------------------------------------
    @property
    def inference_params(self):
        return self.opt.inference_params(self.opt_state, self.params)

    def _render_rays(self, params, o, d, n_steps=256):
        """Emission-absorption marching of the learned field."""
        from ..ops.raymarch import ray_intersect_aabb

        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        tmin, tmax = ray_intersect_aabb(o, d, aabb_min, aabb_max)
        dt = (tmax - tmin) / n_steps

        def body(i, carry):
            rgb, T = carry
            t = tmin + (i + 0.5) * dt
            pos = o + t[:, None] * d
            out = self.model(params, pos).astype(jnp.float32)
            sigma = jnp.maximum(out[:, 3], 0.0) * self.distance_scale * 100.0
            col = jnp.maximum(out[:, :3], 0.0)
            alpha = 1.0 - jnp.exp(-sigma * dt)
            rgb = rgb + (T * alpha)[:, None] * col
            T = T * (1.0 - alpha)
            return (rgb, T)

        rgb, T = jax.lax.fori_loop(
            0, n_steps, body, (jnp.zeros_like(o), jnp.ones(o.shape[0]))
        )
        bg = proc_envmap(
            d, jnp.asarray(self.up_dir), jnp.asarray(self.sun_dir),
            jnp.asarray(self.sky_col),
        )
        rgb = rgb + T[:, None] * bg
        return rgb, 1.0 - T

    def render(self, width: int, height: int, camera_matrix, fov: float = 50.0):
        cam = np.asarray(camera_matrix, np.float32)
        fl = 0.5 * height / math.tan(0.5 * math.radians(fov))
        ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        u = (xs + 0.5) / width - 0.5
        v = (ys + 0.5) / height - 0.5
        dirs = np.stack([u * width / fl, v * height / fl, np.ones_like(u)], -1)
        d = dirs @ cam[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cam[:, 3], d.shape)
        params = self.inference_params
        rgb, alpha = self._jit_render(
            params, jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3))
        )
        return np.concatenate(
            [np.asarray(rgb), np.asarray(alpha)[:, None]], -1
        ).reshape(height, width, 4)

    def compute_density_mse(self, n_samples: int = 1 << 18) -> float:
        """Eval: learned σ vs GT grid density on random points."""
        key = jax.random.PRNGKey(99)
        pos = (
            jax.random.uniform(key, (n_samples, 3))
            * jnp.asarray(self.aabb_max - self.aabb_min)
            + jnp.asarray(self.aabb_min)
        )
        gt = np.asarray(self._grid_density_at(pos))
        pred = np.asarray(self.model(self.inference_params, pos).astype(jnp.float32)[:, 3])
        return float(np.mean((gt - pred) ** 2))
