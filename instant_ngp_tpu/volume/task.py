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
  * rendering: transmittance (delta) tracking of the learned field
    through the GT bitgrid with the procedural sun/sky background
    (volume_render_kernel_step :376-438), plus a ground-truth render
    mode that path-traces the GT grid with scattering/absorption
    (volume_render_kernel_gt :300-375)

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
        # 128³ occupancy bitgrid in world space (reference load_volume,
        # testbed_volume.cu:674-697): delta-tracking events only count
        # inside occupied cells (walk_to_next_event :70-88), which is
        # what makes most recorded vertices land in real density.
        res = np.asarray(dense.shape)
        ii, jj, kk = np.nonzero(dense > 1e-3)
        extent = res / float(res.max())
        centers = (np.stack([ii, jj, kk], -1) + 0.5) / res  # in box coords
        world = (0.5 - extent / 2) + centers * extent
        cell = np.clip((world * 128.0 + 0.5).astype(np.int32), 0, 127)
        bitgrid = np.zeros((128, 128, 128), bool)
        bitgrid[cell[:, 0], cell[:, 1], cell[:, 2]] = True
        self.bitgrid = jnp.asarray(bitgrid)
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

        # pyngp shall_train_encoding / shall_train_network freeze
        # toggles; changing them requires rebuild_jit_programs()
        self.shall_train_encoding = True
        self.shall_train_network = True
        self._jit_step = jax.jit(self._step)
        self._jit_render = jax.jit(self._render_rays)
        self._jit_render_gt = jax.jit(self._render_rays_gt)

    # ------------------------------------------------------------------
    def _grid_density_at(self, pos, grid=None):
        """GT density at world pos (nearest voxel)."""
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

    def _grid_density_at_jittered(self, pos, jitter, grid=None):
        """GT density with a jittered voxel index — the reference reads
        acc.getValue(int(indexpos + rand)) (testbed_volume.cu:135-137),
        a stochastic trilinear interpolation."""
        grid = self.density_grid if grid is None else grid
        rel = (pos - jnp.asarray(self.aabb_min)) / (
            jnp.asarray(self.aabb_max) - jnp.asarray(self.aabb_min)
        )
        fidx = rel * jnp.asarray(self.grid_res, jnp.float32) - 0.5 + jitter
        idx = jnp.floor(fidx).astype(jnp.int32)
        inb = jnp.all((idx >= 0) & (idx < jnp.asarray(self.grid_res)), axis=-1)
        idx = jnp.clip(idx, 0, jnp.asarray(self.grid_res) - 1)
        flat = (idx[..., 0] * self.grid_res[1] + idx[..., 1]) * self.grid_res[2] + idx[..., 2]
        vals = jnp.take(grid.reshape(-1), flat)
        return jnp.where(inb, vals, 0.0)

    def _bitgrid_at(self, pos):
        """Occupancy of the 128³ world-space bitgrid at pos (..., 3)."""
        cell = jnp.clip((pos * 128.0 + 0.5).astype(jnp.int32), 0, 127)
        flat = (cell[..., 0] * 128 + cell[..., 1]) * 128 + cell[..., 2]
        return jnp.take(self.bitgrid.reshape(-1), flat)

    def _generate_batch(self, key, grid=None):
        """Delta-tracking path tracer → (pos (B,3), target (B,4), valid).

        Faithful recast of volume_generate_training_data_kernel
        (testbed_volume.cu:93-169) in lockstep:
          * events only in occupied bitgrid cells (walk_to_next_event)
          * each path RESPAWNS with a fresh ray after escape/absorb
            until all MAX_TRAIN_VERTICES slots hold a vertex — batch
            utilization ~100% instead of ~the cloud's fill fraction
          * each vertex gets the terminal radiance of ITS attempt
          * GT reads jitter the voxel index (stochastic trilinear)
        """
        n_paths = self.batch_size // MAX_TRAIN_VERTICES
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        diag = aabb_max - aabb_min
        V = MAX_TRAIN_VERTICES
        up = jnp.asarray(self.up_dir)
        sun = jnp.asarray(self.sun_dir)
        sky = jnp.asarray(self.sky_col)

        from ..ops.raymarch import ray_intersect_aabb

        def spawn(k):
            k1, k2 = jax.random.split(k)
            d0 = jax.random.normal(k1, (n_paths, 3))
            d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
            pos = d0 * 2.0 + 0.5
            target_pt = jax.random.uniform(k2, (n_paths, 3)) * diag + aabb_min
            dirs = target_pt - pos
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            tmin, _ = ray_intersect_aabb(pos, dirs, aabb_min, aabb_max)
            pos = pos + (jnp.maximum(tmin, 0.0) + 1e-6)[:, None] * dirs
            return pos, dirs

        k_spawn0, k_scan = jax.random.split(key)
        pos0, dirs0 = spawn(k_spawn0)
        scale = self.distance_scale / self.global_majorant
        keys = jax.random.split(k_scan, 192)
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (n_paths, V), 1)

        def finalize(rec_rgb, pending_from, n_rec, dirs, throughput):
            """Assign this attempt's terminal radiance to its vertices."""
            radiance = proc_envmap(dirs, up, sun, sky) * throughput[:, None]
            pend = (iota_v >= pending_from[:, None]) & (iota_v < n_rec[:, None])
            return jnp.where(pend[..., None], radiance[:, None, :], rec_rgb)

        def step(carry, kk):
            (pos, dirs, throughput, done, n_rec, pend_from,
             rec_pos, rec_den, rec_rgb) = carry
            ka, kb, kc, kd, kj = jax.random.split(kk, 5)
            zeta1 = jax.random.uniform(ka, (n_paths,))
            dt = -jnp.log(1.0 - zeta1) * scale
            pos = pos + dirs * dt[:, None]
            inside = jnp.all((pos >= aabb_min) & (pos <= aabb_max), axis=-1)
            escaped = ~done & ~inside

            # event only in occupied space (reference walk_to_next_event)
            event = ~done & inside & self._bitgrid_at(pos)
            jitter = jax.random.uniform(kj, (n_paths, 3))
            density = self._grid_density_at_jittered(pos, jitter, grid)
            record = event & (n_rec < V)
            onehot = iota_v == jnp.clip(n_rec, 0, V - 1)[:, None]
            rec_pos = jnp.where((record[:, None] & onehot)[..., None],
                                pos[:, None, :], rec_pos)
            rec_den = jnp.where(record[:, None] & onehot,
                                density[:, None], rec_den)
            n_rec = n_rec + record.astype(jnp.int32)

            extinction_prob = jnp.where(event, density / self.global_majorant, 0.0)
            scatter_prob = extinction_prob * self.albedo
            zeta2 = jax.random.uniform(kb, (n_paths,))
            real = event & (zeta2 < extinction_prob)
            scatter = real & (zeta2 < scatter_prob)
            absorb = real & ~scatter
            new_dir = jax.random.normal(kc, (n_paths, 3))
            new_dir = dirs * self.scattering + new_dir / jnp.linalg.norm(
                new_dir, axis=-1, keepdims=True)
            new_dir = new_dir / jnp.linalg.norm(new_dir, axis=-1, keepdims=True)
            dirs = jnp.where(scatter[:, None], new_dir, dirs)

            # attempt end: escape (throughput 1) or absorb (throughput 0)
            died = escaped | absorb
            thr = jnp.where(absorb, 0.0, 1.0)
            rec_rgb_new = finalize(rec_rgb, pend_from, n_rec, dirs, thr)
            rec_rgb = jnp.where(died[:, None, None], rec_rgb_new, rec_rgb)
            pend_from = jnp.where(died, n_rec, pend_from)
            done = done | (died & (n_rec >= V))

            # respawn unfinished paths with fresh rays
            respawn = died & ~done
            s_pos, s_dirs = spawn(kd)
            pos = jnp.where(respawn[:, None], s_pos, pos)
            dirs = jnp.where(respawn[:, None], s_dirs, dirs)
            return (pos, dirs, throughput, done, n_rec, pend_from,
                    rec_pos, rec_den, rec_rgb), None

        init = (
            pos0, dirs0, jnp.ones((n_paths,)), jnp.zeros((n_paths,), bool),
            jnp.zeros((n_paths,), jnp.int32), jnp.zeros((n_paths,), jnp.int32),
            jnp.zeros((n_paths, V, 3)), jnp.zeros((n_paths, V)),
            jnp.zeros((n_paths, V, 3)),
        )
        (pos, dirs, throughput, done, n_rec, pend_from,
         rec_pos, rec_den, rec_rgb), _ = jax.lax.scan(step, init, keys)

        # attempts still in flight at the iteration cap: terminal
        # radiance with full throughput (reference falls out of its
        # 128-iter loop with throughput = 1)
        rec_rgb = finalize(rec_rgb, pend_from, n_rec, dirs, jnp.ones((n_paths,)))

        B = n_paths * V
        pts = rec_pos.reshape(B, 3)
        tgt = jnp.concatenate(
            [rec_rgb.reshape(B, 3), rec_den.reshape(B, 1)], -1
        )
        valid = (iota_v < n_rec[:, None]).reshape(B)
        return pts, tgt, valid

    def _step(self, params, opt_state, grid, key):
        # GT grid passed as a jit argument, not captured (HLO-constant bloat)
        pts, tgt, valid = self._generate_batch(key, grid)

        def loss_value(p):
            pred = self.model(p, pts).astype(jnp.float32)
            per = jnp.mean(self.loss(tgt, pred), axis=-1)
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        loss, grads = jax.value_and_grad(loss_value)(params)
        new_params, opt_state = self.opt.update(grads, opt_state, params)
        if not self.shall_train_encoding and "enc" in new_params:
            new_params = {**new_params, "enc": params["enc"]}
        if not self.shall_train_network:
            new_params = {**new_params, "net": params["net"]}
        return new_params, opt_state, loss

    def rebuild_jit_programs(self):
        """Re-trace the step after changing trace-time knobs
        (shall_train_*)."""
        self._jit_step = jax.jit(self._step)

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

    def _render_rays(self, params, o, d, key, n_iters=192):
        """Learned-model render with transmittance (delta) tracking —
        parity with volume_render_kernel_step (testbed_volume.cu:
        376-438): exponential free-flight jumps through the GT
        bitgrid; at each event inside an occupied cell the network's
        (rgb, σ) contributes alpha = min(σ/majorant, 1)·T; rays finish
        at opacity 0.99 or escape, then composite the procedural
        sun/sky envmap (proc_envmap_render). The reference's unbounded
        walk_to_next_event loop is unrolled into the same lockstep
        iteration budget (empty jumps just don't deposit)."""
        from ..ops.raymarch import ray_intersect_aabb

        R = o.shape[0]
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        tmin, tmax = ray_intersect_aabb(o, d, aabb_min, aabb_max)
        hit = tmax > tmin
        pos0 = o + tmin[:, None] * d
        scale = self.distance_scale / self.global_majorant

        def body(i, carry):
            pos, rgb, col_a, alive, krng = carry
            krng, k1 = jax.random.split(krng)
            u = jax.random.uniform(k1, (R,), minval=1e-7, maxval=1.0)
            dt = -jnp.log(u) * scale
            pos = jnp.where(alive[:, None], pos + dt[:, None] * d, pos)
            inside = jnp.all((pos >= aabb_min) & (pos <= aabb_max), axis=-1)
            occ = self._bitgrid_at(pos)
            event = alive & inside & occ
            out = self.model(params, pos).astype(jnp.float32)
            extinction = jnp.minimum(
                jnp.maximum(out[:, 3], 0.0) / self.global_majorant, 1.0)
            alpha = jnp.where(event, extinction * (1.0 - col_a), 0.0)
            rgb = rgb + alpha[:, None] * jnp.maximum(out[:, :3], 0.0)
            col_a = col_a + alpha
            alive = alive & inside & (col_a <= 0.99)
            return (pos, rgb, col_a, alive, krng)

        pos, rgb, col_a, alive, _ = jax.lax.fori_loop(
            0, n_iters, body,
            (pos0, jnp.zeros_like(o), jnp.zeros(R), hit, key),
        )
        bg = proc_envmap(
            d, jnp.asarray(self.up_dir), jnp.asarray(self.sun_dir),
            jnp.asarray(self.sky_col),
        )
        rgb = rgb + (1.0 - col_a)[:, None] * bg
        return rgb, col_a

    def _render_rays_gt(self, o, d, grid, key, n_iters=256):
        """Ground-truth render: Woodcock path tracing through the GT
        grid with scattering/absorption events — parity with
        volume_render_kernel_gt (testbed_volume.cu:300-375)."""
        from ..ops.raymarch import ray_intersect_aabb

        R = o.shape[0]
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        tmin, tmax = ray_intersect_aabb(o, d, aabb_min, aabb_max)
        hit = tmax > tmin
        pos0 = o + tmin[:, None] * d
        scale = self.distance_scale / self.global_majorant

        def body(i, carry):
            pos, dirs, alive, absorbed, scattered, krng = carry
            krng, k1, k2, k3 = jax.random.split(krng, 4)
            u = jax.random.uniform(k1, (R,), minval=1e-7, maxval=1.0)
            dt = -jnp.log(u) * scale
            pos = jnp.where(alive[:, None], pos + dt[:, None] * dirs, pos)
            inside = jnp.all((pos >= aabb_min) & (pos <= aabb_max), axis=-1)
            occ = self._bitgrid_at(pos)
            event = alive & inside & occ
            dens = self._grid_density_at(pos, grid)
            extinction = dens / self.global_majorant
            z2 = jax.random.uniform(k2, (R,))
            do_scatter = event & (z2 < extinction * self.albedo)
            do_absorb = event & ~do_scatter & (z2 < extinction)
            rnd = jax.random.normal(k3, (R, 3))
            new_d = dirs * self.scattering + rnd
            new_d = new_d / jnp.maximum(
                jnp.linalg.norm(new_d, axis=-1, keepdims=True), 1e-9)
            dirs = jnp.where(do_scatter[:, None], new_d, dirs)
            scattered = scattered | do_scatter
            absorbed = absorbed | do_absorb
            alive = alive & inside & ~absorbed
            return (pos, dirs, alive, absorbed, scattered, krng)

        pos, dirs, alive, absorbed, scattered, _ = jax.lax.fori_loop(
            0, n_iters, body,
            (pos0, d, hit, jnp.zeros(R, bool), jnp.zeros(R, bool), key),
        )
        env = proc_envmap(
            dirs, jnp.asarray(self.up_dir), jnp.asarray(self.sun_dir),
            jnp.asarray(self.sky_col),
        )
        rgb = jnp.where(absorbed[:, None], 0.0, env)
        alpha = jnp.where(absorbed | scattered, 1.0, 0.0)
        return rgb, alpha

    def render(self, width: int, height: int, camera_matrix, fov: float = 50.0,
               ground_truth: bool = False):
        cam = np.asarray(camera_matrix, np.float32)
        fl = 0.5 * height / math.tan(0.5 * math.radians(fov))
        ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        u = (xs + 0.5) / width - 0.5
        v = (ys + 0.5) / height - 0.5
        dirs = np.stack([u * width / fl, v * height / fl, np.ones_like(u)], -1)
        d = dirs @ cam[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cam[:, 3], d.shape)
        self._key, sub = jax.random.split(self._key)
        if ground_truth:
            rgb, alpha = self._jit_render_gt(
                jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)),
                self.density_grid, sub,
            )
        else:
            params = self.inference_params
            rgb, alpha = self._jit_render(
                params, jnp.asarray(o.reshape(-1, 3)),
                jnp.asarray(d.reshape(-1, 3)), sub,
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
