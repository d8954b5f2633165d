"""SDF primitive: mesh → neural signed-distance field.

Parity targets (reference testbed_sdf.cu, SURVEY.md §2.4):
  * mesh load + normalization into the unit cube (:1363-1447)
  * online GT sampling per batch: 4/8 on-surface (d=0), 3/8 surface +
    perturbation, 1/8 uniform; BVH signed distance for the perturbed +
    uniform parts (generate_training_samples_sdf :1449-1535)
  * MAPE loss, tcnn trainer semantics (:1578-1619)
  * sphere-traced rendering with finite-difference or autodiff normals
    and a Disney-ish BRDF (:798-959, :1108-1361)
  * IoU metric: sign agreement on uniform samples (:1636-1680)

TPU split: GT generation (BVH queries) runs on host C++ threads while
the jitted train step consumes the previous batch — a two-stage
pipeline replacing the reference's CUDA-stream overlap.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.bvh import TriangleBvh
from ..geometry.mesh_io import load_mesh, normalize_to_unit_cube
from ..models.factory import autoconfig_grid_encoding
from ..models.network import NetworkWithInputEncoding
from ..ops.losses import loss_fn, loss_type_from_string
from ..ops.optimizers import optimizer_from_config


class SdfTask:
    def __init__(
        self,
        mesh_path_or_tris,
        config: dict,
        seed: int = 1337,
        batch_size: int = 1 << 16,
        sdf_mode: str = "pseudonormal",
    ):
        if isinstance(mesh_path_or_tris, (str, bytes)) or hasattr(mesh_path_or_tris, "__fspath__"):
            tris = load_mesh(mesh_path_or_tris)
        else:
            tris = np.asarray(mesh_path_or_tris, np.float32)
        self.triangles, self.mesh_scale, self.mesh_offset = normalize_to_unit_cube(tris)
        # shading controls (reference BRDFParams sdf_device.cuh:30-40,
        # soft shadows via iq's rmshadows in the shadow sphere trace,
        # optional floor plane testbed_sdf.cu:198-204)
        from ..render.brdf import BRDFParams

        self.brdf = BRDFParams()
        self.shadow_sharpness = 16.0
        self.render_shadows = True
        self.floor_y = 0.0
        self.floor_enable = False
        self.sun_color = (1.0, 1.0, 1.0)
        # pyngp Sdf knobs (python_api.cu:855-871): zero_offset inflates
        # the rendered zero set (advance_pos_kernel_sdf subtracts it,
        # testbed_sdf.cu:183); analytic_normals picks autodiff vs 6-tap
        # finite differences (testbed_sdf.cu:1231, epsilon slider);
        # surface_offset_scale scales the training perturbation noise
        # (testbed.cu:1244)
        self.zero_offset = 0.0
        self.analytic_normals = True
        self.fd_normals_epsilon = 1e-3
        self.surface_offset_scale = 1.0
        # step-size scale for the sphere trace: <1 under-steps for
        # imperfectly-metric learned fields (reference Sdf::
        # distance_scale, advance_pos_kernel_sdf testbed_sdf.cu:185)
        self.distance_scale = 1.0
        # ESDFGroundTruthMode (common.h:162-165): how ground_truth=True
        # renders the mesh — BVH raytrace or sphere-traced mesh SDF
        self.groundtruth_mode = "raytracedmesh"
        self.bvh = TriangleBvh(self.triangles)
        self.sdf_mode = sdf_mode
        self.batch_size = batch_size

        # area-weighted triangle CDF for surface sampling (reference
        # DiscreteDistribution, discrete_distribution.h)
        e1 = self.triangles[:, 1] - self.triangles[:, 0]
        e2 = self.triangles[:, 2] - self.triangles[:, 0]
        areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        self.tri_cdf = np.cumsum(areas) / max(areas.sum(), 1e-12)

        config = dict(config)
        enc_cfg = config.get("encoding", {})
        if str(enc_cfg.get("otype", "")).lower() == "takikawa":
            # NGLOD feature-octree encoding (reference
            # takikawa_encoding.cuh + configs/sdf/takikawa.json)
            from ..geometry.octree import TriangleOctree
            from ..ops.mlp import mlp_from_config
            from ..ops.takikawa import TakikawaEncoding

            depth = int(enc_cfg.get("n_levels", 7))
            self.octree = TriangleOctree(self.triangles, depth=depth)
            enc = TakikawaEncoding(
                self.octree,
                n_features_per_level=int(enc_cfg.get("n_features_per_level", 4)),
                start_level=int(enc_cfg.get("starting_level", 2)),
            )
            net = mlp_from_config(config.get("network", {}), enc.n_output_dims, 1)
            self.model = NetworkWithInputEncoding(enc, net)
        else:
            config["encoding"] = autoconfig_grid_encoding(enc_cfg, "sdf")
            self.model = NetworkWithInputEncoding.from_config(
                config, n_input_dims=3, n_output_dims=1
            )
            self.octree = None
        self.config = config
        self.loss = loss_fn(loss_type_from_string(config.get("loss", {}).get("otype", "Mape")))

        key = jax.random.PRNGKey(seed)
        self.params = self.model.init(key)
        self.opt = optimizer_from_config(
            config.get("optimizer", {}), matrix_mask=self.model.matrix_mask(self.params)
        )
        self.opt_state = self.opt.init(self.params)
        self.training_step = 0
        self._rng = np.random.default_rng(seed)
        self._iou_ema = None

        # pyngp shall_train_encoding / shall_train_network freeze
        # toggles; changing them requires rebuild_jit_programs()
        self.shall_train_encoding = True
        self.shall_train_network = True
        self._jit_step = jax.jit(self._step)
        self._jit_infer = jax.jit(lambda p, x: self.model(p, x).astype(jnp.float32)[:, 0])

    def rebuild_jit_programs(self):
        """Re-trace the step after changing trace-time knobs
        (shall_train_*)."""
        self._jit_step = jax.jit(self._step)

    # ------------------------------------------------------------------
    def _sample_surface(self, n: int) -> np.ndarray:
        u = self._rng.random(n)
        ti = np.searchsorted(self.tri_cdf, u)
        ti = np.clip(ti, 0, len(self.triangles) - 1)
        b1 = self._rng.random(n)
        b2 = self._rng.random(n)
        flip = b1 + b2 > 1
        b1 = np.where(flip, 1 - b1, b1)
        b2 = np.where(flip, 1 - b2, b2)
        t = self.triangles[ti]
        return (
            t[:, 0]
            + (t[:, 1] - t[:, 0]) * b1[:, None]
            + (t[:, 2] - t[:, 0]) * b2[:, None]
        ).astype(np.float32)

    def generate_training_batch(self):
        """Reference mix: 4/8 surface, 3/8 perturbed (logistic noise),
        1/8 uniform (testbed_sdf.cu:1449-1535)."""
        n = self.batch_size
        n_surf = n // 2
        n_pert = n * 3 // 8
        n_unif = n - n_surf - n_pert

        surf = self._sample_surface(n_surf + n_pert)
        pts_surf = surf[:n_surf]
        # logistic-distributed perturbation, stddev ~ 1/sqrt(3)*scale
        u = np.clip(self._rng.random((n_pert, 3)), 1e-6, 1 - 1e-6)
        logistic = (0.01 * self.surface_offset_scale
                    * np.log(u / (1 - u)).astype(np.float32))
        pts_pert = np.clip(surf[n_surf:] + logistic, 0.0, 1.0)
        pts_unif = self._rng.random((n_unif, 3)).astype(np.float32)

        pts = np.concatenate([pts_surf, pts_pert, pts_unif]).astype(np.float32)
        d = np.zeros(n, np.float32)
        nontrivial = np.concatenate([pts_pert, pts_unif])
        d[n_surf:] = self.bvh.signed_distance(nontrivial, mode=self.sdf_mode)
        # shuffle (reference shuffles positions/distances)
        perm = self._rng.permutation(n)
        return pts[perm], d[perm]

    def _step(self, params, opt_state, pts, target):
        def loss_value(p):
            pred = self.model(p, pts).astype(jnp.float32)[:, 0]
            return jnp.mean(self.loss(target, pred))

        loss, grads = jax.value_and_grad(loss_value)(params)
        new_params, opt_state = self.opt.update(grads, opt_state, params)
        if not self.shall_train_encoding and "enc" in new_params:
            new_params = {**new_params, "enc": params["enc"]}
        if not self.shall_train_network:
            new_params = {**new_params, "net": params["net"]}
        return new_params, opt_state, loss

    def _batch_producer(self):
        """Background GT generation: the single-core BVH queries run
        while the TPU consumes the previous batch (the reference's
        CUDA-stream overlap, recast as a host pipeline thread). The
        worker parks on the bounded queue and exits when stop_producer
        is called (also via __del__)."""
        import queue
        import threading

        if not hasattr(self, "_queue"):
            self._queue = queue.Queue(maxsize=2)
            self._stop = threading.Event()

            def worker():
                while not self._stop.is_set():
                    batch = self.generate_training_batch()
                    while not self._stop.is_set():
                        try:
                            self._queue.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue

            self._thread = threading.Thread(target=worker, daemon=True)
            self._thread.start()
        return self._queue

    def stop_producer(self):
        """Terminate the GT pipeline thread (idempotent)."""
        if hasattr(self, "_stop"):
            self._stop.set()
            self._thread.join(timeout=5.0)

    def __del__(self):  # noqa: D105
        try:
            self.stop_producer()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def override_training_data(self, points: np.ndarray,
                               distances: np.ndarray) -> None:
        """Replace online GT generation with a fixed (points, sdf)
        set — pyngp ``override_sdf_training_data``
        (python_api.cu:74-112). Points arrive in the mesh's raw world
        frame and are mapped into the normalized unit cube exactly like
        the mesh itself (world·scale + offset); distances scale by the
        same factor. Training then cycles through the fixed set and the
        producer thread is stopped (generate_sdf_data_online = false)."""
        pts = np.asarray(points, np.float32)
        d = np.asarray(distances, np.float32).reshape(-1)
        if pts.ndim != 2 or pts.shape[1] != 3 or pts.shape[0] != d.shape[0]:
            raise ValueError(
                f"invalid points<->distances data: {pts.shape} vs {d.shape}")
        self.stop_producer()
        self._override = (
            pts * self.mesh_scale + self.mesh_offset,
            d * self.mesh_scale,
        )
        self._override_idx = 0

    def _next_override_batch(self):
        """Fixed-set batches: wrap around the override buffer so the
        jitted step keeps its single compiled batch shape."""
        pts, d = self._override
        idx = (self._override_idx
               + np.arange(self.batch_size)) % len(d)
        self._override_idx = int((self._override_idx + self.batch_size)
                                 % len(d))
        return pts[idx], d[idx]

    def train(self, n_steps: int = 1) -> float:
        import queue

        if getattr(self, "_override", None) is not None:
            loss = None
            for _ in range(n_steps):
                pts, d = self._next_override_batch()
                self.params, self.opt_state, loss = self._jit_step(
                    self.params, self.opt_state,
                    jnp.asarray(pts), jnp.asarray(d))
                self.training_step += 1
            return float(loss) if loss is not None else 0.0

        q = self._batch_producer()
        loss = None
        last = None
        for _ in range(n_steps):
            try:
                # reuse the last batch if the producer hasn't caught up
                # (a TPU-side step is much faster than host BVH queries)
                last = q.get(block=last is None, timeout=300.0)
            except queue.Empty:
                if last is None:
                    # producer stalled on the very first batch: fall
                    # back to synchronous generation rather than crash
                    last = self.generate_training_batch()
            pts, d = last
            self.params, self.opt_state, loss = self._jit_step(
                self.params, self.opt_state, jnp.asarray(pts), jnp.asarray(d)
            )
            self.training_step += 1
        return float(loss) if loss is not None else 0.0

    # ------------------------------------------------------------------
    @property
    def inference_params(self):
        return self.opt.inference_params(self.opt_state, self.params)

    def sdf(self, points: np.ndarray) -> np.ndarray:
        out = []
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        chunk = 1 << 18
        params = self.inference_params
        n = len(pts)
        n_pad = (n + chunk - 1) // chunk * chunk
        pts = np.pad(pts, ((0, n_pad - n), (0, 0)))
        for i in range(0, n_pad, chunk):
            out.append(np.asarray(self._jit_infer(params, jnp.asarray(pts[i : i + chunk]))))
        return np.concatenate(out)[:n]

    def calculate_iou(self, n_samples: int = 1 << 21) -> float:
        """Sign agreement on uniform samples (reference calculate_iou,
        testbed_sdf.cu:1636-1680)."""
        pts = np.random.default_rng(4242).random((n_samples, 3)).astype(np.float32)
        gt_inside = self.bvh.signed_distance(pts, mode=self.sdf_mode) < 0
        pred_inside = self.sdf(pts) < 0
        inter = np.sum(gt_inside & pred_inside)
        union = np.sum(gt_inside | pred_inside)
        return float(inter) / max(float(union), 1.0)

    # ------------------------------------------------------------------
    def render(
        self,
        width: int,
        height: int,
        camera_matrix: np.ndarray,
        fov: float = 50.0,
        n_trace_steps: int = 96,
        light_dir=(0.4, -0.7, 0.6),
        ground_truth: bool = False,
    ) -> np.ndarray:
        """Sphere-trace the learned SDF → shaded (H, W, 4).

        TPU recast of SphereTracer::trace (testbed_sdf.cu:798-959): all
        rays advance in lockstep inside one jitted while_loop; finished
        rays are masked instead of compacted.
        """
        cam = np.asarray(camera_matrix, np.float32)
        fl = 0.5 * height / math.tan(0.5 * math.radians(fov))
        ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        u = (xs + 0.5) / width - 0.5
        v = (ys + 0.5) / height - 0.5
        dirs = np.stack([u * width / fl, v * height / fl, np.ones_like(u)], -1)
        d = dirs @ cam[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = np.broadcast_to(cam[:, 3], d.shape)

        if ground_truth and self.groundtruth_mode == "spheretracedmesh":
            # ESDFGroundTruthMode::SpheretracedMesh: sphere trace the
            # BVH mesh-SDF instead of raytracing it (common.h:162-165)
            o_f = np.ascontiguousarray(o.reshape(-1, 3), np.float32)
            d_f = d.reshape(-1, 3)
            t = np.zeros(len(o_f), np.float32)
            alive = np.ones(len(o_f), bool)
            for _ in range(n_trace_steps // 2):
                if not alive.any():
                    break
                pos = o_f[alive] + t[alive, None] * d_f[alive]
                dist = self.bvh.signed_distance(
                    np.clip(pos, 0.0, 1.0), mode=self.sdf_mode)
                t[alive] += dist
                done = (np.abs(dist) < 5e-4) | (t[alive] > 2.0)
                idx = np.nonzero(alive)[0]
                alive[idx[done]] = False
            hit = (t < 2.0) & (t > 0)
            pos = o_f + t[:, None] * d_f
            eps = 1e-3
            taps = [self.bvh.signed_distance(
                        np.clip(pos + eps * np.eye(3)[a], 0, 1),
                        mode=self.sdf_mode)
                    - self.bvh.signed_distance(
                        np.clip(pos - eps * np.eye(3)[a], 0, 1),
                        mode=self.sdf_mode) for a in range(3)]
            n = np.stack(taps, -1) / (2 * eps)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            rgb = self._shade(pos, n, d_f, np.asarray(light_dir))
            rgb = np.where(hit[:, None], rgb, 0.0)
            return np.concatenate(
                [rgb, hit[:, None].astype(np.float32)], -1
            ).reshape(height, width, 4)

        if ground_truth:
            t, tri = self.bvh.raytrace(o.reshape(-1, 3), d.reshape(-1, 3))
            hit = np.isfinite(t)
            pos = o.reshape(-1, 3) + t[:, None] * d.reshape(-1, 3)
            tris = self.triangles[np.maximum(tri, 0)]
            n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            rgb = self._shade(pos, n, d.reshape(-1, 3), np.asarray(light_dir))
            rgb = np.where(hit[:, None], rgb, 0.0)
            return np.concatenate([rgb, hit[:, None].astype(np.float32)], -1).reshape(
                height, width, 4
            )

        params = self.inference_params
        rgb, alpha = self._jit_render(
            params, jnp.asarray(o.reshape(-1, 3)), jnp.asarray(d.reshape(-1, 3)),
            jnp.asarray(light_dir, jnp.float32), jnp.int32(n_trace_steps),
        )
        frame = np.concatenate(
            [np.asarray(rgb), np.asarray(alpha)[:, None]], -1
        ).reshape(height, width, 4)
        return frame

    def _shade(self, pos, normal, view, light_dir, shadow=1.0):
        from ..render.brdf import evaluate_shading

        l = np.asarray(light_dir, np.float32)
        l = l / np.linalg.norm(l)
        rgb = evaluate_shading(
            self.brdf.basecolor, (0.25, 0.3, 0.35), np.asarray(self.sun_color),
            self.brdf, l, -np.asarray(view), np.asarray(normal),
        )
        return np.clip(np.asarray(rgb) * np.asarray(shadow).reshape(-1, 1)
                       if np.ndim(shadow) else np.asarray(rgb) * shadow, 0, 1)

    @property
    def _jit_render(self):
        # the traced program bakes these knobs in as constants; rebuild
        # when any changes (render-time settings, not hot-path state)
        knobs = (float(self.zero_offset), bool(self.analytic_normals),
                 float(self.fd_normals_epsilon), bool(self.floor_enable),
                 float(self.floor_y), bool(self.render_shadows),
                 float(self.distance_scale))
        if getattr(self, "_render_knobs", None) != knobs and hasattr(
                self, "_jit_render_fn"):
            del self._jit_render_fn
        self._render_knobs = knobs
        if not hasattr(self, "_jit_render_fn"):
            from functools import partial

            aabb_min, aabb_max = 0.0, 1.0

            def sdf_fn(params, x):
                return (self.model(params, x).astype(jnp.float32)[:, 0]
                        - self.zero_offset) * self.distance_scale

            def render(params, o, d, light, n_steps):
                from ..ops.raymarch import ray_intersect_aabb

                tmin, tmax = ray_intersect_aabb(
                    o, d, jnp.zeros(3), jnp.ones(3)
                )
                hit_box = tmin < tmax

                def body(carry):
                    t, alive, it = carry
                    pos = o + t[:, None] * d
                    dist = sdf_fn(params, pos)
                    t_new = jnp.where(alive, t + dist, t)
                    done = (jnp.abs(dist) < 5e-4) | (t_new > tmax)
                    return (t_new, alive & ~done, it + 1)

                def cond(carry):
                    _, alive, it = carry
                    return jnp.any(alive) & (it < n_steps)

                t, alive, _ = jax.lax.while_loop(
                    cond, body, (tmin, hit_box, jnp.int32(0))
                )
                pos = o + t[:, None] * d
                final = sdf_fn(params, pos)
                hit = hit_box & (jnp.abs(final) < 2e-3) & (t <= tmax)
                if self.floor_enable:
                    # analytic floor plane y = floor_y (reference
                    # advance_pos_kernel_sdf:198-204)
                    t_floor = (self.floor_y - o[:, 1]) / jnp.where(
                        jnp.abs(d[:, 1]) < 1e-9, 1e-9, d[:, 1])
                    floor_hit = (~hit) & (t_floor > 0) & (d[:, 1] < 0)
                    t = jnp.where(floor_hit, t_floor, t)
                    pos = o + t[:, None] * d
                    hit = hit | floor_hit
                else:
                    floor_hit = jnp.zeros_like(hit)

                # normals: autodiff input gradient (exact) or 6-tap
                # finite differences (reference analytic_normals /
                # FiniteDifferenceNormalsApproximator, testbed.h:238-259)
                if self.analytic_normals:
                    grad_fn = jax.vmap(
                        jax.grad(lambda x: self.model(params, x[None])
                                 .astype(jnp.float32)[0, 0])
                    )
                    normal = grad_fn(pos)
                else:
                    eps = self.fd_normals_epsilon
                    taps = []
                    for ax in range(3):
                        e = jnp.zeros(3).at[ax].set(eps)
                        taps.append(sdf_fn(params, pos + e)
                                    - sdf_fn(params, pos - e))
                    normal = jnp.stack(taps, -1) / (2 * eps)
                normal = normal / jnp.maximum(
                    jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
                )
                if self.floor_enable:
                    up = jnp.asarray([0.0, 1.0, 0.0])
                    normal = jnp.where(floor_hit[:, None], up, normal)
                l = light / jnp.linalg.norm(light)

                # soft shadows: sphere trace toward the light tracking
                # iq's min-visibility k·d/t (reference
                # advance_pos_kernel_sdf:207-215 + shadow ray pipeline)
                if self.render_shadows:
                    k = self.shadow_sharpness
                    so = pos + normal * 2e-3

                    def sh_body(carry):
                        st, vis, prev, alive, it = carry
                        sp = so + st[:, None] * l
                        dist = sdf_fn(params, sp)
                        y = dist * dist / (2.0 * jnp.maximum(prev, 1e-6))
                        dd = jnp.sqrt(jnp.maximum(dist * dist - y * y, 0.0))
                        vis_new = jnp.minimum(
                            vis, k * dd / jnp.maximum(st - y, 1e-6))
                        vis = jnp.where(alive, vis_new, vis)
                        st_new = jnp.where(alive, st + dist, st)
                        inb = jnp.all((sp >= 0.0) & (sp <= 1.0), axis=-1)
                        done = (dist < 1e-4) | ~inb
                        return (st_new, vis, jnp.where(alive, dist, prev),
                                alive & ~done, it + 1)

                    def sh_cond(carry):
                        _, _, _, alive, it = carry
                        return jnp.any(alive) & (it < 48)

                    st0 = jnp.full(pos.shape[0], 2e-2)
                    vis0 = jnp.ones(pos.shape[0])
                    prev0 = jnp.full(pos.shape[0], 1e10)
                    _, vis, _, sh_alive, _ = jax.lax.while_loop(
                        sh_cond, sh_body, (st0, vis0, prev0, hit, jnp.int32(0)))
                    # rays whose shadow trace hit the surface are occluded
                    shadow = jnp.clip(vis, 0.0, 1.0)
                else:
                    shadow = jnp.ones(pos.shape[0])

                from ..render.brdf import evaluate_shading

                floorcol = jnp.asarray([0.6, 0.65, 0.7])
                basecol = jnp.asarray(self.brdf.basecolor)
                base = (jnp.where(floor_hit[:, None], floorcol, basecol)
                        if self.floor_enable else
                        jnp.broadcast_to(basecol, pos.shape))
                rgb = evaluate_shading(
                    base, jnp.asarray([0.25, 0.3, 0.35]),
                    jnp.asarray(self.sun_color), self.brdf, l, -d, normal,
                )
                rgb = rgb * shadow[:, None]
                rgb = jnp.where(hit[:, None], jnp.clip(rgb, 0.0, 1.0), 0.0)
                return rgb, hit.astype(jnp.float32)

            self._jit_render_fn = jax.jit(render)
        return self._jit_render_fn
