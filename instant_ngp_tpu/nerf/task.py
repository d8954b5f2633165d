"""NeRF training + rendering orchestration (the flagship primitive).

Maps the reference's train_nerf / render_nerf pipelines
(testbed_nerf.cu:2704-3382, 1894-2150) onto TPU-native JAX:

  * train step = one jit program: pick (image, pixel) pairs → generate
    rays (lens + xform) → occupancy march (lax.scan, sampler.py) →
    NerfNetwork forward on (R, K) sample buckets → parallel
    alpha-compositing via cumulative sums (no suffix-trick kernels;
    autodiff through the cumsum *is* the reference's analytic gradient)
    → Huber/5 loss vs premultiplied-linear targets with random
    background, sRGB conventions of compute_loss_kernel_train_nerf
    (testbed_nerf.cu:852-1180) → Adam update.
  * density-grid update every 16 steps (occupancy.update_grid).
  * rendering = windowed marching: march a K-sample window, composite,
    repeat while any ray alive (the compact-loop of NerfTracer::trace
    recast as fixed windows with masked accumulation).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..common import (
    MIN_CONE_STEPSIZE,
    NERF_CASCADES,
    NERF_GRIDSIZE,
    NERF_MIN_OPTICAL_THICKNESS,
    NerfActivation,
    linear_to_srgb,
    network_to_density,
    network_to_rgb,
    srgb_to_linear,
    warp_direction,
)
from ..io.nerf_loader import NerfDataset
from ..models.factory import autoconfig_grid_encoding
from ..models.nerf_network import NerfNetwork
from ..ops.losses import loss_fn, loss_type_from_string
from ..ops.optimizers import optimizer_from_config
from .occupancy import OccupancyGridState, init_grid, mark_untrained_cells, update_grid
from .sampler import MarchConfig, march_rays

EPS_T = 1e-4  # transmittance early-stop (reference EPSILON, testbed_nerf.cu:919)


@dataclasses.dataclass
class NerfTrainState:
    params: dict
    opt_state: dict
    grid: OccupancyGridState
    cam: dict  # pose/exposure/focal/latent offsets (may be empty)
    cam_opt: dict
    error_map: jax.Array  # (n_images, EH, EW) accumulated ray losses
    # max-sharpness-seen per occupancy cell (reference sharpness_grid,
    # testbed_nerf.cu:2709-2723); None unless include_sharpness_in_error
    sharp_grid: Optional[jax.Array] = None


jax.tree_util.register_dataclass(
    NerfTrainState,
    data_fields=["params", "opt_state", "grid", "cam", "cam_opt", "error_map",
                 "sharp_grid"],
    meta_fields=[],
)

MIN_PDF = 0.01  # per-axis CDF smoothing (reference MIN_PDF, testbed_nerf.cu)
MIN_PMF_IMG = 0.1  # image-CDF smoothing (reference MIN_PMF)


def _error_map_res(n_rays_per_batch: int, n_images: int, img_res) -> tuple[int, int]:
    """Error-map resolution from the ray budget (reference
    testbed_nerf.cu:2754-2758: sqrt(sqrt(samples_per_image))·3.5,
    clamped to the image resolution). The reference re-sizes as its
    rebuild interval grows ×1.5; static shapes want one size, so we
    evaluate the formula at the mid-schedule interval (~650 steps)."""
    n_samples_per_image = 648 * n_rays_per_batch / max(n_images, 1)
    r = int(math.sqrt(math.sqrt(n_samples_per_image)) * 3.5)
    w, h = img_res
    return (max(8, min(r, h, 128)), max(8, min(r, w, 128)))


class NerfTask:
    def __init__(
        self,
        dataset: NerfDataset,
        config: dict,
        seed: int = 1337,
        target_batch_size: int = 1 << 18,
        n_rays_per_batch: int = 1 << 13,
        max_samples_per_ray: int = 48,
        n_march_iters: int = 256,
        optimize_extrinsics: bool = False,
        optimize_exposure: bool = False,
        optimize_focal_length: bool = False,
        optimize_distortion: bool = False,
        train_envmap: bool = False,
        envmap_resolution: tuple = (128, 256),
        use_error_map: bool = True,
        include_sharpness_in_error: bool = False,
    ):
        self.dataset = dataset
        self.config = dict(config)
        self.optimize_extrinsics = optimize_extrinsics
        self.optimize_exposure = optimize_exposure
        self.optimize_focal_length = optimize_focal_length
        self.optimize_distortion = optimize_distortion
        self.train_envmap = train_envmap
        self.envmap_resolution = envmap_resolution
        self.use_error_map = use_error_map
        # the reference splits importance sampling into two flags
        # (testbed.h:810-811); both ride use_error_map here by default.
        # Changing them invalidates compiled step programs — call
        # rebuild_jit_programs() after toggling mid-run.
        self.sample_image_proportional_to_error = use_error_map
        self.sample_focal_plane_proportional_to_error = use_error_map
        # occupancy-grid EMA decay (reference m_nerf.training.
        # density_grid_decay = 0.95, testbed_nerf.cu:316-338; pyngp
        # testbed.nerf.training.density_grid_decay)
        self.density_grid_decay = 0.95
        # per-image latent codes train whenever present (reference
        # optimize_extra_dims, testbed.h:802); False zeroes their grads
        self.optimize_extra_dims = dataset.n_extra_learnable_dims > 0
        # pyngp shall_train_encoding / shall_train_network (GUI
        # freeze toggles): pinned after the optimizer step; changing
        # them needs rebuild_jit_programs()
        self.shall_train_encoding = True
        self.shall_train_network = True
        # per-group camera regularization (reference testbed.h:788-789)
        self.exposure_l2_reg = 0.0
        self.intrinsic_l2_reg = 1e-4
        # render-time latent source (pyngp python_api.cu:725-745):
        # >=0 → that training view's latents; -1 → the explicit vector
        self.rendering_extra_dims_from_training_view = 0
        self._rendering_extra_dims = None
        # kept for pyngp API compat (testbed.h:807): the reference
        # accumulates camera gradients for N steps then applies a host
        # Adam step; here autodiff camera params update every step
        # inside the jitted program, so cadence is not applicable
        self.n_steps_between_cam_updates = 16

        # AABB from aabb_scale (reference load_nerf_post,
        # testbed_nerf.cu:2425-2440): unit cube inflated around center.
        aabb_scale = dataset.aabb_scale
        half = 0.5 * min(1 << (NERF_CASCADES - 1), aabb_scale)
        self.aabb_min = np.array([0.5 - half] * 3, np.float32)
        self.aabb_max = np.array([0.5 + half] * 3, np.float32)
        self.max_cascade = 0
        while (1 << self.max_cascade) < aabb_scale:
            self.max_cascade += 1
        self.cone_angle = 0.0 if aabb_scale <= 1 else 1.0 / 256.0

        self.config["encoding"] = autoconfig_grid_encoding(
            self.config.get("encoding", {}), "nerf", aabb_scale=aabb_scale
        )
        self.model = NerfNetwork.from_config(
            self.config, n_extra_dims=dataset.n_extra_learnable_dims
        )
        # LDR datasets train in sRGB space with logistic rgb activation;
        # HDR uses exponential (reference testbed_nerf.cu:2354).
        self.rgb_activation = (
            NerfActivation.EXPONENTIAL if dataset.is_hdr else NerfActivation.LOGISTIC
        )
        self.density_activation = NerfActivation.EXPONENTIAL
        self.loss = loss_fn(
            loss_type_from_string(self.config.get("loss", {}).get("otype", "Huber"))
        )
        self.march_cfg = MarchConfig(
            n_march_iters=n_march_iters,
            max_samples_per_ray=max_samples_per_ray,
            cone_angle=self.cone_angle,
            max_mip=self.max_cascade,
        )
        self.n_rays_per_batch = n_rays_per_batch
        self.target_batch_size = target_batch_size
        # adaptive ray-count cap (log2): every bucket shape compiles
        # each train program once, so the set is kept small by default
        self.max_ray_bucket_log2 = 13
        self.random_bg_color = True
        self.snap_to_pixel_centers = True
        # depth supervision (reference depth_supervision_lambda,
        # compute_loss_kernel_train_nerf:1027-1031) — active when the
        # dataset ships depth maps
        self.depth_supervision_lambda = 1.0 if dataset.depths is not None else 0.0
        # near-camera density penalty distance (reference
        # m_nerf.training.near_distance = 0.1, testbed.h:817; the loss
        # kernel adds 1e-4 L1 on density logits of samples closer than
        # this, testbed_nerf.cu:1133)
        self.training_near_distance = 0.1
        # Valid-sample compaction capacity for the network evaluation
        # in training (reference: the sample buffer is target_batch
        # sized and rays that overflow it are dropped,
        # generate_training_samples_nerf testbed_nerf.cu:770-780).
        # The (R, K) ray-window layout is ~half invalid samples; the
        # network+table-backward run on the compacted valid prefix
        # (ops/compaction.py) at half the cost.
        self.compact_samples: int | None = target_batch_size // 2
        # per-ray rand-level coarse-to-fine training (reference
        # m_max_level_rand_training, default false — GUI "rand levels")
        self.max_level_rand_training = False
        # training mode: "nerf" | "rfl" | "rflrelax" (reference
        # ETrainMode, common.h:40-52; scripts/run.py:225-242 schedules
        # switch modes mid-training — a static jit arg here, so each
        # mode compiles once and switching is free)
        self.train_mode = "nerf"
        # L1 density regularizers (reference testbed_nerf.cu:1075-1134),
        # on by default like the reference. Round-1 had the foggy-phase
        # term's SIGN inverted (pushed logits down instead of pulling
        # negative logits up toward 0) and scaled it ~100× too high —
        # that is what destabilized training; the faithful form
        # (raw per-sample grad, ÷ loss_scale 128) is self-limiting.
        self.density_reg_scale = 1.0

        key = jax.random.PRNGKey(seed)
        params = self.model.init(key)
        opt = optimizer_from_config(
            self.config.get("optimizer", {}), matrix_mask=self.model.matrix_mask(params)
        )
        self.opt = opt

        grid = init_grid(self.max_cascade + 1)
        # visibility culling (reference mark_untrained_density_grid),
        # cached on disk keyed by the camera setup (pure function of it)
        import hashlib
        from pathlib import Path

        h = hashlib.sha1()
        for arr in (dataset.xforms_start, dataset.focal_lengths, dataset.principal_points):
            h.update(np.ascontiguousarray(arr).tobytes())
        h.update(str((dataset.resolution, self.max_cascade)).encode())
        cache_dir = Path(__file__).resolve().parents[2] / ".jax_cache"
        cache_file = cache_dir / f"culled_{h.hexdigest()[:16]}.npy"
        if dataset.rays is not None:
            culled = jnp.zeros(
                (self.max_cascade + 1, NERF_GRIDSIZE, NERF_GRIDSIZE,
                 NERF_GRIDSIZE), jnp.float32)
        elif cache_file.exists():
            culled = jnp.asarray(np.load(cache_file))
        else:
            culled = mark_untrained_cells(
                self.max_cascade + 1,
                dataset.resolution,
                dataset.focal_lengths,
                dataset.xforms_start,
                dataset.principal_points,
            )
            try:
                cache_dir.mkdir(exist_ok=True)
                np.save(cache_file, np.asarray(culled))
            except OSError:
                pass
        grid = dataclasses.replace(grid, density=culled)

        # camera-optimization params (reference reset_network:
        # cam_pos/rot offsets Adam 1e-4, exposure 1e-3, focal 1e-5,
        # per-image latent "extra dims"; testbed.cu:4268-4276)
        n_img = dataset.n_images
        cam = {
            "rot": jnp.zeros((n_img, 3)),
            "pos": jnp.zeros((n_img, 3)),
            "exposure": jnp.zeros((n_img, 3)),
            "focal": jnp.zeros((2,)),
        }
        if dataset.n_extra_learnable_dims > 0:
            cam["extra"] = 0.1 * jax.random.normal(
                jax.random.PRNGKey(seed ^ 0xE17A),
                (n_img, dataset.n_extra_learnable_dims),
            )
        if optimize_distortion:
            # trainable 32×32 uv-offset map (reference distortion_map,
            # configs/nerf/base.json distortion_map.resolution)
            cam["distortion"] = jnp.zeros((32, 32, 2))
        if train_envmap:
            # trainable lat-long RGBA envmap (reference TrainableBuffer
            # envmap, testbed.cu:4391-4409)
            eh_e, ew_e = envmap_resolution
            cam["envmap"] = jnp.zeros((eh_e, ew_e, 4))
        from ..ops.optimizers import Optimizer, OptimizerSpec

        # l2 (extrinsic_l2_reg) applies to rot/pos ONLY — the reference
        # regularizes per group (testbed.h:785-789); exposure/focal get
        # their own decoupled decay in _train_step
        self.cam_opt = Optimizer(OptimizerSpec(
            learning_rate=1e-4, beta1=0.9, beta2=0.99, epsilon=1e-8, l2_reg=0.0,
            decay_start=0, decay_interval=2048, decay_base=0.33,
        ), matrix_mask={k: k in ("rot", "pos") for k in cam})
        self.error_map_res = _error_map_res(
            n_rays_per_batch, n_img, dataset.resolution
        )
        eh, ew = self.error_map_res
        sharp_grid = None
        if include_sharpness_in_error:
            sharp_grid = jnp.zeros(
                (NERF_CASCADES, NERF_GRIDSIZE, NERF_GRIDSIZE, NERF_GRIDSIZE),
                jnp.float32,
            )
        self.include_sharpness_in_error = include_sharpness_in_error
        self.state = NerfTrainState(
            params=params, opt_state=opt.init(params), grid=grid,
            cam=cam, cam_opt=self.cam_opt.init(cam),
            error_map=jnp.zeros((n_img, eh, ew)),
            sharp_grid=sharp_grid,
        )
        # inverse-CDF sampling state (reference error_map.cdf_*,
        # testbed_nerf.cu:2791-2859): rebuilt from the accumulated map
        # every `interval` steps, interval grows ×1.5 per rebuild
        self._cdf_x = jnp.full((n_img, eh, ew), 0.0)
        self._cdf_y = jnp.zeros((n_img, eh))
        self._cdf_img = jnp.zeros((n_img,))
        self._pmf_img = jnp.full((n_img,), 1.0 / n_img)
        self._cdf_valid = False
        self._err_interval = 128  # reference n_steps_between_error_map_updates
        self._err_steps_since = 0

        # device-resident dataset tensors
        # NB: kept in a dict passed as a jit *argument* — capturing
        # these by closure would embed the full image stack as an HLO
        # constant (hundreds of MB shipped to the compiler per compile).
        self.data = {
            "images": jnp.asarray(dataset.images),  # (N,H,W,4) uint8 or f16
            "xforms": jnp.asarray(dataset.xforms_start),
            "focals": jnp.asarray(dataset.focal_lengths),
            "principals": jnp.asarray(dataset.principal_points),
        }
        # rolling shutter / motion blur: per-scanline camera slerp
        # between xform_start and xform_end (reference
        # get_xform_given_rolling_shutter, common_device.cuh:670-674;
        # training ray gen testbed_nerf.cu:740-756)
        self.has_motion = bool(
            not np.allclose(dataset.xforms_start, dataset.xforms_end)
            or np.any(np.asarray(dataset.rolling_shutter) != 0)
        )
        if self.has_motion:
            self.data["xforms_end"] = jnp.asarray(dataset.xforms_end)
            self.data["rolling_shutter"] = jnp.asarray(
                dataset.rolling_shutter, jnp.float32
            )
        if dataset.depths is not None:
            self.data["depths"] = jnp.asarray(dataset.depths, jnp.float32)
        if dataset.per_image_resolution is not None:
            self.data["img_wh"] = jnp.asarray(
                dataset.per_image_resolution, jnp.int32)
        if dataset.rays is not None:
            self.data["rays"] = jnp.asarray(dataset.rays, jnp.float32)
            # reference: supplied rays zero the near distance and skip
            # frustum-based visibility culling (testbed_nerf.cu:2381,
            # :2506 — arbitrary rays defeat the camera-cone test)
            self.training_near_distance = 0.0
        if include_sharpness_in_error:
            self.data["sharpness"] = jnp.asarray(
                dataset.compute_sharpness_maps(), jnp.float32
            )  # (N, 72, 128)

        # corner-sampling anneal: stochastic single-corner hashed
        # gradients early (~1.6x faster steps), exact corners after
        # this step. Measured on fox: the stochastic estimator's noise
        # floor caps PSNR ~24 dB (and training DEGRADES past ~900
        # steps). Round-3 A/B with simplex + cheap grid updates
        # (scripts + docs/ROUND3_NOTES.md): switching at 256 beats 512
        # by +0.2-0.35 dB at EVERY step count for only ~14 s of extra
        # exact-phase time — the sto phase's only job is surviving the
        # chaotic first few hundred steps cheaply. None = never switch.
        # (hashed_grad_corners also supports k-draw middle phases.)
        self.exact_corners_after: int | None = 256
        # failure detection & numerics guards (SURVEY §5: the
        # checkify analog — cheap host-side, on the already-fetched
        # loss scalar; reference aborts training on zero samples)
        self.training_aborted = False
        self.debug_check_numerics = False
        # render early-stop transmittance (reference
        # m_nerf.m_minimum_transmittance / run.py eval 1e-4); traced as
        # a runtime scalar so changing it does not recompile
        self.min_transmittance = EPS_T
        # per-round march iteration budget for rendering (see
        # _march_window); more rounds but far less lockstep waste
        self.render_march_iters = 64
        # density-grid update cadence (reference
        # n_training_steps_between_grid_updates = 16)
        self.grid_update_interval = 16
        # render sample-window size per round: SMALL on purpose (the
        # reference marches 1-8 steps between compactions,
        # testbed_nerf.cu:1755-1760) — with a K=32 window a whole
        # frame's first round evaluates R·32 samples even though most
        # rays saturate opacity after a handful; K=8 lets early
        # termination kill rays before the network pays for the rest
        self.render_samples_per_window = 8
        # baked-cache render mode (nerf/baked.py): one 64 B bf16 row
        # per sample instead of the full model → eval is ~10× cheaper,
        # so the window can be wider (fewer rounds, less host sync)
        self.baked_samples_per_window = 16
        self.baked_res0 = 256
        self._baked_cache = None  # (key, BakedCache)
        # slab-sweep renderer (nerf/slab.py) state
        self._slab_cache = None  # (key, DenseVolumes)
        self.slab_res0 = 256
        # outer cascades bake at 2^m× coarser world density than the
        # finest — 192³ halves their voxel blur vs the 128³ occupancy
        # grid for ~3× the outer bake cost
        self.slab_res_outer = 192
        # eye-centered clipmap: finest level extent in world units —
        # bounds how close to the camera content stays sharp
        # (slab.clipmap_boxes)
        self.slab_finest_extent = 0.25
        self.slab_bake_view_dependent = False
        # deferred view dependence (SNeRG split, slab.make_deferred_decode):
        # bake PCA-projected density-MLP features alongside diffuse rgb,
        # decode per PIXEL with the exact rgb head — view-dependent
        # shading from ONE bake, no per-camera rebake
        self.slab_deferred_vd = True
        self.slab_n_feat = 3
        self._slab_feat_proj = None   # frozen (mu, sd, P) PCA basis
        self._slab_decode = None      # jitted decoder (lazy)
        self._slab_decode_params = None  # (rgb_net, dir_enc) at bake step
        self._voxel_eval_feat = None
        # render-space controls (reference render_aabb crop box
        # testbed.h:708, near distance, DoF aperture/focus
        # init_rays_with_payload_kernel_nerf testbed_nerf.cu:1414-1528)
        self.render_aabb_min = np.array(self.aabb_min)
        self.render_aabb_max = np.array(self.aabb_max)
        if dataset.render_aabb is not None:
            # dataset crop INTERSECTS the scene aabb; an empty box means
            # no crop (reference testbed_nerf.cu:2427-2431)
            lo = np.maximum(np.asarray(dataset.render_aabb[0], np.float32),
                            self.render_aabb_min)
            hi = np.minimum(np.asarray(dataset.render_aabb[1], np.float32),
                            self.render_aabb_max)
            if (hi > lo).all():
                self.render_aabb_min = lo
                self.render_aabb_max = hi
        # rotated crop box: a point p is cropped-in iff
        # render_aabb.contains(render_aabb_to_local @ p) (reference
        # m_render_aabb_to_local, testbed.h:709; ray clip
        # testbed_nerf.cu:1472). Identity = axis-aligned fast path.
        self.render_aabb_to_local = np.eye(3, dtype=np.float32)
        ds_rot = getattr(dataset, "render_aabb_to_local", None)
        if ds_rot is not None:
            self.render_aabb_to_local = np.asarray(ds_rot, np.float32)
        # depth-supervision loss shape (reference depth_loss_type,
        # testbed.h:796, default L1); change via pyngp setter which
        # rebuilds the jit programs
        self.depth_loss_type = "L1"
        self.render_near_distance = 0.0
        self.aperture_size = 0.0
        self.focus_z = 1.0
        self.training_step = 0
        self._key = jax.random.PRNGKey(seed ^ 0xBEEF)
        self._loss_ema = None
        # Optional device mesh: when set, ray batches are sharded along
        # its 'data' axis inside the jitted train step (params + grid
        # replicated; XLA inserts the gradient all-reduce over ICI).
        self.mesh = None

        self._n_rays_current = n_rays_per_batch
        self.rebuild_jit_programs()

    def _prep_rays(self, uv, wh, fl, pp, xform):
        """Jitted pinhole/lens ray generation for rendering (one
        dispatch instead of ~10 eager ops — each eager dispatch costs
        ~ms through the tunneled device)."""
        from ..common import LensMode
        from ..render.camera import uv_to_ray_cam

        R = uv.shape[0]
        dir_cam, o_off = uv_to_ray_cam(
            uv, (wh[0], wh[1]),
            jnp.broadcast_to(fl[None, :], (R, 2)),
            jnp.broadcast_to(pp[None, :], (R, 2)),
            lens_mode=LensMode(self.dataset.lens_mode),
            lens_params=jnp.asarray(self.dataset.lens_params),
        )
        d = dir_cam @ xform[:, :3].T
        o = jnp.broadcast_to(xform[:, 3], d.shape) + o_off @ xform[:, :3].T
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        # render-loop init (reference init_rays_from_camera): clip to
        # the render crop box + near plane
        tmin, tmax = self._crop_tminmax(o, d)
        tmin = jnp.maximum(tmin, self.render_near_distance)
        return o, d, tmin, tmax

    def _crop_tminmax(self, o, d):
        """Ray interval inside scene AABB ∩ (possibly rotated) render
        crop box. The crop box is axis-aligned in the frame reached by
        render_aabb_to_local (reference render_aabb_to_local clip,
        testbed_nerf.cu:1472); both boxes are convex so the in-both
        interval is the intersection of the two entry/exit intervals."""
        rot = np.asarray(self.render_aabb_to_local, np.float32)
        tmin, tmax = _aabb_entry(o, d, jnp.asarray(self.aabb_min),
                                 jnp.asarray(self.aabb_max))
        crop_min = jnp.asarray(self.render_aabb_min)
        crop_max = jnp.asarray(self.render_aabb_max)
        if not np.allclose(rot, np.eye(3)):
            rot_j = jnp.asarray(rot)
            o_l, d_l = o @ rot_j.T, d @ rot_j.T
        else:
            o_l, d_l = o, d
        t2min, t2max = _aabb_entry(o_l, d_l, crop_min, crop_max)
        return jnp.maximum(tmin, t2min), jnp.minimum(tmax, t2max)

    def _gather_ray_state(self, arrs, take):
        """Jitted alive-ray compaction gather (device-side; the numpy
        round-trip cost ~10 eager transfers per compaction)."""
        return tuple(jnp.take(a, take, axis=0) for a in arrs)

    def _jit_fingerprint(self):
        """Hashable digest of every attribute the jitted programs bake
        in at trace time. Two real bugs in two rounds came from
        mutating one of these without rebuild_jit_programs() (the
        round-3 bake dt_scale capture; see ROUND3_NOTES "Gotchas") —
        train()/render() now compare this against the fingerprint
        captured at the last rebuild and RETRACE automatically on
        mismatch, making that bug class structurally impossible."""
        return (
            repr(self.march_cfg),
            repr(self.model),  # covers the corner-anneal model swap
            self.compact_samples,
            str(self.rgb_activation), str(self.density_activation),
            self.train_mode,
            getattr(self, "_loss_type_name", None),
            self.use_error_map,
            self.sample_image_proportional_to_error,
            self.sample_focal_plane_proportional_to_error,
            self.optimize_extrinsics, self.optimize_exposure,
            self.optimize_focal_length, self.optimize_distortion,
            self.optimize_extra_dims,
            self.shall_train_encoding, self.shall_train_network,
            self.random_bg_color, self.snap_to_pixel_centers,
            self.max_level_rand_training,
            float(self.depth_supervision_lambda),
            getattr(self, "depth_loss_type", "L1"),
            float(self.training_near_distance),
            float(self.density_reg_scale),
            self.render_samples_per_window, self.baked_samples_per_window,
            self.render_march_iters,
            self.aabb_min.tobytes(), self.aabb_max.tobytes(),
            np.asarray(self.render_aabb_min, np.float32).tobytes(),
            np.asarray(self.render_aabb_max, np.float32).tobytes(),
            np.asarray(self.render_aabb_to_local, np.float32).tobytes(),
            float(self.render_near_distance),
            str(self.dataset.lens_mode),
            np.asarray(self.dataset.lens_params, np.float32).tobytes(),
            id(self.mesh),
        )

    def _ensure_fresh_jit(self):
        """Retrace if any trace-time attribute changed since the last
        rebuild (costs a short tuple compare per call)."""
        if self._jit_fingerprint() != self._jit_built_for:
            self.rebuild_jit_programs()

    def rebuild_jit_programs(self):
        """(Re)create the jitted program wrappers. jax.jit caches
        compiled programs keyed on ARGUMENTS — mutating self.model /
        self.march_cfg after the first call is silently ignored by the
        existing wrappers. train()/render() call _ensure_fresh_jit()
        which invokes this automatically when the config fingerprint
        drifts; explicit calls remain harmless."""
        self._jit_built_for = self._jit_fingerprint()
        self._jit_train_step = jax.jit(
            self._train_step, static_argnames=("n_rays", "use_cdf", "mode")
        )
        self._jit_update_grid = jax.jit(self._update_grid, static_argnames=("full",))
        self._jit_render_round = jax.jit(
            self._render_round, static_argnames=("compact",)
        )
        self._jit_march_window = jax.jit(
            self._march_window, static_argnames=("window", "dt_scale"))
        self._jit_render_round_baked = jax.jit(
            self._render_round_baked, static_argnames=("dt_scale",))
        self._jit_render_round_baked2 = jax.jit(
            self._render_round_baked2, static_argnames=("dt_scale",))
        self._bake_eval = None  # model may have changed; rebuild lazily
        self._jit_eval_composite = jax.jit(
            self._eval_and_composite, static_argnames=("compact", "fast")
        )
        self._jit_prep_rays = jax.jit(self._prep_rays)
        self._jit_gather_ray_state = jax.jit(self._gather_ray_state)
        # per-resolution device-side pixel-grid ray generators (slab
        # path); closures capture self._prep_rays so they must be
        # rebuilt whenever the jit programs are
        self._grid_ray_cache = {}

    # ------------------------------------------------------------------
    # data access
    # ------------------------------------------------------------------
    def _read_pixels(self, data, img_idx, uv):
        """Nearest-pixel read → premultiplied-linear RGBA (reference
        read_rgba, common_device.cuh:846-869)."""
        w, h = self.dataset.resolution
        if "img_wh" in data:  # mixed-resolution dataset: per-image size
            w = data["img_wh"][img_idx, 0]
            h = data["img_wh"][img_idx, 1]
        px = jnp.clip(jnp.floor(uv[:, 0] * w).astype(jnp.int32), 0,
                      jnp.asarray(w - 1))
        py = jnp.clip(jnp.floor(uv[:, 1] * h).astype(jnp.int32), 0,
                      jnp.asarray(h - 1))
        raw = data["images"][img_idx, py, px]  # (R, 4)
        if self.dataset.is_hdr:
            return raw.astype(jnp.float32), jnp.ones(raw.shape[0], bool)
        rgba = raw.astype(jnp.float32) / 255.0
        # magenta+alpha0 marks masked-away pixels (reference read_rgba
        # returns negative for 0x00FF00FF, common_device.cuh:852-855)
        masked = (
            (raw[:, 0] == 255) & (raw[:, 1] == 0) & (raw[:, 2] == 255) & (raw[:, 3] == 0)
        )
        rgb = srgb_to_linear(rgba[:, :3]) * rgba[:, 3:4]
        return jnp.concatenate([rgb, rgba[:, 3:4]], axis=-1), ~masked

    def _generate_rays(self, data, img_idx, uv, cam=None, motion_time=None):
        """uv → world ray with the dataset's lens model (reference
        uv_to_ray, common_device.cuh:268-527), optionally perturbed by
        trainable camera offsets (pose/focal optimization — gradients
        flow through here via autodiff, replacing the reference's
        hand-written ray-differentiation kernels)."""
        from ..common import LensMode
        from ..render.camera import camera_slerp, so3_exp, uv_to_ray_cam

        if "rays" in data:
            # per-pixel supplied rays (reference dataset.has_rays:
            # lens/xform ray gen is bypassed, testbed_nerf.cu:2381)
            wi, hi = self.dataset.resolution
            px = jnp.clip((uv[:, 0] * wi).astype(jnp.int32), 0, wi - 1)
            py = jnp.clip((uv[:, 1] * hi).astype(jnp.int32), 0, hi - 1)
            r = data["rays"][img_idx, py, px]  # (R, 6)
            o = r[:, :3]
            d = r[:, 3:]
            d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
            return o, d
        w, h = self.dataset.resolution
        if "img_wh" in data:  # mixed-resolution dataset: per-image size
            w = data["img_wh"][img_idx, 0].astype(jnp.float32)
            h = data["img_wh"][img_idx, 1].astype(jnp.float32)
        focal = data["focals"][img_idx]  # (R,2)
        pp = data["principals"][img_idx]
        xform = data["xforms"][img_idx]  # (R,3,4)
        if self.has_motion and "xforms_end" in data:
            # per-ray shutter time: rs.x + rs.y·u + rs.z·v + rs.w·rand
            rs = data["rolling_shutter"][img_idx]  # (R,4)
            if motion_time is None:
                motion_time = jnp.zeros(uv.shape[0])
            pixel_t = jnp.clip(
                rs[:, 0] + rs[:, 1] * uv[:, 0] + rs[:, 2] * uv[:, 1]
                + rs[:, 3] * motion_time,
                0.0, 1.0,
            )
            xform = camera_slerp(xform, data["xforms_end"][img_idx], pixel_t)
        if cam is not None and self.optimize_focal_length:
            focal = focal * (1.0 + cam["focal"])[None, :]
        dir_cam, o_off = uv_to_ray_cam(
            uv, (w, h), focal, pp,
            lens_mode=LensMode(self.dataset.lens_mode),
            lens_params=jnp.asarray(self.dataset.lens_params),
        )
        if cam is not None and "distortion" in cam:
            # trainable screen-space distortion offsets, bilinear at uv
            # (reference applies distortion.at_lerp(uv) to dir.xy)
            from ..image_fit.task import bilinear_read

            off = bilinear_read(cam["distortion"], uv)  # (R,2)
            dir_cam = dir_cam.at[:, :2].add(off)
        R_mat = xform[:, :, :3]
        o = xform[:, :, 3]
        if cam is not None and self.optimize_extrinsics:
            R_off = so3_exp(cam["rot"][img_idx])  # (R,3,3)
            R_mat = jnp.einsum("rij,rjk->rik", R_off, R_mat)
            o = o + cam["pos"][img_idx]
        d = jnp.einsum("rij,rj->ri", R_mat, dir_cam)
        o = o + jnp.einsum("rij,rj->ri", R_mat, o_off)
        # F-theta marks degenerate pixels with d=0 → keep them 0 (the
        # marcher then emits no samples ≙ reference Ray::invalid)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        return o, d

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _composite(self, params, o, d, ts, dts, valid, bg_srgb, max_level=None,
                   extra=None, compact: int | None = None):
        """Forward + parallel compositing. Returns per-ray rgb and aux.

        With `compact` set, the network only evaluates the valid-sample
        prefix (capacity `compact`); valid samples that overflow the
        capacity are dropped exactly like the reference's full sample
        buffer (testbed_nerf.cu:770-780).
        """
        R, K = ts.shape
        pos = o[:, None, :] + ts[..., None] * d[:, None, :]  # (R,K,3)
        # warp into [0,1] over the training AABB
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_size = jnp.asarray(self.aabb_max - self.aabb_min)
        pos_w = (pos - aabb_min) / aabb_size
        dir_w = warp_direction(d)  # (R,3)
        dirs = jnp.broadcast_to(dir_w[:, None, :], pos.shape)

        extra_s = None
        if extra is not None:
            extra_s = jnp.broadcast_to(
                extra[:, None, :], (R, K, extra.shape[-1])
            ).reshape(R * K, -1)

        # per-ray coarse-to-fine level cap → per-sample (reference
        # rand-levels training, testbed_nerf.cu:738,843-846)
        if max_level is not None and jnp.ndim(max_level) == 1:
            max_level = jnp.broadcast_to(max_level[:, None], (R, K)).reshape(R * K)

        M = R * K
        if compact is not None and compact < M:
            from ..ops.compaction import (
                compact_gather,
                expand_gather,
                prefix_compaction_maps,
            )

            # march validity is a per-ray prefix → CSR-style maps (no
            # searchsorted; it cost ~20 ms at 2^17 capacity)
            maps = prefix_compaction_maps(jnp.sum(valid, -1), K, compact)
            pos_c = compact_gather(pos_w.reshape(M, 3), maps.src, maps.dest, maps.kept)
            dir_c = compact_gather(dirs.reshape(M, 3), maps.src, maps.dest, maps.kept)
            extra_c = None
            if extra_s is not None:
                extra_c = compact_gather(extra_s, maps.src, maps.dest, maps.kept)
            maxl_c = max_level
            if max_level is not None and jnp.ndim(max_level) == 1:
                maxl_c = jnp.take(max_level, maps.src)  # no grad flows via levels
            out_c = self.model(
                params, pos_c, dir_c, extra=extra_c, max_level=maxl_c
            ).astype(jnp.float32)
            out = expand_gather(
                out_c, maps.src, maps.dest, maps.kept, maps.n_valid
            ).reshape(R, K, 4)
            valid = valid & maps.kept.reshape(R, K)
        else:
            out = self.model(
                params, pos_w.reshape(M, 3), dirs.reshape(M, 3),
                extra=extra_s, max_level=max_level,
            ).reshape(R, K, 4)
        rgb = network_to_rgb(out[..., :3].astype(jnp.float32), self.rgb_activation)
        sigma_logit = out[..., 3].astype(jnp.float32)
        sigma = network_to_density(sigma_logit, self.density_activation)
        sigma = jnp.where(valid, sigma, 0.0)

        tau = sigma * dts  # optical thickness per sample
        alpha = 1.0 - jnp.exp(-tau)
        T = jnp.exp(-jnp.cumsum(tau, axis=-1) + tau)  # T before sample i
        weight = alpha * T
        rgb_ray = jnp.sum(weight[..., None] * rgb, axis=1)  # (R,3)
        depth_ray = jnp.sum(weight * ts, axis=1)
        T_final = jnp.exp(-jnp.sum(tau, axis=-1))
        sample_aux = {  # per-sample fields (RFL losses, diagnostics)
            "rgb": rgb, "alpha": alpha, "T_before": T, "valid": valid,
        }
        # background only if the ray never early-terminated (reference
        # adds T*bg when compacted==numsteps; T<EPS means terminated)
        rgb_ray = rgb_ray + jnp.where(T_final >= EPS_T, T_final, 0.0)[:, None] * bg_srgb
        return rgb_ray, depth_ray, weight, (T_final, sigma_logit, sample_aux)

    def _sample_pixels(self, data, key, R, use_cdf: bool):
        """Pick (image, uv) pairs and their sampling pdf (relative to
        uniform). Faithful port of the reference protocol: the image is
        drawn from the smoothed image CDF (MIN_PMF mix) and the pixel
        from per-image 2D conditional CDFs with a 50% uniform fraction
        (nerf_device.cuh:497-551 sample_cdf_2d / pdf_2d). All inverse
        CDF lookups are compare-count reductions over the (small) CDF
        axes — jnp.searchsorted measured ~150 ns/query on v5e, far
        slower than a vectorized compare over ≤128 lanes."""
        k_img, k_uv, k_x, k_y = jax.random.split(key, 4)
        n_img = self.dataset.n_images
        uv_u = jax.random.uniform(k_uv, (R, 2))
        # the two reference toggles (testbed.h:810-811): image pick and
        # focal-plane (pixel) pick each independently error-proportional
        img_on = (self.use_error_map and use_cdf
                  and self.sample_image_proportional_to_error)
        uv_on = (self.use_error_map and use_cdf
                 and self.sample_focal_plane_proportional_to_error)
        if not (img_on or uv_on):
            img_u = jax.random.randint(k_img, (R,), 0, n_img)
            return img_u, uv_u, jnp.ones((R,))

        eh, ew = self.error_map_res
        # --- image: inverse CDF over cdf_img (already MIN_PMF-mixed) --
        if img_on:
            u_i = jax.random.uniform(k_img, (R,))
            img = jnp.sum(data["cdf_img"][None, :] < u_i[:, None], axis=1)
            img = jnp.clip(img, 0, n_img - 1).astype(jnp.int32)
            pdf_img = data["pmf_img"][img] * n_img  # relative to uniform
        else:
            img = jax.random.randint(k_img, (R,), 0, n_img)
            pdf_img = jnp.ones((R,))
        if not uv_on:
            return img, uv_u, pdf_img

        # --- uv: 50% uniform / 50% 2D CDF (sample_cdf_2d) -------------
        ux, uy = uv_u[:, 0], uv_u[:, 1]
        use_uniform = ux < 0.5
        ux_c = (ux - 0.5) * 2.0  # rescaled for the CDF branch

        cdf_y = data["cdf_y"][img]  # (R, EH)
        y_idx = jnp.clip(jnp.sum(cdf_y < uy[:, None], axis=1), 0, eh - 1)
        prev_y = jnp.where(y_idx > 0, jnp.take_along_axis(
            cdf_y, jnp.maximum(y_idx - 1, 0)[:, None], axis=1)[:, 0], 0.0)
        pmf_y = jnp.take_along_axis(cdf_y, y_idx[:, None], axis=1)[:, 0] - prev_y
        frac_y = jnp.clip((uy - prev_y) / jnp.maximum(pmf_y, 1e-12), 0.0, 1.0)

        cdf_x = data["cdf_x"][img, y_idx]  # (R, EW)
        x_idx = jnp.clip(jnp.sum(cdf_x < ux_c[:, None], axis=1), 0, ew - 1)
        prev_x = jnp.where(x_idx > 0, jnp.take_along_axis(
            cdf_x, jnp.maximum(x_idx - 1, 0)[:, None], axis=1)[:, 0], 0.0)
        pmf_x = jnp.take_along_axis(cdf_x, x_idx[:, None], axis=1)[:, 0] - prev_x
        frac_x = jnp.clip((ux_c - prev_x) / jnp.maximum(pmf_x, 1e-12), 0.0, 1.0)

        uv_cdf = jnp.stack(
            [(x_idx + frac_x) / ew, (y_idx + frac_y) / eh], axis=-1
        )
        uv_uni = jnp.stack([ux * 2.0, uy], axis=-1)  # ux/0.5 per reference
        uv = jnp.where(use_uniform[:, None], uv_uni, uv_cdf)

        # pdf_2d(uv): evaluated at the FINAL uv for both branches
        # (reference pdf_2d, nerf_device.cuh:531-553)
        py = jnp.clip((uv[:, 1] * eh).astype(jnp.int32), 0, eh - 1)
        px = jnp.clip((uv[:, 0] * ew).astype(jnp.int32), 0, ew - 1)
        cdf_y_at = data["cdf_y"][img]
        pmf_y_at = jnp.take_along_axis(cdf_y_at, py[:, None], axis=1)[:, 0] - jnp.where(
            py > 0,
            jnp.take_along_axis(cdf_y_at, jnp.maximum(py - 1, 0)[:, None], axis=1)[:, 0],
            0.0,
        )
        cdf_x_at = data["cdf_x"][img, py]
        pmf_x_at = jnp.take_along_axis(cdf_x_at, px[:, None], axis=1)[:, 0] - jnp.where(
            px > 0,
            jnp.take_along_axis(cdf_x_at, jnp.maximum(px - 1, 0)[:, None], axis=1)[:, 0],
            0.0,
        )
        uv_pdf = 0.5 + pmf_x_at * pmf_y_at * (eh * ew) * 0.5
        return img, uv, pdf_img * uv_pdf

    def _train_step(self, state: NerfTrainState, data, key, step, n_rays=None,
                    use_cdf=False, mode="nerf"):
        R = n_rays or self.n_rays_per_batch
        k_pix, k_bg, k_jit, k_lvl = jax.random.split(key, 4)
        # per-ray coarse-to-fine cap: rand·2 so ~50% of rays train at
        # full level (reference testbed_nerf.cu:738; default off, like
        # the reference's "rand levels" checkbox)
        max_level = None
        if self.max_level_rand_training:
            max_level = 2.0 * jax.random.uniform(k_lvl, (R,))
        img_idx, uv, pdf = self._sample_pixels(data, k_pix, R, use_cdf)
        if self.snap_to_pixel_centers:
            w, h = self.dataset.resolution
            res = jnp.array([w, h], jnp.float32)
            uv = (jnp.floor(uv * res) + 0.5) / res

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("data"))
            img_idx = jax.lax.with_sharding_constraint(img_idx, shard)
            uv = jax.lax.with_sharding_constraint(uv, shard)

        # per-ray motion-blur time (reference motionblur_time = rand,
        # testbed_nerf.cu:740); same draw reused by the cam-opt ray gen
        motion_time = None
        if self.has_motion:
            key, k_mt = jax.random.split(key)
            motion_time = jax.random.uniform(k_mt, (R,))
        # march with current (non-differentiated) camera params
        o0, d0 = self._generate_rays(
            data, img_idx, uv, jax.lax.stop_gradient(state.cam),
            motion_time=motion_time,
        )
        jitter = jax.random.uniform(k_jit, (R,))
        ts, dts, valid, _, n_valid = march_rays(
            o0,
            d0,
            state.grid.skipmip,
            jnp.asarray(self.aabb_min),
            jnp.asarray(self.aabb_max),
            jitter,
            self.march_cfg,
        )

        texsamp, pixel_ok = self._read_pixels(data, img_idx, uv)  # premultiplied linear

        if self.random_bg_color:
            bg_linear = srgb_to_linear(jax.random.uniform(k_bg, (R, 3)))
        else:
            bg_linear = jnp.zeros((R, 3))

        optimize_cam = (
            self.optimize_extrinsics or self.optimize_exposure
            or self.optimize_focal_length
            or any(k in state.cam for k in ("extra", "distortion", "envmap"))
        )

        def loss_value(params, cam):
            bg_lin = bg_linear
            if "envmap" in cam:
                # composite the trainable envmap over the random bg
                # (reference compute_loss kernel envmap path)
                ev = _read_envmap(cam["envmap"], d0)
                bg_lin = ev[:, :3] + bg_lin * (1.0 - ev[:, 3:4])
            exposure_scale = 1.0
            if self.optimize_exposure:
                exposure_scale = jnp.exp(0.6931471805599453 * cam["exposure"][img_idx])
            if self.dataset.is_hdr:
                target = exposure_scale * texsamp[:, :3] + (1.0 - texsamp[:, 3:4]) * bg_lin
                bg = bg_lin
            else:
                # sRGB color space (reference testbed_nerf.cu:995-999)
                a = texsamp[:, 3:4]
                bg = linear_to_srgb(bg_lin)
                target = (
                    linear_to_srgb(exposure_scale * texsamp[:, :3] / jnp.maximum(a, 1e-6))
                    * a
                    * jnp.where(a > 0, 1.0, 0.0)
                    + (1.0 - a) * bg
                )
            if self.optimize_extrinsics or self.optimize_focal_length:
                o, d = self._generate_rays(
                    data, img_idx, uv, cam, motion_time=motion_time
                )
            else:
                o, d = o0, d0
            extra = cam["extra"][img_idx] if "extra" in cam else None
            rgb_ray, depth_ray, weight, (T_final, sigma_logit, saux) = self._composite(
                params, o, d, ts, dts, valid, bg, extra=extra,
                max_level=max_level, compact=self.compact_samples,
            )
            # per-ray composite loss: the recorded/error-map loss in ALL
            # train modes (reference computes lg identically in every
            # mode, fused_kernels/train_nerf.cuh:257-260)
            per_ray = jnp.mean(self.loss(target, rgb_ray), axis=-1) * pixel_ok
            sg = jax.lax.stop_gradient
            if mode == "nerf":
                objective = jnp.mean(per_ray)
            elif mode == "rfl":
                # Radiance Field Loss (ETrainMode::Rfl, Zhang 2025;
                # fused_kernels/train_nerf.cuh:391-399): the loss is
                # composited over per-SAMPLE losses instead of computed
                # on the composited color — autodiff of this objective
                # reproduces the reference's hand-derived gradients
                # (same suffix identity as the NeRF loss).
                l_s = self.loss(
                    jnp.broadcast_to(target[:, None, :], saux["rgb"].shape),
                    saux["rgb"],
                )  # (R, K, 3)
                loss_comp = jnp.sum(weight[..., None] * l_s, axis=1)
                loss_comp = loss_comp + jnp.where(
                    T_final >= EPS_T, T_final, 0.0
                )[:, None] * self.loss(target, bg)
                objective = jnp.mean(jnp.mean(loss_comp, axis=-1) * pixel_ok)
            else:  # "rflrelax"
                # RflRelax (fused_kernels/train_nerf.cuh:400-410): each
                # sample is judged on lerp(color-behind-it, its color,
                # alpha); color gradients flow per-sample, density
                # gradients keep the NeRF suffix form but driven by the
                # LOCAL loss gradient — injected via stop_gradient
                # coefficients to match the reference exactly.
                rgb_s, alpha_s, T_before = saux["rgb"], saux["alpha"], saux["T_before"]
                w_s = weight  # (R, K)
                prefix = jnp.cumsum(w_s[..., None] * rgb_s, axis=1)  # incl. i
                suffix = rgb_ray[:, None, :] - prefix  # includes bg term
                T_after = T_before - w_s
                rgb_bg = suffix / jnp.maximum(T_after, 1e-6)[..., None]
                rgb_lerp = (
                    sg((1.0 - alpha_s[..., None]) * rgb_bg)
                    + sg(alpha_s[..., None]) * rgb_s
                )
                tgt_b = jnp.broadcast_to(target[:, None, :], rgb_s.shape)
                # d l / d rgb_lerp, elementwise (vectorized analytic grad)
                g_local = jax.grad(
                    lambda p: jnp.sum(self.loss(tgt_b, p))
                )(sg(rgb_lerp))
                # color term: coeff T_before makes ∂/∂rgb = w·g_local
                color_obj = jnp.sum(
                    sg(T_before * saux["valid"] * pixel_ok[:, None])[..., None]
                    * self.loss(tgt_b, rgb_lerp)
                ) / 3.0
                # density term: σ' · dt · ⟨g_local, T_after·rgb − suffix⟩
                dsig = jnp.sum(
                    g_local * (T_after[..., None] * rgb_s - suffix), axis=-1
                ) * dts * saux["valid"] * pixel_ok[:, None] / 3.0
                sigma_s = network_to_density(sigma_logit, self.density_activation)
                dens_obj = jnp.sum(sg(dsig) * sigma_s)
                objective = (color_obj + dens_obj) / max(R, 1)
            # Density regularizers (reference compute_loss kernel,
            # testbed_nerf.cu:1075-1134). The reference adds RAW
            # per-sample terms to dL/d(density_logit), bypassing the
            # 1/n_rays loss normalization but passing through the
            # 1/loss_scale (=1/128 fp16) trainer division:
            #   * while the scene is foggy (mean density below the
            #     optical-thickness floor): -1e-4 for logits < 0 —
            #     pulls empty density UP toward 0 (anti-collapse
            #     bootstrap; round-1 had this sign inverted)
            #   * samples nearer than near_distance with logit > -10:
            #     +1e-4 — pushes near-camera density DOWN
            # Expressed as a loss term Σ stop_grad(coeff)·logit so the
            # per-sample gradient is exactly coeff.
            if self.density_reg_scale > 0:
                inv_loss_scale = 1.0 / 128.0  # testbed.h:311 default_loss_scale fp16
                coeff = jnp.where(
                    (state.grid.mean_density < NERF_MIN_OPTICAL_THICKNESS)
                    & (sigma_logit < 0.0),
                    -1e-4, 0.0,
                ) + jnp.where(
                    (sigma_logit > -10.0) & (ts < self.training_near_distance),
                    1e-4, 0.0,
                )
                coeff = coeff * valid * (self.density_reg_scale * inv_loss_scale)
                reg_total = jnp.sum(
                    jax.lax.stop_gradient(coeff)
                    * jnp.clip(sigma_logit, -30.0, 30.0)
                )
            else:
                reg_total = 0.0
            if self.depth_supervision_lambda > 0 and "depths" in data:
                w_, h_ = self.dataset.resolution
                px = jnp.clip((uv[:, 0] * w_).astype(jnp.int32), 0, w_ - 1)
                py = jnp.clip((uv[:, 1] * h_).astype(jnp.int32), 0, h_ - 1)
                target_depth = data["depths"][img_idx, py, px]
                # depth loss on rays with valid depth (reference
                # depth_loss_type, testbed.h:796, default L1); applies
                # in every train mode
                dl = loss_fn(loss_type_from_string(self.depth_loss_type))
                dloss = dl(target_depth[:, None],
                           depth_ray[:, None])[:, 0] * (target_depth > 0)
                # depth term joins the OBJECTIVE only: the reference's
                # error-map deposit and loss readout are photometric
                # (testbed_nerf.cu:1041-1070 deposits loss_scalar from
                # the color loss; depth supervision is a separate
                # gradient term) — adding it to per_ray skewed the
                # importance map on depth datasets (round-2 verdict).
                objective = objective + self.depth_supervision_lambda * jnp.mean(dloss)
            # rays with zero samples are dropped by the reference; they
            # still see pure-background here, which regularizes empty
            # space — keep them but they carry no density gradient.
            # reg_total rides outside per_ray so error-map deposits
            # stay pure photometric error; per_ray stays the composite
            # loss in all train modes.
            return objective + reg_total, (per_ray, depth_ray)

        if optimize_cam:
            (loss, (per_ray, depth_ray)), (grads, cam_grads) = jax.value_and_grad(
                loss_value, argnums=(0, 1), has_aux=True
            )(state.params, state.cam)
            new_cam, new_cam_opt = self.cam_opt.update(
                cam_grads, state.cam_opt, state.cam
            )
            if "extra" in new_cam and not self.optimize_extra_dims:
                # reference optimize_extra_dims=false freezes latents:
                # pin the values (zeroing grads alone leaves Adam
                # momentum drifting them)
                new_cam = dict(new_cam)
                new_cam["extra"] = state.cam["extra"]
            # per-group camera L2 (reference exposure_l2_reg /
            # intrinsic_l2_reg, testbed.h:788-789; its per-group host
            # Adams each carry their own reg — here applied as
            # decoupled weight decay after the shared update)
            lr = self.cam_opt.spec.learning_rate
            if self.exposure_l2_reg and "exposure" in new_cam:
                new_cam = dict(new_cam)
                new_cam["exposure"] = (new_cam["exposure"]
                                       - lr * self.exposure_l2_reg
                                       * state.cam["exposure"])
            if self.intrinsic_l2_reg and "focal" in new_cam:
                new_cam = dict(new_cam)
                new_cam["focal"] = (new_cam["focal"]
                                    - lr * self.intrinsic_l2_reg
                                    * state.cam["focal"])
        else:
            (loss, (per_ray, depth_ray)), grads = jax.value_and_grad(
                loss_value, has_aux=True
            )(state.params, state.cam)
            new_cam, new_cam_opt = state.cam, state.cam_opt

        new_params, new_opt = self.opt.update(grads, state.opt_state, state.params)
        if not (self.shall_train_encoding and self.shall_train_network):
            # GUI freeze toggles: pin the frozen subtree's values (the
            # optimizer state still advances, like pausing in the GUI)
            enc_keys = ("pos_enc", "dir_enc", "enc")
            new_params = {
                k: (state.params[k]
                    if ((k in enc_keys and not self.shall_train_encoding)
                        or (k not in enc_keys
                            and not self.shall_train_network))
                    else v)
                for k, v in new_params.items()
            }

        # error-map deposit: loss ÷ sampling pdf, bilinear into the 4
        # neighboring cells (reference compute_loss kernel deposit_val,
        # testbed_nerf.cu:1041-1070); accumulated over the rebuild
        # interval, map zeroed at each CDF rebuild
        error_map = state.error_map
        sharp_grid = state.sharp_grid
        if self.use_error_map:
            eh, ew = self.error_map_res
            deposit = per_ray / jnp.maximum(pdf, 1e-6)
            if self.include_sharpness_in_error and sharp_grid is not None:
                # downweight deposits from views blurrier than the
                # sharpest view seen for the same 3D cell (reference
                # testbed_nerf.cu:1053-1066)
                from ..common import NERF_GRIDSIZE as G_
                from ..ops.raymarch import mip_from_pos

                smap = data["sharpness"]  # (N, SH, SW)
                sh_res, sw_res = smap.shape[1], smap.shape[2]
                sx = jnp.clip((uv[:, 0] * sw_res).astype(jnp.int32), 0, sw_res - 1)
                sy = jnp.clip((uv[:, 1] * sh_res).astype(jnp.int32), 0, sh_res - 1)
                sharp = smap[img_idx, sy, sx] + 1e-6
                # depth_ray: expected termination distance along the ray
                hit = o0 + depth_ray[:, None] * d0
                in_aabb = jnp.all(
                    (hit >= jnp.asarray(self.aabb_min))
                    & (hit <= jnp.asarray(self.aabb_max)), axis=-1)
                mip = jnp.clip(mip_from_pos(hit, self.max_cascade), 0, NERF_CASCADES - 1)
                mip_scale = jnp.exp2(-mip.astype(jnp.float32))
                p = (hit - 0.5) * mip_scale[:, None] + 0.5
                cell = jnp.clip(jnp.floor(p * G_).astype(jnp.int32), 0, G_ - 1)
                flat_cell = ((mip * G_ + cell[:, 0]) * G_ + cell[:, 1]) * G_ + cell[:, 2]
                old = jnp.take(sharp_grid.reshape(-1), flat_cell)
                sharp_grid = (
                    sharp_grid.reshape(-1)
                    .at[flat_cell]
                    .max(jnp.where(in_aabb, sharp, 0.0))
                    .reshape(sharp_grid.shape)
                )
                grid_sharp = jnp.maximum(sharp, old)
                factor = jnp.maximum(sharp / grid_sharp, 0.01)
                deposit = deposit * jnp.where(in_aabb, factor, 1.0)
            # bilinear 4-corner deposit at uv·res − 0.5
            pos = jnp.clip(
                uv * jnp.array([ew, eh], jnp.float32) - 0.5,
                0.0,
                jnp.array([ew, eh], jnp.float32) - 1.0 - 1e-4,
            )
            pi = pos.astype(jnp.int32)
            pw = pos - pi
            px0 = jnp.clip(pi[:, 0], 0, ew - 2)
            py0 = jnp.clip(pi[:, 1], 0, eh - 2)
            base = (img_idx * eh + py0) * ew + px0
            corners = jnp.concatenate([base, base + 1, base + ew, base + ew + 1])
            wx, wy = pw[:, 0], pw[:, 1]
            wvals = jnp.concatenate([
                (1 - wx) * (1 - wy) * deposit,
                wx * (1 - wy) * deposit,
                (1 - wx) * wy * deposit,
                wx * wy * deposit,
            ])
            error_map = (
                error_map.reshape(-1).at[corners].add(wvals).reshape(error_map.shape)
            )

        new_state = NerfTrainState(
            params=new_params, opt_state=new_opt, grid=state.grid,
            cam=new_cam, cam_opt=new_cam_opt, error_map=error_map,
            sharp_grid=sharp_grid,
        )
        stats = {
            "loss": jnp.mean(per_ray),
            "measured_samples": jnp.sum(n_valid),
        }
        return new_state, stats

    def _update_grid(self, state: NerfTrainState, key, step, full: bool):
        params = self.opt.inference_params(state.opt_state, state.params)
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_size = jnp.asarray(self.aabb_max - self.aabb_min)

        # NB round-3: probes must use the model's own interpolation —
        # a nearest-corner "cheap probe" was tried (1 row/level) and
        # COLLAPSED training: each level snaps to a different spatial
        # corner, so the MLP sees feature mixtures from different
        # points and returns garbage density; the grid emptied within
        # ~200 steps. The probe-cost fix is COUNT (see occupancy
        # update), not per-probe rows.
        def density_fn(pos_world):
            pos_w = (pos_world - aabb_min) / aabb_size
            return self.model.density(params, pos_w)[:, 0]

        grid = update_grid(
            state.grid,
            density_fn,
            key,
            step,
            decay=self.density_grid_decay,
            density_activation=self.density_activation,
            full=full,
        )
        # sharpness grid decays alongside the density grid (reference
        # decay_sharpness_grid_nerf, testbed_nerf.cu:2717-2721)
        sharp_grid = state.sharp_grid
        if sharp_grid is not None:
            sharp_grid = sharp_grid * self.density_grid_decay
        return dataclasses.replace(state, grid=grid, sharp_grid=sharp_grid)

    def set_camera_optimizer_hparams(self, extrinsic_learning_rate=None,
                                     extrinsic_l2_reg=None):
        """pyngp extrinsic_learning_rate / extrinsic_l2_reg
        (testbed.h:785-786). The reference accumulates camera grads for
        n_steps_between_cam_updates steps and applies one host Adam
        step; here the camera params update every jitted step, so the
        per-step learning rate is the given rate divided by that
        cadence (default 1e-3/16 ≈ the 1e-4 we initialize with)."""
        from ..ops.optimizers import Optimizer

        spec = self.cam_opt.spec
        if extrinsic_learning_rate is not None:
            spec = dataclasses.replace(
                spec, learning_rate=float(extrinsic_learning_rate)
                / max(int(self.n_steps_between_cam_updates), 1))
        if extrinsic_l2_reg is not None:
            spec = dataclasses.replace(spec, l2_reg=float(extrinsic_l2_reg))
        self.cam_opt = Optimizer(spec, matrix_mask=self.cam_opt.matrix_mask)
        self.rebuild_jit_programs()

    def find_closest_training_view(self, pose: np.ndarray) -> int:
        """Training view whose (optimized) camera is closest to `pose`
        (reference Nerf::find_closest_training_view,
        testbed_nerf.cu:3710-3723: position distance + 0.25 × z-axis
        distance, over the offset-corrected transforms)."""
        from ..render.camera import so3_exp

        xf = np.asarray(self.dataset.xforms_start, np.float32)
        rot = np.asarray(self.state.cam["rot"], np.float32)
        pos = np.asarray(self.state.cam["pos"], np.float32)
        R_off = np.asarray(so3_exp(jnp.asarray(rot)), np.float32)  # (N,3,3)
        R_eff = np.einsum("nij,njk->nik", R_off, xf[:, :, :3])
        t_eff = xf[:, :, 3] + pos
        pose = np.asarray(pose, np.float32)
        score = (np.linalg.norm(t_eff - pose[:, 3], axis=-1)
                 + 0.25 * np.linalg.norm(R_eff[:, :, 2] - pose[:, 2], axis=-1))
        return int(np.argmin(score))

    def get_extra_dims(self, view: int) -> np.ndarray:
        """Trained per-image latent code for one training view
        (reference get_extra_dims_cpu, python_api.cu:810-813)."""
        if "extra" not in self.state.cam:
            return np.zeros((0,), np.float32)
        v = int(view)
        if not (0 <= v < self.dataset.n_images):
            raise IndexError(f"invalid training view {view}")
        return np.asarray(self.state.cam["extra"][v], np.float32)

    def set_camera_extrinsics(self, frame_idx: int, camera_to_world,
                              convert_to_ngp: bool = True,
                              xform_end=None, rolling_shutter=None) -> None:
        """Replace one training camera's extrinsics at runtime
        (reference set_camera_extrinsics[_rolling_shutter],
        testbed_nerf.cu:2188-2213): updates the dataset + device
        tensors and resets that frame's trained pose/exposure offsets."""
        ds = self.dataset
        i = int(frame_idx)
        if not (0 <= i < ds.n_images):
            raise IndexError(f"invalid frame index {frame_idx}")
        m = np.asarray(camera_to_world, np.float32).reshape(3, 4)
        m_end = (m if xform_end is None
                 else np.asarray(xform_end, np.float32).reshape(3, 4))
        if convert_to_ngp:
            m = ds.nerf_matrix_to_ngp(m)
            m_end = ds.nerf_matrix_to_ngp(m_end)
        ds.xforms_start[i] = m
        ds.xforms_end[i] = m_end
        self.data["xforms"] = self.data["xforms"].at[i].set(jnp.asarray(m))
        if "xforms_end" in self.data:
            self.data["xforms_end"] = (
                self.data["xforms_end"].at[i].set(jnp.asarray(m_end)))
        if rolling_shutter is not None:
            rs = np.asarray(rolling_shutter, np.float32).reshape(4)
            ds.rolling_shutter[i] = rs
            if "rolling_shutter" in self.data:
                self.data["rolling_shutter"] = (
                    self.data["rolling_shutter"].at[i].set(jnp.asarray(rs)))
        # reference resets the per-frame pose/exposure optimizers
        cam = dict(self.state.cam)
        for k in ("rot", "pos", "exposure"):
            cam[k] = cam[k].at[i].set(0.0)
        self.state = dataclasses.replace(
            self.state, cam=cam, cam_opt=self.cam_opt.init(cam))

    def get_camera_extrinsics(self, frame_idx: int) -> np.ndarray:
        """3×4 camera-to-world in the source (nerf) convention
        (reference get_camera_extrinsics, testbed_nerf.cu:2287-2292:
        ngp_matrix_to_nerf of the current transform)."""
        i = int(frame_idx)
        if not (0 <= i < self.dataset.n_images):
            return np.eye(3, 4, dtype=np.float32)
        return self.dataset.ngp_matrix_to_nerf(
            np.asarray(self.dataset.xforms_start[i], np.float32))

    def set_camera_intrinsics(self, frame_idx: int, fx: float = 0.0,
                              fy: float = 0.0, cx: float = -0.5,
                              cy: float = -0.5, k1: float = 0.0,
                              k2: float = 0.0, p1: float = 0.0,
                              p2: float = 0.0, k3: float = 0.0,
                              k4: float = 0.0,
                              is_fisheye: bool = False) -> None:
        """Per-frame focal/principal + lens distortion (reference
        set_camera_intrinsics, testbed_nerf.cu:2151-2186). Focal and
        principal point are per-image here too; the lens model is
        per-DATASET in this build (one compiled ray-gen program), so
        distortion coefficients set the shared lens."""
        from ..common import LensMode

        ds = self.dataset
        i = int(frame_idx)
        if not (0 <= i < ds.n_images):
            raise IndexError(f"invalid frame index {frame_idx}")
        fx, fy = float(fx), float(fy)
        if fx <= 0.0:
            fx = fy
        if fy <= 0.0:
            fy = fx
        w, h = ds.resolution
        cx = -float(cx) if cx < 0 else float(cx) / w
        cy = -float(cy) if cy < 0 else float(cy) / h
        ds.focal_lengths[i] = (fx, fy)
        ds.principal_points[i] = (cx, cy)
        self.data["focals"] = self.data["focals"].at[i].set(
            jnp.asarray([fx, fy], jnp.float32))
        self.data["principals"] = self.data["principals"].at[i].set(
            jnp.asarray([cx, cy], jnp.float32))
        if any((k1, k2, k3, k4, p1, p2)):
            if is_fisheye:
                ds.lens_mode = LensMode.OPENCV_FISHEYE.value
                ds.lens_params = np.array([k1, k2, k3, k4], np.float32)
            else:
                ds.lens_mode = LensMode.OPENCV.value
                ds.lens_params = np.array([k1, k2, p1, p2], np.float32)
            self.rebuild_jit_programs()  # lens mode is trace-time state

    def set_training_image(self, frame_idx: int, img: np.ndarray,
                           depth_img: Optional[np.ndarray] = None,
                           depth_scale: float = 1.0) -> None:
        """Replace one training image (+ optional depth) at runtime —
        the pyngp ``testbed.nerf.training.set_image`` surface
        (python_api.cu:45-72 → nerf_loader set_training_image). ``img``
        is float (H, W, 4) in the dataset's training color space (sRGB
        for LDR scenes, linear for HDR); depth is scaled by
        ``depth_scale`` then the scene scale, like the loader."""
        ds = self.dataset
        if not (0 <= int(frame_idx) < ds.n_images):
            raise IndexError(f"invalid frame index {frame_idx}")
        img = np.asarray(img, np.float32)
        expect = (ds.resolution[1], ds.resolution[0], 4)
        if img.shape != expect:
            raise ValueError(f"image should be {expect}, got {img.shape}")
        if ds.is_hdr:
            stored = img.astype(np.float16)
        else:
            stored = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        ds.images[frame_idx] = stored
        self.data["images"] = (
            self.data["images"].at[int(frame_idx)].set(jnp.asarray(stored)))
        if depth_img is not None:
            depth = (np.asarray(depth_img, np.float32)
                     * float(depth_scale) * float(ds.scale))
            if ds.depths is None:
                raise ValueError(
                    "dataset has no depth channel; load with depth maps "
                    "to supervise depth (nerf_loader depth_path)")
            ds.depths[frame_idx] = depth
            self.data["depths"] = (
                self.data["depths"].at[int(frame_idx)].set(
                    jnp.asarray(depth)))

    def train(self, n_steps: int = 1) -> float:
        self._ensure_fresh_jit()
        loss = None
        stats = None
        for _ in range(n_steps):
            if self.training_step % self.grid_update_interval == 0:
                self._key, sub = jax.random.split(self._key)
                self.state = self._jit_update_grid(
                    self.state, sub, jnp.int32(self.training_step),
                    # reference runs FULL grid updates until step 256;
                    # a full update probes 8x the partial's cells and
                    # measured ~3 s each on v5e (~50 s of a 240 s fox
                    # budget) — half the full phase recovers that time
                    # with no measurable PSNR cost (partials keep
                    # refreshing every cell in expectation)
                    full=self.training_step < 128,
                )
                # adaptive rays/batch so VALID samples stay near the
                # sample target as the occupancy grid sparsifies
                # (reference rays_per_batch·target/measured,
                # testbed_nerf.cu:2698-2699) — power-of-two buckets so
                # each batch shape compiles once
                if stats is not None:
                    K = self.march_cfg.max_samples_per_ray
                    # failure detection (reference update_after_training
                    # "generated 0 samples. Aborting training.",
                    # testbed_nerf.cu:2784-2789); checked on the 16-step
                    # cadence where the sync happens anyway
                    if int(stats["measured_samples"]) == 0:
                        import warnings

                        warnings.warn(
                            "NeRF training generated 0 samples; aborting "
                            "training (empty occupancy grid or cameras "
                            "see no scene)"
                        )
                        self.training_aborted = True
                        return float(stats["loss"])
                    measured = max(int(stats["measured_samples"]), 1)
                    fill = measured / (self._n_rays_current * K)
                    # rays so that VALID samples ≈ half the target batch
                    sample_target = self.target_batch_size // 2
                    want = sample_target / max(fill * K, 1e-3)
                    bucket = 1 << int(np.clip(
                        np.round(np.log2(max(want, 1.0))), 11,
                        self.max_ray_bucket_log2))
                    self._n_rays_current = int(bucket)
            if (
                self.exact_corners_after is not None
                and self.training_step >= self.exact_corners_after
                and self.model.pos_encoding.hashed_grad_corners != 8
            ):
                enc = dataclasses.replace(
                    self.model.pos_encoding, hashed_grad_corners=8)
                self.model = dataclasses.replace(self.model, pos_encoding=enc)
                # jit caches the compiled program keyed on ARGUMENTS;
                # a model swap on self is invisible to the existing
                # wrappers — rebuild them so the next call retraces
                self.rebuild_jit_programs()
                self.exact_corners_after = None  # one switch, one retrace
            self._key, sub = jax.random.split(self._key)
            data = self.data
            if self._cdf_valid:
                data = dict(self.data)
                data["cdf_x"], data["cdf_y"] = self._cdf_x, self._cdf_y
                data["cdf_img"], data["pmf_img"] = self._cdf_img, self._pmf_img
            self.state, stats = self._jit_train_step(
                self.state, data, sub, jnp.int32(self.training_step),
                n_rays=self._n_rays_current, use_cdf=self._cdf_valid,
                mode=self.train_mode,
            )
            loss = stats["loss"]
            self.training_step += 1
            if self.debug_check_numerics and not np.isfinite(float(loss)):
                raise FloatingPointError(
                    f"non-finite loss {float(loss)} at step "
                    f"{self.training_step} (grid mean_density="
                    f"{float(self.state.grid.mean_density):.4g})"
                )
            # error-map CDF rebuild on a ×1.5-growing interval
            # (reference testbed_nerf.cu:2791-2859)
            if self.use_error_map:
                self._err_steps_since += 1
                if self._err_steps_since >= self._err_interval:
                    (self._cdf_x, self._cdf_y, self._cdf_img,
                     self._pmf_img) = _rebuild_error_cdf(self.state.error_map)
                    self.state = dataclasses.replace(
                        self.state, error_map=jnp.zeros_like(self.state.error_map)
                    )
                    self._cdf_valid = True
                    self._err_steps_since = 0
                    self._err_interval = int(self._err_interval * 1.5)
        return float(loss) if loss is not None else 0.0

    # ------------------------------------------------------------------
    # rendering
    # ------------------------------------------------------------------
    def _get_bricks(self, params):
        """Bricked dense-level tables for inference, cached per params
        identity (rebuilt after training steps change the tables)."""
        # keyed by training step: id()-keying missed every call
        # (inference_params materializes fresh arrays per render)
        key = (self.training_step, self.model.pos_encoding.interpolation)
        cached = getattr(self, "_brick_cache", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        if not hasattr(self, "_jit_build_bricks"):
            self._jit_build_bricks = jax.jit(self.model.build_bricks)
        bricks = self._jit_build_bricks(params)
        self._brick_cache = (key, bricks)
        return bricks

    def bake(self, origin=None, res0: int | None = None,
             max_rows_log2: int = 21):
        """Bake the current model into a BakedCache (nerf/baked.py):
        packed 64 B records per occupied cell, rendered at ~2 gathers
        per sample. origin: camera position for a per-frame
        view-dependent bake (exact for primary rays up to one cell's
        angular size); None bakes fixed-direction diffuse colors."""
        from . import baked as _baked

        params = self.opt.inference_params(self.state.opt_state,
                                           self.state.params)
        if getattr(self, "_bake_eval", None) is None:
            self._bake_eval = _baked.make_bake_eval(
                self.model, self.rgb_activation, self.density_activation)
        return _baked.bake(
            self.model, params, np.asarray(self.state.grid.bitfield),
            self.max_cascade + 1, self.aabb_min, self.aabb_max,
            self.rgb_activation, self.density_activation,
            origin=origin, res0=res0 or self.baked_res0,
            max_rows_log2=max_rows_log2, bricks=self._get_bricks(params),
            eval_fn=self._bake_eval)

    def _get_baked(self, origin=None):
        """Per-(step, origin) bake cache: repeated renders of the same
        frame (spp loops, throughput benches, the web viewer's orbit
        pauses) reuse the bake; a new camera or training step rebakes."""
        key = (self.training_step, self.baked_res0,
               None if origin is None else
               tuple(np.round(np.asarray(origin, np.float64), 4).tolist()))
        c = self._baked_cache
        if c is not None and c[0] == key:
            return c[1]
        cache = self.bake(origin=origin)
        self._baked_cache = (key, cache)
        return cache

    def _get_slab(self, origin=None, eye=None):
        """Per-step dense-volume bake cache for the slab-sweep renderer
        (nerf/slab.py). Diffuse by default so orbit/video renders reuse
        one bake; set slab_bake_view_dependent for per-frame bakes.

        Levels are an EYE-CENTERED clipmap (slab.clipmap_boxes): for
        inside-out captures (fox) the on-screen subject sits outside
        the unit cube, so scene-centered cascades would quantize it at
        the coarse levels (measured 16× blur, round 4). Box centers
        snap to a 0.25 lattice so orbiting cameras re-use a bake until
        they move ~a quarter unit."""
        from . import slab as _slab

        if not self.slab_bake_view_dependent:
            origin = None
        boxes = None
        if eye is not None and self.max_cascade > 0:
            boxes = _slab.clipmap_boxes(eye, self.aabb_min, self.aabb_max,
                                        finest_extent=self.slab_finest_extent)
        deferred = (self.slab_deferred_vd and origin is None
                    and self.slab_n_feat > 0)
        key = (self.training_step, self.slab_res0, self.slab_res_outer,
               deferred,
               None if origin is None else
               tuple(np.round(np.asarray(origin, np.float64), 4).tolist()),
               None if boxes is None else boxes.tobytes())
        c = self._slab_cache
        if c is not None and c[0] == key:
            return c[1]
        params = self.opt.inference_params(self.state.opt_state,
                                           self.state.params)
        feat_proj = self._get_slab_feat_proj(params) if deferred else None
        if feat_proj is None:
            if getattr(self, "_voxel_eval", None) is None:
                self._voxel_eval = _slab.make_voxel_eval(
                    self.model, self.rgb_activation,
                    self.density_activation)
            eval_fn = self._voxel_eval
        else:
            # separate cached evaluator: feat_proj is frozen per task,
            # so this closure compiles exactly once
            if self._voxel_eval_feat is None:
                self._voxel_eval_feat = _slab.make_voxel_eval(
                    self.model, self.rgb_activation,
                    self.density_activation, feat_proj=feat_proj)
            eval_fn = self._voxel_eval_feat
        dvols = _slab.bake_dense(
            self.model, params, np.asarray(self.state.grid.bitfield),
            self.max_cascade + 1, self.aabb_min, self.aabb_max,
            self.rgb_activation, self.density_activation,
            origin=origin, res0=self.slab_res0,
            res_outer=self.slab_res_outer,
            bricks=self._get_bricks(params), eval_fn=eval_fn,
            boxes=boxes, feat_proj=feat_proj)
        self._slab_decode_params = (params["rgb_net"],
                                    params.get("dir_enc"))
        self._slab_cache = (key, dvols)
        return dvols

    def _get_slab_feat_proj(self, params):
        """Frozen PCA basis (mu(16,), sd(16,), P(16,F)) over density-MLP
        features at occupied-grid sample points, for the deferred
        view-dependence bake (slab.make_voxel_eval feat_proj). Computed
        ONCE per task: the basis is a projection, not model state — a
        slightly stale basis still spans the feature space — and
        freezing it keeps the bake evaluator's closure (and compile)
        stable across bakes."""
        if self._slab_feat_proj is not None:
            return self._slab_feat_proj
        F = int(self.slab_n_feat)
        bf = np.asarray(self.state.grid.bitfield)
        G = bf.shape[1]
        rng = np.random.default_rng(3)
        pts = []
        for mip in range(bf.shape[0]):
            idx = np.flatnonzero(bf[mip])
            if len(idx) == 0:
                continue
            if len(idx) > 8192:
                idx = rng.choice(idx, 8192, replace=False)
            i, j, k = np.unravel_index(idx, (G, G, G))
            cell = (np.stack([i, j, k], -1)
                    + rng.random((len(idx), 3))) / G
            pts.append((cell - 0.5) * (2.0 ** mip) + 0.5)
        pos = (np.concatenate(pts, 0).astype(np.float32) if pts
               else rng.random((4096, 3)).astype(np.float32))
        pos_w = (pos - self.aabb_min) / (self.aabb_max - self.aabb_min)
        feats = np.asarray(self.model.density(
            params, jnp.asarray(np.clip(pos_w, 0.0, 1.0)),
            bricks=self._get_bricks(params)).astype(jnp.float32))
        mu = feats.mean(0).astype(np.float32)
        sd = np.maximum(feats.std(0), 1e-4).astype(np.float32)
        _, _, vt = np.linalg.svd((feats - mu) / sd, full_matrices=False)
        self._slab_feat_proj = (mu, sd,
                                vt[:F].T.astype(np.float32).copy())
        return self._slab_feat_proj

    def _render_slab(self, width, height, xform, focal_length,
                     principal_point, background, return_depth=False,
                     out_uint8=False):
        """Frame render through the slab-sweep pipeline (nerf/slab.py):
        dense bake + gather-free MXU slab compositing. The fast-preview
        counterpart of the exact per-sample march."""
        from . import slab as _slab

        eye = xform[:, 3]
        dvols = self._get_slab(origin=eye, eye=eye)
        n = width * height
        n_pad = max(1024, 1 << int(math.ceil(math.log2(n))))
        # the pixel grid is generated ON DEVICE (iota): uploading a
        # host-built (N,2) uv array is 16 MB through the tunnel per
        # 1080p frame — measured as the bulk of a 1.2 s/frame gap
        # between render_frame device time and task.render wall time
        key = ("slab_grid", width, height, n_pad)
        fn = self._grid_ray_cache.get(key)
        if fn is None:
            def _grid_rays(fl, pp, xf, W=width, H=height, P=n_pad):
                i = jax.lax.iota(jnp.int32, P)
                xs = (i % W).astype(jnp.float32)
                ys = jnp.minimum(i // W, H - 1).astype(jnp.float32)
                uv = jnp.stack([(xs + 0.5) / W, (ys + 0.5) / H], -1)
                return self._prep_rays(
                    uv, jnp.asarray([W, H], jnp.float32), fl, pp, xf)[1]
            fn = jax.jit(_grid_rays)
            self._grid_ray_cache[key] = fn
        d = fn(jnp.asarray(focal_length, jnp.float32),
               jnp.asarray(principal_point, jnp.float32),
               jnp.asarray(xform))
        B0 = 512 if max(width, height) <= 640 else 1024
        # undistorted perspective cameras plan entirely on HOST (exact
        # polygon extremes, slab.plan_groups_host) — no device sync
        # before the sweeps dispatch; other lenses fall back to the
        # ~100-byte device-reduced summary
        from ..common import LensMode
        plan = None
        if LensMode(self.dataset.lens_mode) == LensMode.PERSPECTIVE:
            plan = _slab.plan_groups_host(
                np.asarray(xform, np.float32), (width, height),
                focal_length, principal_point)
        # d stays ON DEVICE: render_frame plans from the host plan or a
        # device-reduced summary, never the (N,3) array (24 MB at 1080p)
        # when a device mesh is attached, the per-pixel warp fans out
        # across it (pixels sharded, layers replicated — slab._warp_sharded)
        out = _slab.render_frame(dvols, eye, d,
                                 background=np.asarray(background,
                                                       np.float32),
                                 B0=B0, Bo=B0 // 2, plan=plan,
                                 mesh=self.mesh)
        if getattr(dvols, "n_feat", 0) > 0:
            # deferred view-dependent decode: exact rgb head once per
            # PIXEL on the PCA-reconstructed composited feature (dense
            # MXU matmuls — adds no gathers; slab.make_deferred_decode)
            if self._slab_decode is None:
                self._slab_decode = _slab.make_deferred_decode(
                    self.model, self.rgb_activation)
            mu, sd, Pm = dvols.feat_proj
            rgb_p, dir_p = self._slab_decode_params
            out = self._slab_decode(
                out, d, rgb_p, dir_p, jnp.asarray(mu), jnp.asarray(sd),
                jnp.asarray(Pm), jnp.asarray(_slab.FIXED_BAKE_DIR))
        # slice on DEVICE before the host copy: the pad rows and (when
        # unused) the depth channel never cross the tunnel
        if return_depth:
            out = np.asarray(out[:n, :5])
            img = out[:, :4].reshape(height, width, 4)
            return img, out[:, 4].reshape(height, width)
        if out_uint8:
            q = (jnp.clip(out[:n, :4], 0.0, 1.0) * 255.0
                 + 0.5).astype(jnp.uint8)
            return np.asarray(q).reshape(height, width, 4)
        return np.asarray(out[:n, :4]).reshape(height, width, 4)

    def _march_window(self, grid_bits, o, d, t, alive, tmax, window=None,
                      dt_scale=1.0):
        """March one K-sample window for the alive rays (dead rays are
        made inert by starting them at MAX_DEPTH — they'd otherwise
        keep emitting samples and probing the grid in lockstep).

        Render rounds use a TIGHTER iteration budget than training
        (render_march_iters): the lockstep while_loop costs every lane
        one grid gather per iteration until the WORST ray finishes, so
        long empty-space traversals are better paid for across several
        rounds with alive-ray compaction in between."""
        from ..common import MAX_DEPTH

        R = o.shape[0]
        cfg = dataclasses.replace(
            self.march_cfg,
            n_march_iters=min(self.march_cfg.n_march_iters,
                              self.render_march_iters),
            max_samples_per_ray=window or self.render_samples_per_window,
            dt_scale=dt_scale,
        )
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        jitter = jnp.zeros((R,)) + 0.5
        t_in = jnp.where(alive, t, jnp.float32(MAX_DEPTH))
        ts, dts, valid, t_exit, n_valid = march_rays(
            o, d, grid_bits, aabb_min, aabb_max, jitter, cfg, t_init=t_in
        )
        valid = valid & alive[:, None]
        n_valid = jnp.where(alive, n_valid, 0)
        return ts, dts, valid, t_exit, n_valid

    def _render_round(self, params, grid_bits, o, d, t, T, rgb, depth, alive, tmax,
                      cost=None, eps_t=EPS_T, bricks=None,
                      compact: int | None = None, extra_vec=None):
        """One render round: march a K-sample window and composite.

        The round loop runs on the host with an alive-count readback
        between rounds — mirroring the reference's compact-loop
        (host readback of n_alive per iteration, testbed_nerf.cu:1735);
        a device-side nested while_loop formulation compiled
        pathologically slowly on TPU. _render_rays splits march and
        eval into two dispatches so `compact` can be sized from the
        MEASURED sample count (see there); this single-program form is
        kept for the traceable fixed-round path.
        """
        ts, dts, valid, t_exit, n_valid = self._march_window(
            grid_bits, o, d, t, alive, tmax)
        out = self._eval_window(params, o, d, ts, valid, bricks, compact,
                                extra_vec=extra_vec)
        return self._composite_window(
            out, ts, dts, valid, t, t_exit, T, rgb, depth, alive, tmax,
            cost, eps_t)

    def _render_extra_vec(self):
        """The (E,) latent vector renders should condition on (pyngp
        set_rendering_extra_dims / rendering_extra_dims_from_training_view,
        python_api.cu:725-745). Default: training view 0's latents."""
        ne = getattr(self.model, "n_extra_dims", 0)
        if not ne or "extra" not in self.state.cam:
            return None
        v = int(self.rendering_extra_dims_from_training_view)
        if v >= 0:
            v = min(v, self.dataset.n_images - 1)
            return np.asarray(self.state.cam["extra"][v], np.float32)
        if self._rendering_extra_dims is not None:
            return np.asarray(self._rendering_extra_dims, np.float32)
        return np.zeros((ne,), np.float32)

    def set_rendering_extra_dims(self, vals):
        """Render with an explicit latent vector (pyngp
        set_rendering_extra_dims); switches off the training-view source."""
        ne = getattr(self.model, "n_extra_dims", 0)
        vals = np.asarray(vals, np.float32).reshape(-1)
        if vals.shape[0] != ne:
            raise ValueError(f"expected {ne} extra dims, got {vals.shape[0]}")
        self._rendering_extra_dims = vals
        self.rendering_extra_dims_from_training_view = -1

    def _eval_window(self, params, o, d, ts, valid, bricks=None,
                     compact: int | None = None, fast: bool = False,
                     extra_vec=None):
        """Network evaluation over a marched (R, K) window, optionally
        on the compacted valid prefix. The (R, K) window is mostly
        invalid slots (dead rays, short in-window marches) and every
        invalid slot pays the full encoding-gather cost — the render
        wall on TPU (~7 ns per gathered row; L8F4 ≈ 50 rows/sample)."""
        R, K = ts.shape
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        pos = o[:, None, :] + ts[..., None] * d[:, None, :]
        pos_w = (pos - aabb_min) / (aabb_max - aabb_min)
        dirs = jnp.broadcast_to(warp_direction(d)[:, None, :], pos.shape)
        M = R * K
        if compact is not None and compact < M:
            from ..ops.compaction import prefix_compaction_maps

            maps = prefix_compaction_maps(jnp.sum(valid, -1), K, compact)
            pos_c = jnp.take(pos_w.reshape(M, 3), maps.src, axis=0)
            dir_c = jnp.take(dirs.reshape(M, 3), maps.src, axis=0)
            extra_c = (None if extra_vec is None else jnp.broadcast_to(
                extra_vec, (compact, extra_vec.shape[-1])))
            out_c = self.model(params, pos_c, dir_c, bricks=bricks,
                               fast=fast, extra=extra_c)
            out = jnp.take(out_c, maps.dest, axis=0)
            out = jnp.where(maps.kept[:, None], out, 0.0).reshape(R, K, 4)
        else:
            extra_m = (None if extra_vec is None else jnp.broadcast_to(
                extra_vec, (M, extra_vec.shape[-1])))
            out = self.model(
                params, pos_w.reshape(M, 3), dirs.reshape(M, 3),
                bricks=bricks, fast=fast, extra=extra_m,
            ).reshape(R, K, 4)
        return out

    def _eval_and_composite(self, params, o, d, ts, dts, valid, t, t_exit, T,
                            rgb, depth, alive, tmax, cost, eps_t, bricks,
                            compact: int | None = None, fast: bool = False,
                            extra_vec=None):
        """Second half of a render round (one jit program): network on
        the compacted valid prefix + composite. `compact` is chosen by
        the host from the marched sample count — no overflow possible."""
        out = self._eval_window(params, o, d, ts, valid, bricks, compact,
                                fast, extra_vec)
        return self._composite_window(
            out, ts, dts, valid, t, t_exit, T, rgb, depth, alive, tmax,
            cost, eps_t)

    def _render_round_baked(self, cache, grid_bits, o, d, t, T, rgb, depth,
                            alive, tmax, cost, eps_t, dt_scale=1.0):
        """One baked render round: march + table lookup + composite in a
        SINGLE dispatch (no sample-count readback, no compaction — the
        baked eval is ~2 gathers/sample, cheaper than the bookkeeping
        that earns its keep on the full model). The TPU recast of the
        reference's fused render megakernel (render_nerf.cuh)."""
        from .baked import query as baked_query

        ts, dts, valid, t_exit, n_valid = self._march_window(
            grid_bits, o, d, t, alive, tmax,
            window=self.baked_samples_per_window,
            dt_scale=dt_scale)
        R, K = ts.shape
        pos = o[:, None, :] + ts[..., None] * d[:, None, :]
        out = baked_query(cache, pos.reshape(-1, 3)).reshape(R, K, 4)
        return self._composite_window(
            out, ts, dts, valid, t, t_exit, T, rgb, depth, alive, tmax,
            cost, eps_t, activated=True)

    def _render_round_baked2(self, cache, grid_bits, o, d, t, T, rgb, depth,
                             alive, tmax, cost, eps_t, dt_scale=1.0):
        """Two baked rounds in one dispatch: with the eval this cheap,
        the per-dispatch host sync (~tens of ms through the tunneled
        device) outweighs the wasted second round for rays that die in
        the first — halving dispatches wins."""
        args = (t, T, rgb, depth, alive, tmax, cost, eps_t)
        t, T, rgb, depth, alive, cost = self._render_round_baked(
            cache, grid_bits, o, d, *args, dt_scale=dt_scale)
        return self._render_round_baked(
            cache, grid_bits, o, d, t, T, rgb, depth, alive, tmax, cost,
            eps_t, dt_scale=dt_scale)

    def _composite_window(self, out, ts, dts, valid, t, t_exit, T, rgb, depth,
                          alive, tmax, cost=None, eps_t=EPS_T,
                          activated=False):
        if activated:  # baked-cache rows store post-activation values
            rgb_s = out[..., :3].astype(jnp.float32)
            sigma = out[..., 3].astype(jnp.float32)
        else:
            rgb_s = network_to_rgb(out[..., :3].astype(jnp.float32),
                                   self.rgb_activation)
            sigma = network_to_density(
                out[..., 3].astype(jnp.float32), self.density_activation
            )
        sigma = jnp.where(valid, sigma, 0.0)
        tau = sigma * dts
        T_cum = T[:, None] * jnp.exp(-jnp.cumsum(tau, axis=-1) + tau)
        weight = (1.0 - jnp.exp(-tau)) * T_cum
        rgb = rgb + jnp.sum(weight[..., None] * rgb_s, axis=1)
        depth = depth + jnp.sum(weight * ts, axis=1)
        T_new = T * jnp.exp(-jnp.sum(tau, axis=-1))
        # A ray stays alive while it is transparent enough, has scene
        # left, AND made marching progress this round. `n_valid < K`
        # alone conflates "marched out of occupied space" with "ran out
        # of the lockstep iteration budget on empty-space skips" — in
        # large-aabb scenes the latter killed rays mid-scene and
        # replaced their contribution with background (advisor round-1
        # finding). Zero progress ⇔ the march terminated for this ray
        # (outside the aabb or beyond MAX_DEPTH).
        progressed = t_exit > t
        alive = alive & (T_new >= eps_t) & (t_exit < tmax) & progressed
        if cost is None:
            cost = jnp.zeros((ts.shape[0],))
        cost = cost + jnp.sum(valid, axis=-1).astype(jnp.float32)
        return t_exit, T_new, rgb, depth, alive, cost

    def _render_rays(self, params, grid_bits, o, d, key=None, max_rounds: int = 64,
                     bricks=None, tminmax=None, fast: bool = False,
                     baked_cache=None):
        """Render rays to (rgb, alpha, depth): host loop over jitted
        march+composite rounds with alive-ray compaction between rounds
        (the reference's compact_kernel_nerf, recast as host-side
        gather/scatter into power-of-two buckets so each bucket size
        compiles once)."""
        R = o.shape[0]
        if tminmax is not None:
            tmin, tmax = tminmax
        else:
            # rays are clipped to the render crop box + near plane
            tmin, tmax = self._crop_tminmax(o, d)
            tmin = jnp.maximum(tmin, self.render_near_distance)

        if baked_cache is not None:
            # march at the cache's ACTUAL finest cell size (the bake
            # may have degraded resolution under its row cap) — the
            # field is trilinear per cell, sub-cell steps buy nothing
            baked_dt = max(
                1.0, (1.0 / float(np.asarray(baked_cache.res)[0]))
                / MIN_CONE_STEPSIZE)
        else:
            baked_dt = 1.0

        ev = self._render_extra_vec()
        extra_vec = None if ev is None else jnp.asarray(ev)

        rgb_out = np.zeros((R, 3), np.float32)
        T_out = np.ones((R,), np.float32)
        depth_out = np.zeros((R,), np.float32)
        cost_out = np.zeros((R,), np.float32)

        idx = np.arange(R)
        o_c, d_c = o, d
        t_c, tmax_c = tmin, tmax
        T_c = jnp.ones((R,))
        rgb_c = jnp.zeros((R, 3))
        depth_c = jnp.zeros((R,))
        cost_c = jnp.zeros((R,))
        alive_c = tmax > tmin

        valid = np.ones(R, bool)  # which bucket rows map to real rays

        def writeback(mask):
            rows = mask & valid
            if rows.any():
                rgb_out[idx[rows]] = np.asarray(rgb_c)[rows]
                T_out[idx[rows]] = np.asarray(T_c)[rows]
                depth_out[idx[rows]] = np.asarray(depth_c)[rows]
                cost_out[idx[rows]] = np.asarray(cost_c)[rows]

        for _ in range(max_rounds):
            alive_np = np.asarray(alive_c) & valid
            n_alive = int(alive_np.sum())
            if n_alive == 0:
                break
            # compact whenever a smaller bucket fits: gather alive rays
            # into the next pow2 bucket (bounded set of compiled shapes)
            # quarter-steps (…, 1024, 4096, 16384, 65536): each
            # bucket shape compiles once, and the serial remote
            # compile service makes every extra shape cost minutes
            b = int(np.ceil(np.log2(max(n_alive, 1))))
            if baked_cache is not None:
                # baked rounds compile ONE program per bucket (no
                # (bucket, capacity) matrix like the exact path), so
                # every-pow2 buckets are affordable — and dead lanes
                # pay full table-lookup cost, so tight packing matters
                bucket = max(1024, 1 << b)
            else:
                bucket = max(1024, 1 << (((b + 1) // 2) * 2))
            if bucket < len(idx):
                writeback(~alive_np)
                sel = np.nonzero(alive_np)[0]
                take = np.concatenate([sel, np.zeros(bucket - len(sel), np.int64)])
                idx = idx[take]
                valid = np.arange(bucket) < len(sel)
                (o_c, d_c, t_c, tmax_c, T_c, rgb_c, depth_c, cost_c
                 ) = self._jit_gather_ray_state(
                    (o_c, d_c, t_c, tmax_c, T_c, rgb_c, depth_c, cost_c),
                    jnp.asarray(take, jnp.int32))
                alive_c = jnp.asarray(valid)
            if baked_cache is not None:
                # baked mode: TWO march+lookup+composite rounds fused in
                # ONE dispatch (no sample-count readback needed; see
                # _render_round_baked2 on why unrolling wins)
                (t_c, T_c, rgb_c, depth_c, alive_c, cost_c
                 ) = self._jit_render_round_baked2(
                    baked_cache, grid_bits, o_c, d_c, t_c, T_c, rgb_c,
                    depth_c, alive_c, tmax_c, cost_c,
                    jnp.float32(self.min_transmittance),
                    dt_scale=baked_dt)
                continue
            # Two dispatches per round: march, then network+composite
            # with a capacity sized from the MEASURED sample count (a
            # scalar readback — the alive-count readback already syncs
            # here anyway). Capacities are pow2 fractions of the window
            # {M/16, M/8, M/4, M/2, M} so each (R-bucket, cap) pair
            # compiles once.
            K = self.render_samples_per_window
            M = len(idx) * K
            ts, dts, valid_s, t_exit, n_valid = self._jit_march_window(
                grid_bits, o_c, d_c, t_c, alive_c, tmax_c)
            nv = int(jnp.sum(n_valid))
            cap = None
            for frac in (16, 8, 4, 2):
                if nv <= M // frac:
                    cap = M // frac
                    break
            t_c, T_c, rgb_c, depth_c, alive_c, cost_c = self._jit_eval_composite(
                params, o_c, d_c, ts, dts, valid_s, t_c, t_exit, T_c, rgb_c,
                depth_c, alive_c, tmax_c, cost_c,
                jnp.float32(self.min_transmittance), bricks, compact=cap,
                fast=fast, extra_vec=extra_vec,
            )

        writeback(np.ones(len(idx), bool))
        return (jnp.asarray(rgb_out), 1.0 - jnp.asarray(T_out),
                jnp.asarray(depth_out), jnp.asarray(cost_out))

    def _render_rays_nokey(self, params, grid_bits, o, d, n_rounds: int = 4,
                           baked_cache=None):
        """Fixed-round render (traceable: no host sync) for shard_map /
        pjit pixel-parallel rendering. With baked_cache, rounds use the
        baked-table lookup instead of the model (nerf/baked.py)."""
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_max = jnp.asarray(self.aabb_max)
        tmin, tmax = _aabb_entry(o, d, aabb_min, aabb_max)
        R = o.shape[0]
        t, T = tmin, jnp.ones((R,))
        rgb, depth = jnp.zeros((R, 3)), jnp.zeros((R,))
        alive = tmax > tmin
        cost = jnp.zeros((R,))
        ev = self._render_extra_vec()
        extra_vec = None if ev is None else jnp.asarray(ev)
        for _ in range(n_rounds):
            if baked_cache is not None:
                t, T, rgb, depth, alive, cost = self._render_round_baked(
                    baked_cache, grid_bits, o, d, t, T, rgb, depth, alive,
                    tmax, cost, jnp.float32(self.min_transmittance))
            else:
                t, T, rgb, depth, alive, cost = self._render_round(
                    params, grid_bits, o, d, t, T, rgb, depth, alive, tmax,
                    cost, jnp.float32(self.min_transmittance),
                    extra_vec=extra_vec,
                )
        return rgb, 1.0 - T, depth

    def render_slice(
        self,
        width: int,
        height: int,
        camera_matrix: np.ndarray,
        focal_length: Optional[tuple[float, float]] = None,
        principal_point: tuple[float, float] = (0.5, 0.5),
        fov: float = 50.0,
        plane_dist: float = 1.5,
        background: tuple = (0.0, 0.0, 0.0, 0.0),
    ) -> np.ndarray:
        """ERenderMode::Slice — evaluate the full model on the plane of
        constant view-space depth `plane_dist` (the reference's
        m_slice_plane_z + m_scale) and shade rgba = [rgb·a, a] with
        a = 1 − exp(−σ·0.01): testbed_nerf.cu:1911-1914 (plane setup),
        :1485-1494 (ray parked at t = plane depth, z-depth units),
        :2070-2096 (full-model eval + compute_nerf_rgba, dt = 0.01)."""
        from ..common import LensMode
        from ..render.camera import uv_to_ray_cam

        if focal_length is None:
            fl = 0.5 * height / math.tan(0.5 * math.radians(fov))
            focal_length = (fl, fl)
        xform = np.asarray(camera_matrix, np.float32)
        params = self.opt.inference_params(self.state.opt_state,
                                           self.state.params)
        bricks = self._get_bricks(params)

        if getattr(self, "_slice_eval_fn", None) is None:
            model = self.model
            rgb_act, dens_act = self.rgb_activation, self.density_activation

            @jax.jit
            def _eval(params, bricks, pos_w, dirs, extra_vec):
                extra = (None if extra_vec is None else jnp.broadcast_to(
                    extra_vec, (pos_w.shape[0], extra_vec.shape[-1])))
                out = model(params, pos_w, warp_direction(dirs),
                            bricks=bricks, extra=extra)
                rgb = network_to_rgb(out[:, :3].astype(jnp.float32),
                                     rgb_act)
                sigma = network_to_density(out[:, 3].astype(jnp.float32),
                                           dens_act)
                a = jnp.clip(1.0 - jnp.exp(-sigma * 0.01), 0.0, 1.0)
                return jnp.concatenate([rgb * a[:, None], a[:, None]], -1)

            self._slice_eval_fn = _eval

        ys, xs = np.meshgrid(np.arange(height), np.arange(width),
                             indexing="ij")
        uv_np = np.stack([(xs.reshape(-1) + 0.5) / width,
                          (ys.reshape(-1) + 0.5) / height], -1)
        n = uv_np.shape[0]
        # pow2 chunk in [2^12, 2^16]: small previews don't pay the full
        # 65536-position network eval; bounded set of compiled shapes
        chunk = 1 << min(16, max(12, (max(n, 1) - 1).bit_length()))
        n_pad = (n + chunk - 1) // chunk * chunk
        uv_np = np.pad(uv_np.astype(np.float32), ((0, n_pad - n), (0, 0)))
        aabb_min = jnp.asarray(self.aabb_min, jnp.float32)
        aabb_max = jnp.asarray(self.aabb_max, jnp.float32)
        R = jnp.asarray(xform[:, :3])
        eye = jnp.asarray(xform[:, 3])
        fl_d = jnp.asarray([focal_length], jnp.float32)
        pp_d = jnp.asarray([principal_point], jnp.float32)
        outs = []
        for i in range(0, n_pad, chunk):
            uv_c = jnp.asarray(uv_np[i : i + chunk])
            # camera-space dir with unit z-depth — the reference's
            # unnormalized ray.d, so eye + dir·plane_dist is the plane
            # of constant view-space depth
            dir_cam, off_cam = uv_to_ray_cam(
                uv_c, (width, height),
                jnp.broadcast_to(fl_d, (uv_c.shape[0], 2)),
                jnp.broadcast_to(pp_d, (uv_c.shape[0], 2)),
                lens_mode=LensMode(self.dataset.lens_mode),
                lens_params=jnp.asarray(self.dataset.lens_params))
            d_w = dir_cam @ R.T
            o_w = eye + off_cam @ R.T
            world = o_w + d_w * plane_dist
            pos_w = (world - aabb_min) / (aabb_max - aabb_min)
            dirs = d_w / jnp.maximum(
                jnp.linalg.norm(d_w, axis=-1, keepdims=True), 1e-9)
            ev = self._render_extra_vec()
            outs.append(self._slice_eval_fn(
                params, bricks, pos_w, dirs,
                None if ev is None else jnp.asarray(ev)))
        rgba = np.asarray(jnp.concatenate(outs))[:n]
        bg = np.asarray(background, np.float32)
        rgb = rgba[:, :3] + (1.0 - rgba[:, 3:4]) * bg[:3] * bg[3]
        alpha = rgba[:, 3] + (1.0 - rgba[:, 3]) * bg[3]
        return np.concatenate([rgb, alpha[:, None]], -1).reshape(
            height, width, 4).astype(np.float32)

    def render(
        self,
        width: int,
        height: int,
        camera_matrix: np.ndarray,
        focal_length: Optional[tuple[float, float]] = None,
        principal_point: (tuple[float, float]) = (0.5, 0.5),
        fov: float = 50.0,
        spp: int = 1,
        background: tuple = (0.0, 0.0, 0.0, 0.0),
        to_srgb: bool = False,
        render_mode: str = "shade",
        uv_warp_fn=None,
        render_quality: str = "exact",
        return_depth: bool = False,
        out_uint8: bool = False,
    ) -> np.ndarray:
        """Render a frame → (H, W, 4) float32 RGBA.

        out_uint8 (slab path only): quantize to uint8 ON DEVICE before
        the host copy — a 1080p float frame is 33 MB through the
        tunneled device, a uint8 one 8 MB; this is the realistic
        interactive-viewer endpoint (the web viewer ships uint8 PNGs).

        Colors come out in the model's training space (sRGB for LDR
        datasets); `to_srgb` additionally converts HDR/linear renders.
        render_mode: "shade" | "depth" | "positions" | "normals" | "ao"
        (reference ERenderMode, common.h:68-80). With return_depth,
        returns (frame, (H, W) expected-termination depth) — the pyngp
        render_with_depth surface (python_api.cu:521-529).
        """
        self._ensure_fresh_jit()
        if focal_length is None:
            fl = 0.5 * height / math.tan(0.5 * math.radians(fov))
            focal_length = (fl, fl)
        xform = jnp.asarray(camera_matrix, jnp.float32)

        ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        xs = xs.reshape(-1).astype(np.float32)
        ys = ys.reshape(-1).astype(np.float32)

        params = self.opt.inference_params(self.state.opt_state, self.state.params)
        grid_bits = self.state.grid.skipmip
        bricks = self._get_bricks(params)
        baked_cache = None
        if render_mode != "shade" and render_quality in ("slab", "baked"):
            # the bake caches only carry [rgb, sigma] — G-buffer render
            # modes need the exact per-sample path
            render_quality = "exact"
        if render_quality == "slab":
            return self._render_slab(
                width, height, np.asarray(camera_matrix, np.float32),
                focal_length, principal_point, background,
                return_depth=return_depth, out_uint8=out_uint8)
        if render_quality == "baked":
            baked_cache = self._get_baked(
                origin=np.asarray(camera_matrix, np.float32)[:, 3])

        # baked renders use up to 4× larger ray chunks: the per-chunk
        # round loop pays host sync per dispatch, and the cheap baked
        # eval makes that overhead dominate at high resolutions
        n = xs.shape[0]
        if baked_cache is not None:
            chunk = min(1 << 18, max(1024, 1 << int(math.ceil(math.log2(n)))))
        else:
            chunk = 1 << 16
        n_pad = (n + chunk - 1) // chunk * chunk
        from ..common import LensMode
        from ..render.camera import uv_to_ray_cam

        fl_arr = jnp.asarray([focal_length], jnp.float32)
        pp_arr = jnp.asarray([principal_point], jnp.float32)

        def halton(i, b):
            f, r = 1.0, 0.0
            while i > 0:
                f /= b
                r += f * (i % b)
                i //= b
            return r

        rgb_acc = np.zeros((n, 3), np.float32)
        alpha_acc = np.zeros((n,), np.float32)
        depth_acc = np.zeros((n,), np.float32)
        for s in range(max(spp, 1)):
            # sub-pixel offsets: pixel centers for sample 0 (the
            # snap-to-pixel-centers eval protocol), Halton(2,3)
            # low-discrepancy for the rest (reference
            # ld_random_pixel_offset, common_device.cuh)
            off = (0.5, 0.5) if s == 0 else (halton(s, 2), halton(s, 3))
            uv = np.stack(
                [(xs + off[0]) / width, (ys + off[1]) / height], -1
            ).astype(np.float32)
            if uv_warp_fn is not None:  # foveated ray grids
                uv = np.asarray(uv_warp_fn(uv), np.float32)
            uv = np.pad(uv, ((0, n_pad - n), (0, 0)))
            rgbs, alphas, depths = [], [], []
            for i in range(0, n_pad, chunk):
                uv_c = jnp.asarray(uv[i : i + chunk])
                # use the dataset's lens model so eval renders match the
                # (distorted) physical cameras (reference renders through
                # the same Lens as training; run.py:257-317 protocol).
                # One jitted dispatch: ray gen + crop-box clip.
                tminmax = None
                if self.aperture_size > 0.0:
                    # thin-lens DoF (eager; rare path): offset origin on
                    # the aperture disk, re-aim at the focus plane
                    # (reference init_rays...:1441-1452); Halton(5,7)
                    dir_cam, o_off = uv_to_ray_cam(
                        uv_c, (width, height),
                        jnp.broadcast_to(fl_arr, (uv_c.shape[0], 2)),
                        jnp.broadcast_to(pp_arr, (uv_c.shape[0], 2)),
                        lens_mode=LensMode(self.dataset.lens_mode),
                        lens_params=jnp.asarray(self.dataset.lens_params),
                    )
                    ang = 2.0 * np.pi * halton(s + 1, 5)
                    rad = self.aperture_size * np.sqrt(halton(s + 1, 7))
                    lens = rad * (np.cos(ang) * np.asarray(xform[:, 0])
                                  + np.sin(ang) * np.asarray(xform[:, 1]))
                    focus_pt = dir_cam * self.focus_z  # camera space z=focus
                    d_cam = focus_pt - jnp.asarray(
                        [lens @ np.asarray(xform[:, 0]),
                         lens @ np.asarray(xform[:, 1]), 0.0])
                    d = d_cam @ xform[:, :3].T
                    o = jnp.broadcast_to(xform[:, 3] + jnp.asarray(lens), d.shape)
                    d = d / jnp.maximum(
                        jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
                else:
                    o, d, tmin, tmax = self._jit_prep_rays(
                        uv_c, jnp.asarray([width, height], jnp.float32),
                        fl_arr[0], pp_arr[0], xform)
                    tminmax = (tmin, tmax)
                rgb, alpha, depth, cost = self._render_rays(
                    params, grid_bits, o, d, bricks=bricks, tminmax=tminmax,
                    fast=(render_quality == "fast"), baked_cache=baked_cache)
                if render_mode == "shade" and self.train_envmap and \
                        "envmap" in self.state.cam:
                    ev = _read_envmap(self.state.cam["envmap"], d)
                    rgb = rgb + (1.0 - alpha)[:, None] * ev[:, :3]
                if render_mode in ("positions", "normals"):
                    hit = np.asarray(o) + np.asarray(depth)[:, None] * np.asarray(d)
                    if render_mode == "positions":
                        rel = (hit - self.aabb_min) / (self.aabb_max - self.aabb_min)
                        rgb = jnp.asarray(np.clip(rel, 0, 1))
                    else:
                        rgb = self._surface_normals(params, jnp.asarray(hit))
                elif render_mode == "depth":
                    rgb = jnp.broadcast_to(depth[:, None], (depth.shape[0], 3))
                elif render_mode == "ao":
                    rgb = jnp.broadcast_to(alpha[:, None], (alpha.shape[0], 3))
                elif render_mode == "cost":
                    # samples-per-ray heat (reference ERenderMode::Cost
                    # colors x/256 of white, testbed.cu render modes)
                    heat = jnp.clip(cost / 256.0, 0.0, 1.0)
                    rgb = jnp.stack([heat, 1.0 - heat, jnp.zeros_like(heat)], -1)
                elif render_mode == "encodingvis":
                    # encoding features at the expected hit point
                    # (reference ERenderMode::EncodingVis, starting at
                    # m_visualized_dimension)
                    hit = np.asarray(o) + np.asarray(depth)[:, None] * np.asarray(d)
                    pw = (jnp.asarray(hit) - jnp.asarray(self.aabb_min)) / (
                        jnp.asarray(self.aabb_max) - jnp.asarray(self.aabb_min))
                    feats = self.model.pos_encoding(
                        params.get("pos_enc"), jnp.clip(pw, 0.0, 1.0))
                    vd = int(np.clip(getattr(self, "visualized_dimension", 0),
                                     0, max(feats.shape[-1] - 3, 0)))
                    rgb = jnp.clip(
                        jnp.abs(feats[:, vd:vd + 3]) * 10.0, 0.0, 1.0)
                elif render_mode == "distortion":
                    # trained lens-distortion field magnitude at uv
                    # (reference ERenderMode::Distortion colors the
                    # distortion map, testbed.cu render modes)
                    if "distortion" in self.state.cam:
                        from ..image_fit.task import bilinear_read

                        off = np.asarray(bilinear_read(
                            self.state.cam["distortion"], uv_c))
                    else:
                        off = np.zeros((uv_c.shape[0], 2), np.float32)
                    mag = np.linalg.norm(off, axis=-1)
                    rgb = jnp.asarray(np.stack([
                        np.clip(off[:, 0] * 50 + 0.5, 0, 1),
                        np.clip(off[:, 1] * 50 + 0.5, 0, 1),
                        np.clip(mag * 100, 0, 1)], -1))
                elif render_mode == "slice":
                    # density slice on the view-orthogonal plane at the
                    # focus distance (reference ERenderMode::Slice /
                    # m_slice_plane_z)
                    pos = np.asarray(o) + float(self.focus_z) * np.asarray(d)
                    pw = (jnp.asarray(pos) - jnp.asarray(self.aabb_min)) / (
                        jnp.asarray(self.aabb_max) - jnp.asarray(self.aabb_min))
                    logit = self.model.density(
                        params, jnp.clip(pw, 0.0, 1.0))[:, 0].astype(jnp.float32)
                    dens = network_to_density(logit, self.density_activation)
                    heat = jnp.clip(jnp.log1p(dens) / 6.0, 0.0, 1.0)
                    inb = jnp.all((pw >= 0) & (pw <= 1), axis=-1)
                    heat = jnp.where(inb, heat, 0.0)
                    rgb = jnp.stack([heat, heat * 0.5, 1.0 - heat], -1)
                rgbs.append(np.asarray(rgb))
                alphas.append(np.asarray(alpha))
                depths.append(np.asarray(depth))
            rgb_acc += np.concatenate(rgbs)[:n]
            alpha_acc += np.concatenate(alphas)[:n]
            depth_acc += np.concatenate(depths)[:n]
        inv = 1.0 / max(spp, 1)
        rgb = rgb_acc * inv
        alpha = alpha_acc * inv

        if render_mode == "shade":
            bg = np.asarray(background, np.float32)
            rgb = rgb + (1.0 - alpha)[:, None] * bg[None, :3] * (bg[3] if len(bg) > 3 else 1.0)
            if to_srgb:
                rgb = np.asarray(linear_to_srgb(np.clip(rgb, 0, None)))
        frame = np.concatenate([rgb, alpha[:, None]], -1).reshape(height, width, 4)
        if return_depth:
            return frame, (depth_acc * inv).reshape(height, width)
        return frame

    def render_batch(
        self,
        width: int,
        height: int,
        camera_matrices,
        focal_lengths=None,
        principal_points=None,
        background: tuple = (0.0, 0.0, 0.0, 0.0),
        render_quality: str = "exact",
    ) -> np.ndarray:
        """Render V views through ONE shared compacted ray pool →
        (V, H, W, 4). The per-round host sync and alive-ray compaction
        are paid once for the whole batch instead of per view — the
        eval-protocol fast path (bench eval was ~26 s for 3 sequential
        views; the round loop dominates). Shade mode only."""
        self._ensure_fresh_jit()
        V = len(camera_matrices)
        params = self.opt.inference_params(self.state.opt_state,
                                           self.state.params)
        grid_bits = self.state.grid.skipmip
        bricks = self._get_bricks(params)
        baked_cache = None
        if render_quality == "baked":
            baked_cache = self._get_baked(
                origin=np.asarray(camera_matrices[0], np.float32)[:, 3])

        ys, xs = np.meshgrid(np.arange(height), np.arange(width),
                             indexing="ij")
        uv = np.stack([(xs.reshape(-1) + 0.5) / width,
                       (ys.reshape(-1) + 0.5) / height],
                      -1).astype(np.float32)
        os_, ds_, t0s, t1s = [], [], [], []
        for v in range(V):
            fl = (focal_lengths[v] if focal_lengths is not None
                  else (0.5 * height / math.tan(0.5 * math.radians(50.0)),) * 2)
            pp = (principal_points[v] if principal_points is not None
                  else (0.5, 0.5))
            o, d, tmin, tmax = self._jit_prep_rays(
                jnp.asarray(uv), jnp.asarray([width, height], jnp.float32),
                jnp.asarray(fl, jnp.float32), jnp.asarray(pp, jnp.float32),
                jnp.asarray(camera_matrices[v], jnp.float32))
            os_.append(o)
            ds_.append(d)
            t0s.append(tmin)
            t1s.append(tmax)
        o = jnp.concatenate(os_)
        d = jnp.concatenate(ds_)
        tminmax = (jnp.concatenate(t0s), jnp.concatenate(t1s))
        rgb, alpha, depth, _ = self._render_rays(
            params, grid_bits, o, d, bricks=bricks, tminmax=tminmax,
            baked_cache=baked_cache)
        rgb = np.asarray(rgb)
        alpha = np.asarray(alpha)
        bg = np.asarray(background, np.float32)
        rgb = rgb + (1.0 - alpha)[:, None] * bg[None, :3] * (
            bg[3] if len(bg) > 3 else 1.0)
        out = np.concatenate([rgb, alpha[:, None]], -1)
        return out.reshape(V, height, width, 4)

    def _surface_normals(self, params, pos_world):
        """-∇σ(pos), normalized (reference Normals render mode:
        density gradient via network backprop, testbed_nerf.cu:645)."""
        aabb_min = jnp.asarray(self.aabb_min)
        aabb_size = jnp.asarray(self.aabb_max - self.aabb_min)

        def density_sum(p):
            pw = (p - aabb_min) / aabb_size
            return jnp.sum(self.model.density(params, pw)[:, 0].astype(jnp.float32))

        g = jax.grad(density_sum)(pos_world)
        n = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
        return n * 0.5 + 0.5


@jax.jit
def _rebuild_error_cdf(error_map):
    """Build the sampling CDFs from the accumulated error map
    (reference construct_cdf_2d / construct_cdf_1d + host image mix,
    testbed_nerf.cu:1532-1580, 2791-2859). All cumsums, vectorized.

    error_map: (n_img, EH, EW) → (cdf_x (n,EH,EW) per-row conditional,
    cdf_y (n,EH) per-image marginal, cdf_img (n,), pmf_img (n,)),
    each smoothed toward uniform (MIN_PDF per axis, MIN_PMF for the
    image distribution)."""
    n, eh, ew = error_map.shape
    data = error_map + 1e-10
    cdf_x = jnp.cumsum(data, axis=2)
    row_tot = cdf_x[:, :, -1]
    cdf_x = (1.0 - MIN_PDF) * cdf_x / row_tot[:, :, None] + MIN_PDF * (
        jnp.arange(1, ew + 1, dtype=jnp.float32) / ew
    )
    cdf_y = jnp.cumsum(row_tot, axis=1)
    img_tot = cdf_y[:, -1]
    cdf_y = (1.0 - MIN_PDF) * cdf_y / img_tot[:, None] + MIN_PDF * (
        jnp.arange(1, eh + 1, dtype=jnp.float32) / eh
    )
    cdf_img_raw = jnp.cumsum(img_tot)
    total = cdf_img_raw[-1]
    pmf_img = (1.0 - MIN_PMF_IMG) * img_tot / total + MIN_PMF_IMG / n
    cdf_img = (1.0 - MIN_PMF_IMG) * cdf_img_raw / total + MIN_PMF_IMG * (
        jnp.arange(1, n + 1, dtype=jnp.float32) / n
    )
    return cdf_x, cdf_y, cdf_img, pmf_img


def _read_envmap(envmap, d):
    """Bilinear lat-long envmap read for ray directions (reference
    read_envmap, envmap.cuh)."""
    from ..image_fit.task import bilinear_read

    theta = jnp.arctan2(d[:, 0], d[:, 2])
    phi = jnp.arcsin(jnp.clip(d[:, 1], -1.0, 1.0))
    uv = jnp.stack(
        [theta / (2.0 * jnp.pi) + 0.5, phi / jnp.pi + 0.5], axis=-1
    )
    return bilinear_read(envmap, uv)


def _aabb_entry(o, d, aabb_min, aabb_max):
    from ..ops.raymarch import ray_intersect_aabb

    return ray_intersect_aabb(o, d, aabb_min, aabb_max)


def level_stats(task: "NerfTask") -> list[dict]:
    """Per-hashgrid-level parameter statistics (the reference's
    LevelStats / gather_histograms GUI panel, testbed.cu:5234-5284)."""
    tables = task.state.params["pos_enc"]  # per-level leaves
    out = []
    for lv, table in zip(task.model.pos_encoding.levels, tables):
        chunk = np.asarray(table)
        out.append({
            "resolution": lv.resolution,
            "hashed": lv.hashed,
            "n_entries": lv.size,
            "mean": float(chunk.mean()),
            "std": float(chunk.std()),
            "min": float(chunk.min()),
            "max": float(chunk.max()),
            "frac_nonzero": float((np.abs(chunk) > 1e-6).mean()),
        })
    return out


def density_slice(task: "NerfTask", z: float = 0.5, res: int = 256) -> np.ndarray:
    """Density on a z-slice of the unit cube (reference density-slice
    export / ERenderMode::Slice)."""
    import jax

    xs = (np.arange(res) + 0.5) / res
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    pts = np.stack([gx, gy, np.full_like(gx, z)], -1).reshape(-1, 3).astype(np.float32)
    params = task.opt.inference_params(task.state.opt_state, task.state.params)
    out = np.empty(len(pts), np.float32)
    chunk = 1 << 17
    for i in range(0, len(pts), chunk):
        d = task.model.density(params, jnp.asarray(pts[i : i + chunk]))
        out[i : i + chunk] = np.asarray(d[:, 0], np.float32)
    return np.exp(np.clip(out, -15, 15)).reshape(res, res)
