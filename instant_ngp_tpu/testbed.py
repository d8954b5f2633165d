"""Testbed — the orchestrator, mirroring the reference's `Testbed` class
(testbed.h:71, testbed.cu) and the pyngp Python API surface
(python_api.cu:439-870) so scripts/run.py-style drivers work unchanged.

Owns: mode, scene/dataset, network config, the per-mode task object
(train/render loops), camera state, frame loop with EMA timing meters
(reference testbed.h:1023-1027), and snapshot save/load.
"""

from __future__ import annotations

import dataclasses
import math
import threading
import time
from pathlib import Path
from typing import Optional

import numpy as np

from .common import (
    NERF_CASCADES,
    ColorSpace,
    RenderMode,
    TestbedMode,
    TonemapCurve,
    linear_to_srgb,
    srgb_to_linear,
)
from .config import default_config, load_network_config
from . import snapshot as snapshot_io


def mode_from_scene(path: str) -> TestbedMode:
    """reference common_host.cu:144-161."""
    p = Path(path)
    if p.is_dir() or p.suffix == ".json":
        return TestbedMode.NERF
    if p.suffix in (".obj", ".stl"):
        return TestbedMode.SDF
    if p.suffix in (".nvdb",):
        return TestbedMode.VOLUME
    if p.suffix.lower() in (".exr", ".png", ".jpg", ".jpeg", ".bmp", ".tga", ".bin"):
        return TestbedMode.IMAGE
    return TestbedMode.NONE


class Ema:
    """EMA meter (reference common_host.h:83-129)."""

    def __init__(self, half_life: float = 50.0):
        self.alpha = 0.5 ** (1.0 / half_life)
        self.value = 0.0
        self.n = 0

    def update(self, v: float):
        self.value = self.alpha * self.value + (1 - self.alpha) * v if self.n else v
        self.n += 1

    def val(self) -> float:
        return self.value


class _ImageMetadata:
    """Per-image view of dataset metadata (pyngp's
    TrainingImageMetadata binding; python_api.cu:755-765)."""

    def __init__(self, ds, i):
        from .common import Lens

        if getattr(ds, "per_image_resolution", None) is not None:
            self.resolution = tuple(int(v) for v in ds.per_image_resolution[i])
        else:
            self.resolution = tuple(int(v) for v in ds.resolution)
        self.focal_length = tuple(float(v) for v in ds.focal_lengths[i])
        self.principal_point = tuple(float(v) for v in ds.principal_points[i])
        self.rolling_shutter = tuple(
            float(v) for v in np.asarray(ds.rolling_shutter[i]).reshape(4))
        self.lens = Lens(ds.lens_mode, ds.lens_params)
        # legacy pyngp name for the lens (python_api.cu:757-758)
        self.camera_distortion = self.lens
        self.light_dir = (1e4, 1e4, 1e4)  # reference default (unset)


class _DatasetView:
    """pyngp testbed.nerf.training.dataset (python_api.cu:880-930)."""

    def __init__(self, tb):
        self._tb = tb

    @property
    def _ds(self):
        return self._tb.nerf_dataset

    @property
    def n_images(self) -> int:
        return int(self._ds.n_images)

    @property
    def metadata(self):
        return [_ImageMetadata(self._ds, i) for i in range(self._ds.n_images)]

    # readonly scalars of the pyngp NerfDataset binding
    # (python_api.cu:767-780)
    @property
    def transforms(self):
        return np.asarray(self._ds.xforms_start, np.float32)

    @property
    def render_aabb(self):
        from .common import BoundingBox

        if self._ds.render_aabb is None:
            return BoundingBox(np.zeros(3), np.ones(3))
        return BoundingBox(self._ds.render_aabb[0], self._ds.render_aabb[1])

    @property
    def up(self):
        return np.asarray(self._ds.up, np.float32)

    @property
    def offset(self):
        return np.asarray(self._ds.offset, np.float32)

    @property
    def scale(self) -> float:
        return float(self._ds.scale)

    @property
    def aabb_scale(self) -> int:
        return int(self._ds.aabb_scale)

    @property
    def from_mitsuba(self) -> bool:
        return bool(self._ds.from_mitsuba)

    @property
    def is_hdr(self) -> bool:
        return bool(self._ds.is_hdr)

    @property
    def envmap_resolution(self):
        t = self._tb.task
        if t is not None and "envmap" in t.state.cam:
            eh, ew = t.state.cam["envmap"].shape[:2]
            return (ew, eh)
        return (0, 0)

    @property
    def render_aabb_to_local(self):
        """pyngp dataset.render_aabb_to_local (python_api.cu:771)."""
        m = getattr(self._ds, "render_aabb_to_local", None)
        return (np.eye(3, dtype=np.float32) if m is None
                else np.asarray(m, np.float32))

    @property
    def paths(self):
        return list(getattr(self._ds, "paths", []))


class _NerfTrainingView:
    """pyngp testbed.nerf.training.* (python_api.cu Testbed::Nerf::
    Training bindings). Settings made before a scene is loaded are
    queued and applied when the task is built."""

    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)

    @property
    def dataset(self):
        return _DatasetView(self._tb)

    def _task(self):
        return self._tb.task

    @property
    def near_distance(self):
        t = self._task()
        return t.training_near_distance if t else self._tb._nerf_pending.get(
            "near_distance", 0.1)

    @near_distance.setter
    def near_distance(self, v):
        t = self._task()
        if t is not None:
            t.training_near_distance = float(v)
        else:
            self._tb._nerf_pending["near_distance"] = float(v)

    @property
    def random_bg_color(self):
        t = self._task()
        return t.random_bg_color if t else self._tb._nerf_pending.get(
            "random_bg_color", True)

    @random_bg_color.setter
    def random_bg_color(self, v):
        t = self._task()
        if t is not None:
            t.random_bg_color = bool(v)
        else:
            self._tb._nerf_pending["random_bg_color"] = bool(v)

    @property
    def train_mode(self):
        from .common import TrainMode

        t = self._task()
        mode = t.train_mode if t else self._tb._nerf_pending.get("train_mode", "nerf")
        return TrainMode(mode)

    @train_mode.setter
    def train_mode(self, v):
        from .common import TrainMode

        val = TrainMode(v).value
        t = self._task()
        if t is not None:
            t.train_mode = val
        else:
            self._tb._nerf_pending["train_mode"] = val

    @property
    def n_images_for_training(self):
        return self.dataset.n_images

    def _fwd_get(self, name, default):
        t = self._task()
        return getattr(t, name) if t is not None else self._tb._nerf_pending.get(name, default)

    def _fwd_set(self, name, v, rebuild=False):
        t = self._task()
        if t is None:
            self._tb._nerf_pending[name] = v
        else:
            setattr(t, name, v)
            if rebuild:
                t.rebuild_jit_programs()

    @property
    def density_grid_decay(self):
        return self._fwd_get("density_grid_decay", 0.95)

    @density_grid_decay.setter
    def density_grid_decay(self, v):
        self._fwd_set("density_grid_decay", float(v))

    @property
    def sample_image_proportional_to_error(self):
        return self._fwd_get("sample_image_proportional_to_error", True)

    @sample_image_proportional_to_error.setter
    def sample_image_proportional_to_error(self, v):
        self._fwd_set("sample_image_proportional_to_error", bool(v),
                      rebuild=True)

    @property
    def sample_focal_plane_proportional_to_error(self):
        return self._fwd_get("sample_focal_plane_proportional_to_error", True)

    @sample_focal_plane_proportional_to_error.setter
    def sample_focal_plane_proportional_to_error(self, v):
        self._fwd_set("sample_focal_plane_proportional_to_error", bool(v),
                      rebuild=True)

    @property
    def optimize_extra_dims(self):
        return self._fwd_get("optimize_extra_dims", False)

    @optimize_extra_dims.setter
    def optimize_extra_dims(self, v):
        self._fwd_set("optimize_extra_dims", bool(v), rebuild=True)

    # reference binds the same field under both names
    # (python_api.cu:789 optimize_per_image_latents → optimize_extra_dims)
    optimize_per_image_latents = optimize_extra_dims

    @property
    def n_steps_between_cam_updates(self):
        return self._fwd_get("n_steps_between_cam_updates", 16)

    @n_steps_between_cam_updates.setter
    def n_steps_between_cam_updates(self, v):
        self._fwd_set("n_steps_between_cam_updates", int(v))

    @property
    def extrinsic_learning_rate(self):
        t = self._task()
        if t is None:
            return self._tb._nerf_pending.get("extrinsic_learning_rate", 1e-3)
        return float(t.cam_opt.spec.learning_rate
                     * max(int(t.n_steps_between_cam_updates), 1))

    @extrinsic_learning_rate.setter
    def extrinsic_learning_rate(self, v):
        t = self._task()
        if t is None:
            self._tb._nerf_pending["extrinsic_learning_rate"] = float(v)
        else:
            t.set_camera_optimizer_hparams(extrinsic_learning_rate=float(v))

    @property
    def exposure_l2_reg(self):
        return self._fwd_get("exposure_l2_reg", 0.0)

    @exposure_l2_reg.setter
    def exposure_l2_reg(self, v):
        self._fwd_set("exposure_l2_reg", float(v), rebuild=True)

    @property
    def intrinsic_l2_reg(self):
        return self._fwd_get("intrinsic_l2_reg", 1e-4)

    @intrinsic_l2_reg.setter
    def intrinsic_l2_reg(self, v):
        self._fwd_set("intrinsic_l2_reg", float(v), rebuild=True)

    @property
    def extrinsic_l2_reg(self):
        t = self._task()
        if t is None:
            return self._tb._nerf_pending.get("extrinsic_l2_reg", 1e-4)
        return float(t.cam_opt.spec.l2_reg)

    @extrinsic_l2_reg.setter
    def extrinsic_l2_reg(self, v):
        t = self._task()
        if t is None:
            self._tb._nerf_pending["extrinsic_l2_reg"] = float(v)
        else:
            t.set_camera_optimizer_hparams(extrinsic_l2_reg=float(v))

    def set_image(self, frame_idx: int, img, depth_img=None,
                  depth_scale: float = 1.0):
        """pyngp testbed.nerf.training.set_image (python_api.cu:45-72,
        :846-848): replace a training image (+ optional depth) at
        runtime, e.g. for streaming/SLAM-style captures."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene before set_image")
        t.set_training_image(frame_idx, img, depth_img, depth_scale)

    @property
    def loss_type(self):
        """pyngp nerf.training.loss_type (python_api.cu:785)."""
        from .ops.losses import loss_type_from_string

        t = self._task()
        if t is None:
            return loss_type_from_string(
                self._tb._nerf_pending.get("loss_type", "huber"))
        return loss_type_from_string(getattr(t, "_loss_type_name", "huber"))

    @loss_type.setter
    def loss_type(self, v):
        from .ops.losses import loss_fn, loss_type_from_string

        name = str(getattr(v, "name", v))
        t = self._task()
        if t is None:
            self._tb._nerf_pending["loss_type"] = name
            return
        t.loss = loss_fn(loss_type_from_string(name))
        t._loss_type_name = name
        t.rebuild_jit_programs()

    def _opt_flag(self, name):
        t = self._task()
        return (bool(getattr(t, name)) if t is not None
                else bool(self._tb._nerf_pending.get(name, False)))

    def _set_opt_flag(self, name, v):
        """Camera-optimization toggles (pyngp optimize_extrinsics /
        _exposure / _focal_length / _distortion, python_api.cu:791-800).
        Flipping one mid-run re-derives the jitted step (the flags are
        trace-time state) and materializes any missing camera params."""
        t = self._task()
        if t is None:
            self._tb._nerf_pending[name] = bool(v)
            return
        setattr(t, name, bool(v))
        if name == "optimize_distortion" and v and \
                "distortion" not in t.state.cam:
            import dataclasses as dc

            import jax.numpy as jnp

            cam = dict(t.state.cam)
            cam["distortion"] = jnp.zeros((32, 32, 2))
            t.state = dc.replace(t.state, cam=cam,
                                 cam_opt=t.cam_opt.init(cam))
        t.rebuild_jit_programs()

    @property
    def optimize_extrinsics(self):
        return self._opt_flag("optimize_extrinsics")

    @optimize_extrinsics.setter
    def optimize_extrinsics(self, v):
        self._set_opt_flag("optimize_extrinsics", v)

    @property
    def optimize_exposure(self):
        return self._opt_flag("optimize_exposure")

    @optimize_exposure.setter
    def optimize_exposure(self, v):
        self._set_opt_flag("optimize_exposure", v)

    @property
    def optimize_focal_length(self):
        return self._opt_flag("optimize_focal_length")

    @optimize_focal_length.setter
    def optimize_focal_length(self, v):
        self._set_opt_flag("optimize_focal_length", v)

    @property
    def optimize_distortion(self):
        return self._opt_flag("optimize_distortion")

    @optimize_distortion.setter
    def optimize_distortion(self, v):
        self._set_opt_flag("optimize_distortion", v)

    # reference exposes the latents toggle under two names
    # (python_api.cu:791-792)
    @property
    def optimize_per_image_latents(self):
        return self.optimize_extra_dims

    @optimize_per_image_latents.setter
    def optimize_per_image_latents(self, v):
        self.optimize_extra_dims = v

    @property
    def include_sharpness_in_error(self):
        return self._fwd_get("include_sharpness_in_error", False)

    @include_sharpness_in_error.setter
    def include_sharpness_in_error(self, v):
        """pyngp include_sharpness_in_error: needs the sharpness maps
        and the sharp grid, so it only takes effect on task (re)build."""
        t = self._task()
        if t is not None and bool(v) != t.include_sharpness_in_error:
            raise RuntimeError(
                "include_sharpness_in_error must be set before "
                "load_training_data (it allocates the sharpness maps)")
        self._tb._nerf_pending["include_sharpness_in_error"] = bool(v)

    @property
    def linear_colors(self):
        """pyngp nerf.training.linear_colors (python_api.cu:784): HDR
        datasets train in linear space; LDR in sRGB (readonly here —
        chosen by the dataset, testbed_nerf.cu:2354)."""
        ds = getattr(self._tb, "nerf_dataset", None)
        return bool(ds.is_hdr) if ds is not None else False

    @property
    def depth_supervision_lambda(self):
        return self._fwd_get("depth_supervision_lambda", 0.0)

    @depth_supervision_lambda.setter
    def depth_supervision_lambda(self, v):
        # traced as a Python float inside the jitted loss → rebuild
        self._fwd_set("depth_supervision_lambda", float(v), rebuild=True)

    @property
    def depth_loss_type(self):
        """pyngp depth_loss_type (python_api.cu:786; default L1)."""
        return self._fwd_get("depth_loss_type", "L1")

    @depth_loss_type.setter
    def depth_loss_type(self, v):
        from .ops.losses import loss_type_from_string

        name = getattr(v, "name", v)  # accept LossType enums or strings
        loss_type_from_string(str(name))  # validate
        self._fwd_set("depth_loss_type", str(name), rebuild=True)

    def set_camera_intrinsics(self, frame_idx: int, fx: float = 0.0,
                              fy: float = 0.0, cx: float = -0.5,
                              cy: float = -0.5, k1: float = 0.0,
                              k2: float = 0.0, p1: float = 0.0,
                              p2: float = 0.0, k3: float = 0.0,
                              k4: float = 0.0, is_fisheye: bool = False):
        """pyngp set_camera_intrinsics (python_api.cu:815-831)."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        t.set_camera_intrinsics(frame_idx, fx, fy, cx, cy, k1, k2, p1,
                                p2, k3, k4, is_fisheye)

    def set_camera_extrinsics(self, frame_idx: int, camera_to_world,
                              convert_to_ngp: bool = True):
        """pyngp set_camera_extrinsics (python_api.cu:832-839)."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        t.set_camera_extrinsics(frame_idx, camera_to_world,
                                convert_to_ngp=convert_to_ngp)

    def set_camera_extrinsics_rolling_shutter(
            self, frame_idx: int, camera_to_world_start,
            camera_to_world_end, rolling_shutter,
            convert_to_ngp: bool = True):
        """pyngp set_camera_extrinsics_rolling_shutter
        (testbed_nerf.cu:2188-2209)."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        t.set_camera_extrinsics(frame_idx, camera_to_world_start,
                                convert_to_ngp=convert_to_ngp,
                                xform_end=camera_to_world_end,
                                rolling_shutter=rolling_shutter)

    def get_camera_extrinsics(self, frame_idx: int):
        """pyngp get_camera_extrinsics (python_api.cu:840-844)."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        return t.get_camera_extrinsics(frame_idx)

    def reset_camera_extrinsics(self):
        """pyngp reset_camera_extrinsics (testbed_nerf.cu:2215-2227):
        zero all trained pose/exposure offsets."""
        t = self._task()
        if t is None:
            return
        import dataclasses as dc

        cam = dict(t.state.cam)
        for k in ("rot", "pos", "exposure"):
            cam[k] = cam[k] * 0.0
        t.state = dc.replace(t.state, cam=cam, cam_opt=t.cam_opt.init(cam))

    def get_extra_dims(self, view: int):
        """pyngp get_extra_dims (python_api.cu:810-813)."""
        t = self._task()
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        return t.get_extra_dims(view)


class _NerfView:
    """pyngp testbed.nerf.* (python_api.cu:520-620)."""

    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)
        object.__setattr__(self, "training", _NerfTrainingView(tb))

    @property
    def render_min_transmittance(self):
        return self._tb.nerf_min_transmittance

    @render_min_transmittance.setter
    def render_min_transmittance(self, v):
        self._tb.nerf_min_transmittance = float(v)

    @property
    def sharpen(self):
        return getattr(self._tb, "_nerf_sharpen", 0.0)

    @sharpen.setter
    def sharpen(self, v):
        self._tb._nerf_sharpen = float(v)

    @property
    def rendering_extra_dims_from_training_view(self):
        t = self._tb.task
        if t is not None:
            return t.rendering_extra_dims_from_training_view
        return self._tb._nerf_pending.get(
            "rendering_extra_dims_from_training_view", 0)

    @rendering_extra_dims_from_training_view.setter
    def rendering_extra_dims_from_training_view(self, v):
        t = self._tb.task
        if t is None:
            self._tb._nerf_pending[
                "rendering_extra_dims_from_training_view"] = int(v)
        else:
            t.rendering_extra_dims_from_training_view = int(v)

    def set_rendering_extra_dims_from_training_view(self, i: int):
        """pyngp: render with training view i's latent codes
        (python_api.cu:735-745)."""
        self.rendering_extra_dims_from_training_view = int(i)

    def set_rendering_extra_dims(self, vals):
        """pyngp: render with an explicit latent vector
        (python_api.cu:725-733)."""
        t = self._tb.task
        if t is None:
            self._tb._nerf_pending["rendering_extra_dims"] = vals
        else:
            t.set_rendering_extra_dims(vals)

    def get_rendering_extra_dims(self):
        """pyngp get_rendering_extra_dims (python_api.cu:741-743):
        the latent vector renders currently condition on."""
        import numpy as _np

        t = self._tb.task
        if t is None:
            return _np.zeros((0,), _np.float32)
        v = t._render_extra_vec()
        return _np.zeros((0,), _np.float32) if v is None else v

    def find_closest_training_view(self, pose=None) -> int:
        """pyngp find_closest_training_view (python_api.cu:730-733):
        training view closest to the current (or given) camera."""
        t = self._tb.task
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        if pose is None:
            pose = self._tb.camera_matrix
        return t.find_closest_training_view(pose)

    @property
    def rgb_activation(self):
        """pyngp nerf.rgb_activation (python_api.cu:716)."""
        t = self._tb.task
        return t.rgb_activation if t is not None else None

    @rgb_activation.setter
    def rgb_activation(self, v):
        from .common import NerfActivation

        t = self._tb.task
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        t.rgb_activation = NerfActivation(v)
        t.rebuild_jit_programs()

    @property
    def density_activation(self):
        """pyngp nerf.density_activation (python_api.cu:717)."""
        t = self._tb.task
        return t.density_activation if t is not None else None

    @density_activation.setter
    def density_activation(self, v):
        from .common import NerfActivation

        t = self._tb.task
        if t is None:
            raise RuntimeError("load a NeRF scene first")
        t.density_activation = NerfActivation(v)
        t.rebuild_jit_programs()

    @property
    def render_gbuffer_hard_edges(self) -> bool:
        """pyngp nerf.render_gbuffer_hard_edges (python_api.cu:723):
        G-buffer modes shade the raw surface value instead of the
        accumulation-smoothed one; kept as a flag for API parity (the
        headless G-buffer paths already shade hard values)."""
        return getattr(self._tb, "_gbuffer_hard_edges", False)

    @render_gbuffer_hard_edges.setter
    def render_gbuffer_hard_edges(self, v: bool):
        self._tb._gbuffer_hard_edges = bool(v)

    @property
    def cone_angle_constant(self):
        t = self._tb.task
        if t is not None:
            return t.march_cfg.cone_angle
        return self._tb._nerf_pending.get("cone_angle_constant", 1.0 / 256.0)

    @cone_angle_constant.setter
    def cone_angle_constant(self, v):
        import dataclasses as dc

        t = self._tb.task
        if t is not None:
            t.cone_angle = float(v)
            t.march_cfg = dc.replace(t.march_cfg, cone_angle=float(v))
            t.rebuild_jit_programs()
        else:
            self._tb._nerf_pending["cone_angle_constant"] = float(v)


class _SdfTrainingView:
    """pyngp testbed.sdf.training (python_api.cu:869-871)."""

    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)

    def _task(self):
        return self._tb.task

    @property
    def generate_sdf_data_online(self) -> bool:
        t = self._task()
        return t is not None and getattr(t, "_override", None) is None

    @property
    def surface_offset_scale(self):
        t = self._task()
        return t.surface_offset_scale if t else 1.0

    @surface_offset_scale.setter
    def surface_offset_scale(self, v):
        self._task().surface_offset_scale = float(v)


class _SdfView:
    """pyngp testbed.sdf.* (python_api.cu:855-867). Attribute names
    forward to the SdfTask knobs; reads before a scene is loaded give
    the reference defaults."""

    _FWD = ("analytic_normals", "shadow_sharpness", "fd_normals_epsilon",
            "zero_offset", "brdf", "floor_enable", "sun_color",
            "groundtruth_mode")
    _DEFAULTS = {"analytic_normals": True, "shadow_sharpness": 16.0,
                 "fd_normals_epsilon": 1e-3, "zero_offset": 0.0,
                 "brdf": None, "floor_enable": False,
                 "sun_color": (1.0, 1.0, 1.0),
                 "groundtruth_mode": "raytracedmesh"}

    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)
        object.__setattr__(self, "training", _SdfTrainingView(tb))

    def _task(self):
        return self._tb.task if self._tb.mode == TestbedMode.SDF else None

    def __getattr__(self, name):
        if name in self._FWD:
            t = self._task()
            return getattr(t, name) if t else self._DEFAULTS[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in self._FWD:
            t = self._task()
            if t is None:
                raise RuntimeError(f"load an SDF scene before setting {name}")
            setattr(t, name, value)
        else:
            object.__setattr__(self, name, value)

    @property
    def mesh_sdf_mode(self):
        from .common import MeshSdfMode

        t = self._task()
        return MeshSdfMode(t.sdf_mode if t else "pseudonormal")

    @mesh_sdf_mode.setter
    def mesh_sdf_mode(self, v):
        from .common import MeshSdfMode

        self._task().sdf_mode = MeshSdfMode(v).value

    @property
    def mesh_scale(self):
        t = self._task()
        return float(t.mesh_scale) if t else 1.0

    @property
    def use_triangle_octree(self) -> bool:
        t = self._task()
        return bool(t is not None and t.octree is not None)

    @property
    def calculate_iou_online(self):
        return self._tb.calculate_iou_online

    @calculate_iou_online.setter
    def calculate_iou_online(self, v):
        self._tb.calculate_iou_online = bool(v)


class _ImageView:
    """pyngp testbed.image.* (python_api.cu:874-880)."""

    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)
        object.__setattr__(self, "training", _ImageTrainingView(tb))

    def _task(self):
        return self._tb.task if self._tb.mode == TestbedMode.IMAGE else None

    @property
    def random_mode(self):
        from .common import RandomMode

        t = self._task()
        return RandomMode(t.random_mode if t else "stratified")

    @random_mode.setter
    def random_mode(self, v):
        from .common import RandomMode

        self._task().random_mode = RandomMode(v).value


class _ImageTrainingView:
    def __init__(self, tb):
        object.__setattr__(self, "_tb", tb)

    def _task(self):
        return self._tb.task

    @property
    def snap_to_pixel_centers(self):
        t = self._task()
        return t.snap_to_pixel_centers if t else False

    @snap_to_pixel_centers.setter
    def snap_to_pixel_centers(self, v):
        self._task().snap_to_pixel_centers = bool(v)

    @property
    def linear_colors(self):
        t = self._task()
        return t.linear_colors if t else False

    @linear_colors.setter
    def linear_colors(self, v):
        self._task().linear_colors = bool(v)


def _unsharp(frame: np.ndarray, amount: float) -> np.ndarray:
    """3×3 unsharp mask on the rgb channels (reference `sharpen`
    post-process in the tonemap stage, render_buffer.cu)."""
    rgb = frame[..., :3]
    pad = np.pad(rgb, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blur = (
        pad[:-2, :-2] + pad[:-2, 1:-1] + pad[:-2, 2:]
        + pad[1:-1, :-2] + pad[1:-1, 1:-1] + pad[1:-1, 2:]
        + pad[2:, :-2] + pad[2:, 1:-1] + pad[2:, 2:]
    ) / 9.0
    out = np.array(frame, copy=True)
    out[..., :3] = rgb + amount * (rgb - blur)
    return out


class Testbed:
    def __init__(self, mode: TestbedMode | str = TestbedMode.NONE):
        if isinstance(mode, str):
            mode = TestbedMode(mode.lower())
        self.mode = mode
        self.task = None
        self.network_config: dict = {}
        self.network_config_path: Optional[Path] = None

        # public knobs mirroring pyngp fields
        self.shall_train = True
        self.training_step = 0
        self.training_batch_size = 1 << 18
        self.background_color = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
        self.fov = 50.625
        self.seed = 1337
        self.nerf_min_transmittance = 1e-4
        self.snap_to_pixel_centers = True
        self.dynamic_res = False
        self.dynamic_res_target_fps = 20.0
        self.camera_matrix = np.concatenate(
            [np.eye(3, dtype=np.float32), np.array([[0.5], [0.5], [-1.5]], np.float32)], axis=1
        )
        self.scale = 1.5
        self.loss_graph: list[float] = []

        # pyngp binding surface (python_api.cu:439-870): fields the
        # reference scripts/run.py drives verbatim
        self.render_ground_truth = False
        self.color_space = ColorSpace.SRGB
        self.tonemap_curve = TonemapCurve.IDENTITY
        self.exposure = 0.0
        self.fov_axis = 1
        self.camera_smoothing = False
        self.render_with_lens_distortion = True
        # "exact" | "fast" (fast = stochastic-corner hashed gathers;
        # measured NOT worth it — see encode_infer docstring — kept
        # for experimentation only) | "baked" | "slab"
        self.render_quality = "exact"
        # reference m_render_mode / m_slice_plane_z (python_api.cu
        # ERenderMode binding, :630)
        self.render_mode = RenderMode.SHADE
        self.slice_plane_z = 0.0
        # principal point used when rendering free cameras (reference
        # m_screen_center, testbed.h:646; dataset views keep their own)
        self.screen_center = (0.5, 0.5)
        # reference m_fixed_res_factor: render factor = 8/this when
        # dynamic_res is off (testbed.cu:3318, slider :1434)
        self.fixed_res_factor = 8
        # alpha<1 pixels composite over a gray checkerboard instead of
        # background_color (reference m_render_transparency_as_checkerboard,
        # render_buffer tonemap path)
        self.render_transparency_as_checkerboard = False
        # reference m_bounding_radius (testbed.h:664): camera orbit home
        self.bounding_radius = 1.0
        # jax.jit compiles every hot path; kept for pyngp API compat
        # with the reference's NVRTC megakernel toggle (m_jit_fusion)
        self.jit_fusion = True
        # reference m_render (pyngp is_rendering): pauses frame renders
        # in the interactive viewer while training continues
        self.is_rendering = True
        # SDF: compute IoU vs GT every 16 frames into self.sdf_iou
        # (reference calculate_iou_online + its ImGui display)
        self.calculate_iou_online = False
        self.sdf_iou: Optional[float] = None
        # camera-path playback/recording (pyngp m_record_camera_path,
        # CameraPath.update_cam_from_path/play_time/auto_play_speed)
        from .render.camera_path import CameraPath

        self.camera_path = CameraPath()
        self.record_camera_path = False
        # camera extrapolation for latency compensation (pyngp
        # camera_prediction_mode / predict_view_camera; reference
        # MatLogCameraPredictor, common_host.h:156-253). NONE disables
        # the per-frame pose feed.
        from .render.camera_predictor import CameraPredictionMode

        self.camera_prediction_mode = CameraPredictionMode.NONE
        self._cam_predictor = None
        # reference m_parallax_shift (testbed.h): GUI camera pivot
        # offset; stored for pyngp compat (headless ray gen has no
        # look-around pivot)
        self.parallax_shift = np.zeros(3, np.float32)
        # EncodingVis controls (reference m_visualized_dimension/_layer)
        self.visualized_dimension = 0
        self.visualized_layer = 0
        # GT overlay content (reference m_ground_truth_render_mode:
        # Shade shows the training image, Depth its depth channel)
        from .common import GroundTruthRenderMode

        self.groundtruth_render_mode = GroundTruthRenderMode.SHADE
        # wireframe debug overlays (reference m_visualize_unit_cube and
        # the per-view camera frusta of draw_visualizations)
        self.visualize_unit_cube = False
        self.visualize_cameras = False
        # remaining pyngp Testbed knobs (python_api.cu:625-680)
        self.autofocus = False  # m_autofocus: focus_z from scene depth
        self.zoom = 1.0  # m_zoom: focal scale applied at render
        self.up_dir = np.array([0.0, 1.0, 0.0], np.float32)  # m_up_dir
        self.sun_dir = np.array([0.577, -0.577, 0.577],
                                np.float32)  # m_sun_dir (SDF light)
        self.floor_enable = False  # m_floor_enable (SDF ground plane)
        self.display_gui = True  # m_imgui.enabled analog (viewer HUD)
        self._last_frame = None  # view() returns the last render
        self.root_dir = str(Path(__file__).resolve().parents[1])
        self._nerf_pending: dict = {}
        self.nerf = _NerfView(self)
        self.sdf = _SdfView(self)
        self.image = _ImageView(self)
        self._view_index: Optional[int] = None

        # timing meters (reference testbed.h:1023-1027)
        self.training_prep_ms = Ema()
        self.training_ms = Ema()
        self.render_ms = Ema()
        self.frame_ms = Ema()

        self._loss_scalar = Ema(half_life=10.0)

        # cross-thread task queue (reference SharedQueue<ICallable>
        # m_task_queue, testbed.h:735, drained at the top of frame(),
        # testbed.cu:3969-3973): background threads post callables that
        # must run on the thread pumping frame() — e.g. a viewer
        # request mutating task state between train steps
        import collections

        self._task_queue: collections.deque = collections.deque()
        self._task_queue_lock = threading.Lock()

    def post_task(self, fn) -> "threading.Event":
        """Enqueue a callable for execution at the start of the next
        frame() tick on the frame-loop thread (reference
        Testbed::do_gui_work / m_task_queue semantics). Returns an
        Event set once the callable has run."""
        done = threading.Event()
        with self._task_queue_lock:
            self._task_queue.append((fn, done))
        return done

    def _drain_task_queue(self):
        while True:
            with self._task_queue_lock:
                if not self._task_queue:
                    return
                fn, done = self._task_queue.popleft()
            try:
                fn()
            finally:
                done.set()

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------
    def load_file(self, path: str):
        """Dispatch like reference load_file (testbed.cu:353-411):
        snapshot → load_snapshot; else training data."""
        p = Path(path)
        if p.suffix in (".ingp", ".msgpack"):
            self.load_snapshot(path)
            return
        self.load_training_data(path)

    def load_training_data(self, path: str):
        self.scene_path = str(path)
        mode = mode_from_scene(path)
        if mode == TestbedMode.NONE:
            raise ValueError(f"cannot infer mode from scene path {path}")
        self.mode = mode
        if not self.network_config:
            self.network_config = default_config(mode.value)
        self._build_task()

    def reload_network_from_file(self, config_path: str):
        self.network_config_path = Path(config_path)
        self.network_config = load_network_config(
            config_path, mode=self.mode.value if self.mode != TestbedMode.NONE else None
        )
        if getattr(self, "scene_path", None):
            self._build_task()

    def reload_network_from_json(self, config: dict):
        self.network_config = dict(config)
        if getattr(self, "scene_path", None):
            self._build_task()

    def _build_task(self):
        mode = self.mode
        if mode == TestbedMode.IMAGE:
            from .image_fit.task import ImageTask
            from .io.image import load_image

            img, is_hdr = load_image(self.scene_path)
            self.task = ImageTask(
                img, is_hdr, self.network_config, seed=self.seed,
                batch_size=self.training_batch_size,
            )
        elif mode == TestbedMode.NERF:
            from .io.nerf_loader import load_nerf
            from .nerf.task import NerfTask

            self.nerf_dataset = load_nerf(self.scene_path)
            pend = self._nerf_pending

            def _flag(name):
                return bool(pend.get(name, getattr(self, name, False)))

            self.task = NerfTask(
                self.nerf_dataset, self.network_config, seed=self.seed,
                target_batch_size=self.training_batch_size,
                optimize_extrinsics=_flag("optimize_extrinsics"),
                optimize_exposure=_flag("optimize_exposure"),
                optimize_focal_length=_flag("optimize_focal_length"),
                optimize_distortion=_flag("optimize_distortion"),
                train_envmap=getattr(self, "train_envmap", False),
                include_sharpness_in_error=_flag("include_sharpness_in_error"),
            )
            # default view: first training camera
            self.camera_matrix = self.nerf_dataset.xforms_start[0].copy()
            # settings queued on the pyngp nerf.* views before a scene
            # was loaded
            if "near_distance" in pend:
                self.task.training_near_distance = pend["near_distance"]
            if "random_bg_color" in pend:
                self.task.random_bg_color = pend["random_bg_color"]
            if "train_mode" in pend:
                self.task.train_mode = pend["train_mode"]
            if "cone_angle_constant" in pend:
                self.task.cone_angle = pend["cone_angle_constant"]
                self.task.march_cfg = dataclasses.replace(
                    self.task.march_cfg, cone_angle=pend["cone_angle_constant"])
                self.task.rebuild_jit_programs()
            for k in ("density_grid_decay",
                      "sample_image_proportional_to_error",
                      "sample_focal_plane_proportional_to_error",
                      "optimize_extra_dims", "n_steps_between_cam_updates",
                      "exposure_l2_reg", "intrinsic_l2_reg",
                      "rendering_extra_dims_from_training_view",
                      "depth_supervision_lambda", "depth_loss_type"):
                if k in pend:
                    setattr(self.task, k, pend[k])
            if "loss_type" in pend:
                from .ops.losses import loss_fn, loss_type_from_string

                self.task.loss = loss_fn(
                    loss_type_from_string(pend["loss_type"]))
                self.task._loss_type_name = pend["loss_type"]
                self.task.rebuild_jit_programs()
            if "extrinsic_learning_rate" in pend or "extrinsic_l2_reg" in pend:
                self.task.set_camera_optimizer_hparams(
                    extrinsic_learning_rate=pend.get("extrinsic_learning_rate"),
                    extrinsic_l2_reg=pend.get("extrinsic_l2_reg"))
            if "rendering_extra_dims" in pend:
                self.task.set_rendering_extra_dims(pend["rendering_extra_dims"])
        elif mode == TestbedMode.SDF:
            from .sdf.task import SdfTask

            self.task = SdfTask(self.scene_path, self.network_config, seed=self.seed)
        elif mode == TestbedMode.VOLUME:
            from .volume.task import VolumeTask

            self.task = VolumeTask(self.scene_path, self.network_config, seed=self.seed)
        else:
            raise ValueError(mode)
        if hasattr(self.task, "shall_train_encoding"):
            # freezes queued on the Testbed before the scene loaded
            if getattr(self, "_pend_train_enc", None) is not None:
                self.task.shall_train_encoding = self._pend_train_enc
            if getattr(self, "_pend_train_net", None) is not None:
                self.task.shall_train_network = self._pend_train_net
            if (getattr(self, "_pend_train_enc", None) is not None
                    or getattr(self, "_pend_train_net", None) is not None):
                self.task.rebuild_jit_programs()
        self.training_step = 0

    # ------------------------------------------------------------------
    # the heartbeat
    # ------------------------------------------------------------------
    def frame(self) -> bool:
        """One tick: train step(s) (reference frame → train_and_render,
        testbed.cu:3908-4034). Headless: rendering happens on demand."""
        t0 = time.perf_counter()
        self._drain_task_queue()
        if self.shall_train and self.task is not None:
            loss = self.task.train(1)
            self.training_step = self.task.training_step
            self._loss_scalar.update(loss)
            self.loss_graph.append(loss)
            if getattr(self.task, "training_aborted", False):
                # reference sets m_train = false on zero-sample batches
                self.shall_train = False
            if (self.calculate_iou_online and self.mode == TestbedMode.SDF
                    and self.training_step % 16 == 0):
                # reference calculate_iou_online: periodic EMA IoU
                # display (testbed_sdf.cu:1636-1680); small sample count
                # per tick like the reference's online estimate
                self.sdf_iou = float(self.task.calculate_iou(1 << 14))
        from .render.camera_predictor import CameraPredictionMode

        mode = self.camera_prediction_mode
        if mode == CameraPredictionMode.NONE:
            self._cam_predictor = None
        else:
            from .render.camera_predictor import MatLogCameraPredictor

            if (self._cam_predictor is None
                    or getattr(self, "_cam_predictor_mode", None) != mode):
                # (re)build when the mode changes mid-run
                self._cam_predictor = MatLogCameraPredictor(
                    is_quadratic="quadratic" in mode.value,
                    is_se3="se3" in mode.value)
                self._cam_predictor_mode = mode
            self._cam_predictor.sample_camera(
                self.camera_matrix, max(self.frame_ms.val(), 1.0) / 1000.0)
        cp = self.camera_path
        # wall time since the PREVIOUS frame() tick — frame-internal
        # elapsed time undercounts badly when training is off
        now = time.perf_counter()
        dt = min(now - getattr(self, "_last_frame_t", now), 1.0)
        self._last_frame_t = now
        if self.record_camera_path:
            # record the live camera as keyframes (the reference's
            # "record" GUI toggle, testbed.cu camera-path panel)
            cp.add_camera(self.camera_matrix, fov=self.fov,
                          timestamp=(len(cp.keyframes) + 1) / 30.0)
            cp.duration_seconds = cp.keyframes[-1].timestamp
        elif cp.update_cam_from_path and not cp.empty():
            # playback: advance play_time and drive the view camera
            # (CameraPath.update_cam_from_path + auto_play_speed)
            cp.play_time += cp.auto_play_speed * dt
            cp.play_time = (cp.play_time % 1.0 if cp.loop
                            else min(cp.play_time, 1.0))
            kf = cp.eval_camera_path(cp.play_time)
            self.camera_matrix = np.asarray(kf.to_matrix(), np.float32)
            self.fov = float(kf.fov)
            self._view_index = None
        self.frame_ms.update((time.perf_counter() - t0) * 1000.0)
        return True

    def train(self, batch_size: Optional[int] = None):
        self.frame()

    @property
    def loss(self) -> float:
        return self._loss_scalar.val()

    # ------------------------------------------------------------------
    # rendering (headless render_to_cpu analog, python_api.cu:100-170)
    # ------------------------------------------------------------------
    def _task_render_mode(self) -> str:
        """Map the pyngp ERenderMode enum to the task's render_mode
        string (common.h:68-80 → nerf/task.py render modes)."""
        mode = self.render_mode
        name = mode.value if isinstance(mode, RenderMode) else str(mode)
        return name.replace("_", "")

    def render(
        self,
        width: int,
        height: int,
        spp: int = 1,
        linear: bool = True,
        start_t: float = -1.0,
        end_t: float = -1.0,
        fps: float = 30.0,
        shutter_fraction: float = 0.5,
        camera_matrix: Optional[np.ndarray] = None,
        fov: Optional[float] = None,
    ) -> np.ndarray:
        """pyngp render_to_cpu signature (python_api.cu:100-170):
        start_t/end_t in [0,1] sample the loaded camera path (video
        rendering; shutter_fraction positions the exposure midpoint)."""
        t0 = time.perf_counter()
        if (start_t >= 0.0 and getattr(self, "camera_path", None) is not None
                and not self.camera_path.empty()):
            t_eval = start_t + max(end_t - start_t, 0.0) * shutter_fraction
            kf = self.camera_path.eval(t_eval)
            target = np.asarray(kf.to_matrix(), np.float32)
            if self.camera_smoothing and getattr(self, "_smoothed_cam", None) is not None:
                # EMA toward the path target (reference camera smoothing)
                target = 0.8 * self._smoothed_cam + 0.2 * target
            self._smoothed_cam = target
            self.camera_matrix = target
            if getattr(kf, "fov", None):
                self.fov = float(kf.fov)
            self._view_index = None
        cam = camera_matrix if camera_matrix is not None else self.camera_matrix

        def to_space(frame, produced_linear):
            """Convert the rgb channels to the requested color space
            (pyngp render_to_cpu contract: linear=True → linear HDR
            values, linear=False → sRGB)."""
            from .common import linear_to_srgb, srgb_to_linear

            if produced_linear == linear:
                return frame
            rgb = frame[..., :3]
            if produced_linear and not linear:
                rgb = np.asarray(linear_to_srgb(np.clip(rgb, 0.0, None)))
            else:
                rgb = np.asarray(srgb_to_linear(np.clip(rgb, 0.0, 1.0)))
            out = np.array(frame, copy=True)
            out[..., :3] = rgb
            return out

        if self.mode == TestbedMode.IMAGE:
            rgb = self.task.render(width, height)
            frame = np.concatenate([rgb, np.ones((*rgb.shape[:2], 1), np.float32)], -1)
            frame = to_space(frame, produced_linear=bool(self.task.is_hdr))
        elif self.mode == TestbedMode.NERF:
            if self.render_ground_truth:
                # pyngp flag: render the training image of the current
                # view instead of the model (run.py eval protocol)
                frame = self.render_gt_view(
                    width, height, self._view_index or 0)
                frame = to_space(frame, produced_linear=bool(
                    self.nerf_dataset.is_hdr))
                self.render_ms.update((time.perf_counter() - t0) * 1000.0)
                return frame
            self.task.min_transmittance = self.nerf_min_transmittance
            self.task.visualized_dimension = self.visualized_dimension
            bg = ((0.0, 0.0, 0.0, 0.0)
                  if self.render_transparency_as_checkerboard
                  else tuple(self.background_color))
            kw = {}
            if self._view_index is not None:
                # camera was set from a training view: use that view's
                # intrinsics (scaled by fov_axis resolution) and lens
                ds = self.nerf_dataset
                i = self._view_index
                s = ((width, height)[self.fov_axis]
                     / ds.resolution[self.fov_axis])
                kw["focal_length"] = tuple(ds.focal_lengths[i] * s)
                kw["principal_point"] = tuple(ds.principal_points[i])
            else:
                # free camera: the GUI screen-center offset shifts the
                # principal point (reference m_screen_center)
                kw["principal_point"] = tuple(self.screen_center)
            if self._task_render_mode() == "slice":
                # 2D slice render path (testbed_nerf.cu:2038-2096):
                # model eval on the plane at slice_plane_z + scale
                frame = self.task.render_slice(
                    width, height, cam, fov=fov or self.fov,
                    plane_dist=self.slice_plane_z + self.scale,
                    background=bg, **kw)
                from .common import NerfActivation

                produced_linear = (self.task.rgb_activation
                                   == NerfActivation.EXPONENTIAL)
                frame = to_space(np.asarray(frame), produced_linear)
                self.render_ms.update((time.perf_counter() - t0) * 1000.0)
                return frame
            fov_eff = fov or self.fov
            if self.zoom != 1.0:
                # m_zoom scales the render focal length
                # (testbed.cu calc_focal_length * m_zoom)
                if "focal_length" in kw:
                    kw["focal_length"] = tuple(
                        f * self.zoom for f in kw["focal_length"])
                else:
                    fov_eff = 2.0 * math.degrees(math.atan(
                        math.tan(math.radians(fov_eff) * 0.5) / self.zoom))
            if self.autofocus and hasattr(self.task, "focus_z"):
                # m_autofocus recast: focus at the crop-box center
                # distance (the reference depth-probes its 3D target)
                center = 0.5 * (np.asarray(self.task.render_aabb_min)
                                + np.asarray(self.task.render_aabb_max))
                self.task.focus_z = float(
                    np.linalg.norm(center - np.asarray(cam)[:, 3]))
            frame = self.task.render(
                width,
                height,
                cam,
                fov=fov_eff,
                spp=spp,
                background=bg,
                render_quality=self.render_quality,
                render_mode=self._task_render_mode(),
                **kw,
            )
            # LDR scenes train/render in sRGB space, HDR in linear
            # (reference testbed_nerf.cu:2354 rgb activation choice)
            from .common import NerfActivation

            produced_linear = self.task.rgb_activation == NerfActivation.EXPONENTIAL
            frame = to_space(np.asarray(frame), produced_linear)
            sharpen = getattr(self, "_nerf_sharpen", 0.0)
            if sharpen:
                frame = _unsharp(frame, sharpen)
        elif self.mode in (TestbedMode.SDF, TestbedMode.VOLUME):
            if spp != 1 and not getattr(self, "_spp_warned", False):
                import warnings

                warnings.warn(
                    "spp > 1 has no effect for SDF/volume renders (the "
                    "sphere tracer / volume marcher is deterministic at "
                    "pixel centers)")
                self._spp_warned = True
            if self.mode == TestbedMode.SDF:
                # pyngp m_sun_dir / m_floor_enable feed the SDF tracer
                self.task.floor_enable = bool(self.floor_enable)
                frame = self.task.render(
                    width, height, cam, fov=fov or self.fov,
                    light_dir=tuple(np.asarray(self.sun_dir, np.float32)))
            else:
                frame = self.task.render(width, height, cam,
                                         fov=fov or self.fov)
            if self.tonemap_curve != TonemapCurve.IDENTITY:
                from .render.buffer import tonemap

                frame = np.array(frame, copy=True)
                frame[..., :3] = np.asarray(
                    tonemap(frame[..., :3], self.tonemap_curve))
            frame = to_space(np.asarray(frame), produced_linear=True)
        else:
            raise ValueError(self.mode)
        if self.exposure:
            # reference m_exposure: scale linear radiance by 2^exposure
            # (testbed.cu tonemap stage)
            frame = np.array(frame, copy=True)
            if linear:
                frame[..., :3] *= 2.0 ** self.exposure
            else:
                lin = np.asarray(srgb_to_linear(np.clip(frame[..., :3], 0, 1)))
                frame[..., :3] = np.asarray(
                    linear_to_srgb(np.clip(lin * 2.0 ** self.exposure, 0, 1)))
        if self.visualize_unit_cube or self.visualize_cameras:
            # wireframe debug overlays (reference draw_visualizations,
            # testbed.cu:2126-2254), rasterized over the frame
            from .render.overlays import draw_cameras, draw_wire_box

            frame = np.array(frame, copy=True)
            fl = 0.5 * height / math.tan(0.5 * math.radians(fov or self.fov))
            if self.visualize_unit_cube:
                lo, hi = np.zeros(3), np.ones(3)
                if self.mode == TestbedMode.NERF and self.task is not None:
                    lo = np.asarray(self.task.render_aabb_min)
                    hi = np.asarray(self.task.render_aabb_max)
                draw_wire_box(frame, lo, hi, cam, fl,
                              tuple(self.screen_center))
            if (self.visualize_cameras and self.mode == TestbedMode.NERF
                    and getattr(self, "nerf_dataset", None) is not None):
                draw_cameras(frame, self.nerf_dataset.xforms_start, cam, fl,
                             tuple(self.screen_center))
        if self.render_transparency_as_checkerboard:
            # composite the (premultiplied, transparent-background)
            # color over a gray checkerboard (reference tonemap stage
            # option m_render_transparency_as_checkerboard)
            frame = np.array(frame, copy=True)
            ys, xs = np.mgrid[0:frame.shape[0], 0:frame.shape[1]]
            checker = np.where(((xs // 8) + (ys // 8)) % 2 == 0, 0.55, 0.4)
            a = np.clip(frame[..., 3:4], 0.0, 1.0)
            frame[..., :3] = frame[..., :3] + checker[..., None] * (1 - a)
        self.render_ms.update((time.perf_counter() - t0) * 1000.0)
        self._last_frame = frame
        return frame

    # ------------------------------------------------------------------
    # pyngp binding-surface conveniences (python_api.cu:430-970)
    # ------------------------------------------------------------------
    def view(self, linear: bool = True, view: int = 0) -> np.ndarray:
        """pyngp view (python_api.cu:471-475): the most recent rendered
        frame. The reference returns view `view`'s accumulation buffer;
        headless builds keep a single view."""
        if self._last_frame is None:
            return self.render(64, 64, linear=linear)
        frame = np.asarray(self._last_frame)
        if not linear:
            from .common import linear_to_srgb

            frame = np.array(frame, copy=True)
            frame[..., :3] = np.asarray(
                linear_to_srgb(np.clip(frame[..., :3], 0.0, None)))
        return frame

    @property
    def dof(self) -> float:
        """pyngp dof ≡ aperture size (python_api.cu:631)."""
        return self.aperture_size

    @dof.setter
    def dof(self, v: float):
        self.aperture_size = float(v)

    @property
    def crop_box(self):
        """pyngp crop_box: the render AABB as a BoundingBox
        (python_api.cu render_aabb/crop surface)."""
        from .common import BoundingBox

        if self.task is None or not hasattr(self.task, "render_aabb_min"):
            return BoundingBox(np.zeros(3), np.ones(3))
        return BoundingBox(self.task.render_aabb_min,
                           self.task.render_aabb_max)

    @crop_box.setter
    def crop_box(self, box):
        self.render_aabb = np.stack([np.asarray(box.min), np.asarray(box.max)])

    @property
    def render_lens(self):
        """pyngp render_lens (python_api.cu:676): the lens used for
        free-camera renders (the dataset lens when loaded)."""
        from .common import Lens

        ds = getattr(self, "nerf_dataset", None)
        if ds is None:
            return Lens()
        return Lens(ds.lens_mode, ds.lens_params)

    @render_lens.setter
    def render_lens(self, lens):
        ds = getattr(self, "nerf_dataset", None)
        if ds is None:
            raise RuntimeError("load a NeRF scene first")
        ds.lens_mode = getattr(lens.mode, "value", lens.mode)
        ds.lens_params = np.asarray(lens.params, np.float32)
        if self.task is not None:
            self.task.rebuild_jit_programs()

    def compute_marching_cubes_mesh(self, resolution=(256, 256, 256),
                                    aabb=None, thresh: float = 2.5):
        """pyngp compute_marching_cubes_mesh (python_api.cu:516-518 →
        Testbed::compute_marching_cubes_mesh): returns a dict with
        vertices V, normals N, colors C, faces F."""
        from .geometry.marching_cubes import extract_mesh

        res = int(resolution[0]) if np.ndim(resolution) else int(resolution)
        verts, faces, colors = extract_mesh(self.task, res=res, iso=thresh)
        normals = np.zeros_like(verts)
        if len(verts) and len(faces):
            # area-weighted vertex normals from the 1-ring
            fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                          verts[faces[:, 2]] - verts[faces[:, 0]])
            for k in range(3):
                np.add.at(normals, faces[:, k], fn)
            normals /= np.maximum(
                np.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        return {"V": verts, "N": normals,
                "C": colors if colors is not None else
                np.full_like(verts, 0.7), "F": faces}

    def render_with_depth(self, width: int = 1920, height: int = 1080,
                          spp: int = 1, linear: bool = True,
                          start_t: float = -1.0, end_t: float = -1.0,
                          fps: float = 30.0,
                          shutter_fraction: float = 1.0):
        """pyngp render_with_depth (python_api.cu:521-529 →
        Testbed::render_to_cpu): returns (rgba (H,W,4), depth (H,W)).
        NeRF depth is the expected ray-termination distance; other
        primitives have no depth buffer in this build and return
        zeros."""
        if self.mode == TestbedMode.NERF and self.task is not None:
            # one pass through the task renderer with the depth buffer
            # kept (the plain render() path discards it)
            cam = self.camera_matrix
            bg = tuple(self.background_color)
            kw = {}
            if self._view_index is not None:
                ds = self.nerf_dataset
                i = self._view_index
                s = ((width, height)[self.fov_axis]
                     / ds.resolution[self.fov_axis])
                kw["focal_length"] = tuple(ds.focal_lengths[i] * s)
                kw["principal_point"] = tuple(ds.principal_points[i])
            else:
                kw["principal_point"] = tuple(self.screen_center)
            frame, depth = self.task.render(
                width, height, cam, fov=self.fov, spp=spp, background=bg,
                render_quality=self.render_quality, return_depth=True, **kw)
            from .common import NerfActivation, linear_to_srgb, srgb_to_linear

            produced_linear = (self.task.rgb_activation
                               == NerfActivation.EXPONENTIAL)
            if produced_linear != linear:
                frame = np.array(frame, copy=True)
                if produced_linear:
                    frame[..., :3] = np.asarray(
                        linear_to_srgb(np.clip(frame[..., :3], 0.0, None)))
                else:
                    frame[..., :3] = np.asarray(
                        srgb_to_linear(np.clip(frame[..., :3], 0.0, 1.0)))
            return np.asarray(frame), np.asarray(depth, np.float32)
        frame = self.render(width, height, spp=spp, linear=linear,
                            start_t=start_t, end_t=end_t, fps=fps,
                            shutter_fraction=shutter_fraction)
        return np.asarray(frame), np.zeros((height, width), np.float32)

    def reset_accumulation(self, due_to_camera_movement: bool = False,
                           immediate_redraw: bool = True):
        """pyngp reset_accumulation (python_api.cu:537-543): clear the
        progressive spp accumulation so the next frame starts fresh.
        (With camera smoothing, a camera-movement reset also restarts
        the smoothed-pose EMA, like the reference's accumulation-reset
        on movement.)"""
        buf = getattr(self, "_accum_buffer", None)
        if buf is not None:
            buf.reset()
        if due_to_camera_movement:
            self._smoothed_cam = None

    def create_empty_nerf_dataset(self, n_images: int, aabb_scale: int = 1,
                                  is_hdr: bool = False):
        """pyngp create_empty_nerf_dataset (python_api.cu:445-451 →
        ngp::create_empty_nerf_dataset, nerf_loader.cu:153-173):
        allocate an n_images dataset with identity cameras and black
        frames, ready for set_image / set_camera_* streaming."""
        from .io.nerf_loader import NerfDataset
        from .nerf.task import NerfTask

        n = int(n_images)
        w, h = 64, 64  # placeholder canvas; set_image replaces frames
        xforms = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
        ds = NerfDataset(
            images=np.zeros((n, h, w, 4),
                            np.float16 if is_hdr else np.uint8),
            is_hdr=bool(is_hdr),
            xforms_start=xforms,
            xforms_end=xforms.copy(),
            focal_lengths=np.full((n, 2), 0.5 * w, np.float32),
            principal_points=np.full((n, 2), 0.5, np.float32),
            rolling_shutter=np.zeros((n, 4), np.float32),
            resolution=(w, h),
            aabb_scale=int(aabb_scale),
            scale=0.33,
            offset=np.array([0.5, 0.5, 0.5], np.float32),
        )
        self.mode = TestbedMode.NERF
        self.nerf_dataset = ds
        if not self.network_config:
            self.network_config = default_config("nerf")
        self.task = NerfTask(ds, self.network_config, seed=self.seed)
        return ds

    @property
    def render_aabb_to_local(self) -> np.ndarray:
        """pyngp render_aabb_to_local (python_api.cu:642): rotation
        taking world points into the render crop box's local frame."""
        t = self.task
        if t is not None and hasattr(t, "render_aabb_to_local"):
            return np.asarray(t.render_aabb_to_local, np.float32)
        return np.eye(3, dtype=np.float32)

    @render_aabb_to_local.setter
    def render_aabb_to_local(self, m):
        t = self.task
        m = np.asarray(m, np.float32).reshape(3, 3)
        if t is not None and hasattr(t, "render_aabb_to_local"):
            t.render_aabb_to_local = m
            t.rebuild_jit_programs()  # crop rotation is trace-time state

    def compute_and_save_png_slices(self, filename: str,
                                    resolution: int = 256, aabb=None,
                                    thresh: float = float("inf"),
                                    density_range: float = 4.0,
                                    flip_y_and_z_axes: bool = False):
        """pyngp compute_and_save_png_slices (python_api.cu:582-590 →
        Testbed::compute_and_save_png_slices, testbed.cu:556-585):
        sample the density (NeRF) / distance (SDF) field on a res³
        grid and write the z-slices tiled into one grayscale PNG."""
        from .geometry.marching_cubes import (
            get_density_on_grid,
            get_marching_cubes_res,
            save_density_grid_to_png,
        )

        if aabb is None or (hasattr(aabb, "is_empty") and aabb.is_empty()):
            if self.mode == TestbedMode.NERF and self.task is not None:
                lo = np.asarray(self.task.render_aabb_min)
                hi = np.asarray(self.task.render_aabb_max)
            else:
                lo, hi = np.zeros(3, np.float32), np.ones(3, np.float32)
            to_local = self.render_aabb_to_local
        else:
            lo = np.asarray(aabb.min, np.float32)
            hi = np.asarray(aabb.max, np.float32)
            to_local = np.eye(3, dtype=np.float32)
        if thresh == float("inf"):
            thresh = float(getattr(self, "mesh_thresh", 2.5))
        is_sdf = self.mode == TestbedMode.SDF
        rng = float(density_range)
        res3d = get_marching_cubes_res(int(resolution), lo, hi)
        if is_sdf:
            # inflate by `range` output voxels, then express the range
            # in voxel units, negated: black outside / white inside
            # (testbed.cu:568-577)
            pad = rng * (hi - lo)[0] / res3d[0]
            lo, hi = lo - pad, hi + pad
            res3d = get_marching_cubes_res(int(resolution), lo, hi)
            rng = -rng * (hi - lo)[0] / res3d[0]
            thresh = 0.0
        density = get_density_on_grid(self.task, res3d, lo, hi, to_local)
        save_density_grid_to_png(
            density, f"{filename}.density_slices_"
            f"{res3d[0]}x{res3d[1]}x{res3d[2]}.png",
            thresh=thresh, density_range=rng,
            flip_y_and_z_axes=flip_y_and_z_axes)
        return tuple(int(r) for r in res3d)

    def n_params(self) -> int:
        import jax

        params = (self.task.state.params if hasattr(self.task, "state")
                  else self.task.params)
        return int(sum(np.prod(np.shape(l)) for l in jax.tree.leaves(params)))

    def n_encoding_params(self) -> int:
        import jax

        params = (self.task.state.params if hasattr(self.task, "state")
                  else self.task.params)
        enc = params.get("pos_enc") or params.get("enc")
        if enc is None:
            return 0
        return int(sum(np.prod(np.shape(l)) for l in jax.tree.leaves(enc)))

    def clear_training_data(self):
        self.task = None
        self.scene_path = None

    def reset(self):
        """Re-initialize the network (reference Testbed::reset)."""
        if getattr(self, "scene_path", None):
            self._build_task()
        self.training_step = 0

    def reset_camera(self):
        self.camera_matrix = np.concatenate(
            [np.eye(3, dtype=np.float32),
             np.array([[0.5], [0.5], [-1.5]], np.float32)], axis=1)
        self.fov = 50.625
        self.screen_center = (0.5, 0.5)

    @property
    def default_camera(self) -> np.ndarray:
        """The home view matrix reset_camera restores (pyngp
        m_default_camera, python_api.cu `default_camera`)."""
        return np.concatenate(
            [np.eye(3, dtype=np.float32),
             np.array([[0.5], [0.5], [-1.5]], np.float32)], axis=1)

    @property
    def aabb(self):
        """Scene AABB as a BoundingBox (pyngp testbed.aabb)."""
        from .common import BoundingBox

        if self.mode == TestbedMode.NERF and self.task is not None:
            return BoundingBox(self.task.aabb_min, self.task.aabb_max)
        return BoundingBox(np.zeros(3), np.ones(3))

    @property
    def raw_aabb(self):
        """SDF: the mesh bounds BEFORE unit-cube normalization (pyngp
        testbed.raw_aabb; reference m_raw_aabb, testbed_sdf.cu
        load_mesh). Recovered by inverting world = raw·scale + offset."""
        from .common import BoundingBox

        if self.mode == TestbedMode.SDF and self.task is not None:
            t = self.task
            raw = (t.triangles.reshape(-1, 3) - t.mesh_offset) / t.mesh_scale
            return BoundingBox(raw.min(0), raw.max(0))
        return self.aabb

    def free_temporary_memory(self):
        """pyngp Testbed.free_temporary_memory: drop cached render
        accelerators (baked/slab caches, compiled-program handles) —
        XLA owns device allocation, so this is the meaningful analog
        of the reference's arena release."""
        import jax

        for attr in ("_baked_cache", "_slab_cache", "_slice_eval_fn"):
            if self.task is not None and hasattr(self.task, attr):
                setattr(self.task, attr, None)
        jax.clear_caches()

    def first_training_view(self):
        self.set_camera_to_training_view(0)

    def last_training_view(self):
        self.set_camera_to_training_view(self.nerf_dataset.n_images - 1)

    def previous_training_view(self):
        i = getattr(self, "_view_index", 0)
        self.set_camera_to_training_view(max(i - 1, 0))

    def next_training_view(self):
        i = getattr(self, "_view_index", -1)
        self.set_camera_to_training_view(
            min(i + 1, self.nerf_dataset.n_images - 1))

    def set_nerf_camera_matrix(self, m: np.ndarray):
        """Set the view camera from a NeRF-convention matrix
        (python_api.cu set_nerf_camera_matrix)."""
        self.camera_matrix = self.nerf_dataset.nerf_matrix_to_ngp(np.asarray(m))
        self._view_index = None  # free camera: back to fov-derived intrinsics

    def look_at(self, target):
        t = np.asarray(target, np.float32)
        eye = self.camera_matrix[:, 3]
        fwd = t - eye
        n = np.linalg.norm(fwd)
        if n < 1e-9:
            return
        fwd = fwd / n
        up = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(fwd, up)
        right /= max(np.linalg.norm(right), 1e-9)
        up = np.cross(right, fwd)
        self.camera_matrix = np.stack([right, -up, fwd, eye], axis=1)

    def view_dir(self) -> np.ndarray:
        return self.camera_matrix[:, 2].copy()

    @property
    def max_level_rand_training(self) -> bool:
        return bool(getattr(self.task, "max_level_rand_training", False))

    @max_level_rand_training.setter
    def max_level_rand_training(self, v: bool):
        self.task.max_level_rand_training = bool(v)

    @property
    def aperture_size(self) -> float:
        return float(getattr(self.task, "aperture_size", 0.0))

    @aperture_size.setter
    def aperture_size(self, v: float):
        self.task.aperture_size = float(v)

    @property
    def autofocus_target(self):
        return getattr(self.task, "focus_z", 1.0)

    @autofocus_target.setter
    def autofocus_target(self, v):
        self.task.focus_z = float(v)

    @property
    def render_aabb(self):
        return np.stack([self.task.render_aabb_min, self.task.render_aabb_max])

    @render_aabb.setter
    def render_aabb(self, v):
        v = np.asarray(v, np.float32)
        self.task.render_aabb_min = v[0]
        self.task.render_aabb_max = v[1]

    def set_crop_box(self, corners):
        self.render_aabb = np.asarray(corners, np.float32)

    def crop_box_corners(self):
        return self.render_aabb

    @property
    def render_near_distance(self) -> float:
        return float(getattr(self.task, "render_near_distance", 0.0))

    @render_near_distance.setter
    def render_near_distance(self, v: float):
        self.task.render_near_distance = float(v)

    @property
    def rendering_min_transmittance(self) -> float:
        return self.nerf_min_transmittance

    @rendering_min_transmittance.setter
    def rendering_min_transmittance(self, v: float):
        self.nerf_min_transmittance = float(v)

    def render_gt_view(self, width: int, height: int, view_idx: int) -> np.ndarray:
        """The training image of a view, resampled to (H, W, 4) in the
        model's color space (reference GT render mode,
        testbed.cu:5074-5143). pyngp's assignable `render_ground_truth`
        FLAG routes Testbed.render() through this."""
        from .common import GroundTruthRenderMode, linear_to_srgb, srgb_to_linear

        ds = self.nerf_dataset
        if (self.groundtruth_render_mode == GroundTruthRenderMode.DEPTH
                and ds.depths is not None):
            # reference m_ground_truth_render_mode == Depth: show the
            # dataset depth channel (testbed.cu GT overlay modes)
            dmax = max(float(ds.depths.max()), 1e-6)
            dep = (ds.depths[view_idx] / dmax).astype(np.float32)
            frame = np.stack([dep, dep, dep, np.ones_like(dep)], -1)
            h, w = dep.shape
            ys = np.clip((np.arange(height) + 0.5) * h / height,
                         0, h - 1).astype(int)
            xs = np.clip((np.arange(width) + 0.5) * w / width,
                         0, w - 1).astype(int)
            return frame[ys][:, xs]
        img = ds.images[view_idx].astype(np.float32)
        if not ds.is_hdr:
            img = img / 255.0
            lin = np.asarray(srgb_to_linear(img[..., :3])) * img[..., 3:4]
            rgb = np.asarray(linear_to_srgb(lin))
        else:
            rgb = img[..., :3]
        frame = np.concatenate([rgb, img[..., 3:4]], -1)
        h, w = frame.shape[:2]
        ys = np.clip((np.arange(height) + 0.5) * h / height, 0, h - 1).astype(int)
        xs = np.clip((np.arange(width) + 0.5) * w / width, 0, w - 1).astype(int)
        return frame[ys][:, xs]

    def render_error_overlay(self, width: int, height: int, view_idx: int,
                             scale: float = 4.0) -> np.ndarray:
        """|render − ground truth| heat overlay for a training view
        (the reference's error overlay debugging mode)."""
        ds = self.nerf_dataset
        gt = self.render_gt_view(width, height, view_idx)
        frame = self.task.render(
            width, height, ds.xforms_start[view_idx],
            focal_length=tuple(ds.focal_lengths[view_idx]
                               * np.array([width, height]) / ds.resolution),
            principal_point=tuple(ds.principal_points[view_idx]),
            background=(0, 0, 0, 0),
        )
        err = np.abs(frame[..., :3] - gt[..., :3]).mean(-1, keepdims=True)
        heat = np.clip(err * scale, 0.0, 1.0)
        out = np.concatenate(
            [heat, np.zeros_like(heat), 1.0 - heat, np.ones_like(heat)], -1
        )
        return out.astype(np.float32)

    def set_camera_to_training_view(self, i: int):
        ds = self.nerf_dataset
        self.camera_matrix = ds.xforms_start[i].copy()
        self._view_index = i  # render() uses this view's intrinsics

    def render_progressive(self, width: int, height: int, spp: int = 8, **kw) -> np.ndarray:
        """spp-accumulated render through a RenderBuffer (the reference's
        progressive accumulation, render_buffer.h:173-317). Each sample
        jitters the sub-pixel offset implicitly via separate renders."""
        from .render.buffer import RenderBuffer

        buf = RenderBuffer(width, height)
        self._accum_buffer = buf  # reset_accumulation() clears it
        for _ in range(spp):
            frame = self.render(width, height, **kw)
            buf.accumulate(frame)
        from .common import ColorSpace, TonemapCurve

        return buf.tonemapped(color_space=ColorSpace.LINEAR)

    def render_with_dynamic_res(self, width: int, height: int, **kw) -> np.ndarray:
        """Render at the dynamic-resolution controller's current factor
        and upsample — the headless analog of the reference's adaptive
        render resolution (testbed.cu:3299-3395)."""
        if not hasattr(self, "_dyn_res"):
            from .render.buffer import DynamicResolution

            self._dyn_res = DynamicResolution(self.dynamic_res_target_fps)
        if self.dynamic_res:
            factor = self._dyn_res.factor
        else:
            # reference: factor = 8 / m_fixed_res_factor
            # (testbed.cu:3318; slider default 8 → full resolution)
            factor = min(1.0, 8.0 / max(float(self.fixed_res_factor), 1.0))
        rw = max(16, int(width * factor))
        rh = max(16, int(height * factor))
        t0 = time.perf_counter()
        frame = self.render(rw, rh, **kw)
        self._dyn_res.update((time.perf_counter() - t0) * 1000.0)
        if (rw, rh) != (width, height):
            reps_y = int(np.ceil(height / rh))
            reps_x = int(np.ceil(width / rw))
            frame = np.repeat(np.repeat(frame, reps_y, 0), reps_x, 1)[:height, :width]
        return frame

    # pyngp camera/GT accessor aliases (python_api.cu:477-684) --------
    @property
    def render_groundtruth(self) -> bool:
        """Reference binding name for m_render_ground_truth."""
        return self.render_ground_truth

    @render_groundtruth.setter
    def render_groundtruth(self, v):
        self.render_ground_truth = bool(v)

    @property
    def loop_animation(self) -> bool:
        return self.camera_path.loop

    @loop_animation.setter
    def loop_animation(self, v):
        self.camera_path.loop = bool(v)

    def view_camera(self, view: int = 0) -> np.ndarray:
        """Current camera matrix of a view (single-view headless)."""
        return np.array(self.camera_matrix, copy=True)

    def predict_view_camera(self, delta_t: float, view: int = 0) -> np.ndarray:
        """Extrapolated camera pose delta_t seconds ahead (pyngp
        predict_view_camera; needs camera_prediction_mode != NONE and
        a few frame() ticks of pose history)."""
        if self._cam_predictor is None:
            return self.view_camera(view)
        return np.asarray(self._cam_predictor.predict_camera(delta_t),
                          np.float32)

    @property
    def fov_xy(self) -> np.ndarray:
        """Per-axis field of view in degrees (pyngp fov_xy). The
        headless renderer derives focal length from the fov_axis
        component; both axes track the scalar fov unless set."""
        fx = getattr(self, "_fov_x", None)
        return np.asarray([fx if fx is not None else self.fov, self.fov],
                          np.float32)

    @fov_xy.setter
    def fov_xy(self, v):
        v = np.asarray(v, np.float32).reshape(2)
        self._fov_x = float(v[0])
        self.fov = float(v[self.fov_axis])

    @property
    def relative_focal_length(self) -> np.ndarray:
        """focal length / resolution[fov_axis] (reference
        m_relative_focal_length, testbed.cu:491-492)."""
        rel = 0.5 / math.tan(0.5 * math.radians(self.fov))
        fx = getattr(self, "_fov_x", None)
        rel_x = (0.5 / math.tan(0.5 * math.radians(fx))
                 if fx is not None else rel)
        return np.asarray([rel_x, rel], np.float32)

    @relative_focal_length.setter
    def relative_focal_length(self, v):
        v = np.asarray(v, np.float32).reshape(2)
        self._fov_x = math.degrees(2 * math.atan(0.5 / max(v[0], 1e-9)))
        self.fov = math.degrees(
            2 * math.atan(0.5 / max(v[self.fov_axis], 1e-9)))

    @property
    def shall_train_encoding(self) -> bool:
        """pyngp GUI toggle: freeze the input encoding's table params
        while the MLPs keep training (python_api.cu shall_train_encoding)."""
        return (getattr(self.task, "shall_train_encoding", True)
                if self.task is not None
                else getattr(self, "_pend_train_enc", True))

    @shall_train_encoding.setter
    def shall_train_encoding(self, v):
        if self.task is None:
            self._pend_train_enc = bool(v)
            return
        self.task.shall_train_encoding = bool(v)
        self.task.rebuild_jit_programs()

    @property
    def shall_train_network(self) -> bool:
        return (getattr(self.task, "shall_train_network", True)
                if self.task is not None
                else getattr(self, "_pend_train_net", True))

    @shall_train_network.setter
    def shall_train_network(self, v):
        if self.task is None:
            self._pend_train_net = bool(v)
            return
        self.task.shall_train_network = bool(v)
        self.task.rebuild_jit_programs()

    def override_sdf_training_data(self, points, distances):
        """pyngp Testbed.override_sdf_training_data (python_api.cu:
        74-112, :551): train the SDF on a fixed external (points,
        distances) set instead of online BVH GT generation."""
        if self.mode != TestbedMode.SDF or self.task is None:
            raise RuntimeError(
                "override_sdf_training_data requires a loaded SDF scene")
        self.task.override_training_data(points, distances)

    def screenshot(self, path: str, width: int = 1920, height: int = 1080, spp: int = 1):
        from .io.image import save_image

        frame = self.render(width, height, spp=spp)
        save_image(path, frame[..., :3])
        return frame

    # ------------------------------------------------------------------
    # pyngp surface: GUI/VR stubs + tooling entry points
    # ------------------------------------------------------------------
    def want_repl(self) -> bool:
        """pyngp's `want_repl` (GUI hotkey `; `); always False headless."""
        return False

    def init_window(self, width: int, height: int, second_window: bool = False,
                    hidden: bool = False):
        """GUI stub: the TPU build's interactive surface is the web
        viewer (instant_ngp_tpu.viewer) — no GLFW window exists. Kept
        as a no-op so reference drivers with --gui don't crash."""
        import warnings

        warnings.warn(
            "init_window is a no-op on the TPU build; use "
            "`python -m instant_ngp_tpu.viewer` for interactive viewing")
        self._window_res = (int(width), int(height))

    def init_vr(self):
        """VR stub (OpenXR is vendor hardware; N/A on TPU)."""
        import warnings

        warnings.warn("init_vr is a no-op on the TPU build (no OpenXR)")

    def destroy_window(self):
        self._window_res = None

    def load_camera_path(self, path: str):
        """Load a camera path json (reference CameraPath::load,
        camera_path.cu; python_api.cu load_camera_path)."""
        from .render.camera_path import CameraPath

        self.camera_path = CameraPath.load(path)
        return self.camera_path

    def compute_and_save_marching_cubes_mesh(
        self, filename: str, resolution=(256, 256, 256), aabb=None,
        thresh: float = 2.5, generate_uvs_for_exporting_texture: bool = False,
        generate_uvs_for_obj_file: bool = False,
    ):
        """pyngp compute_and_save_marching_cubes_mesh
        (python_api.cu:652-658 → Testbed::compute_and_save_mesh;
        `generate_uvs_for_obj_file` is the reference's pybind arg name
        for the unwrap path)."""
        from .geometry.marching_cubes import extract_mesh
        from .geometry.mesh_io import save_obj, save_obj_unwrapped, save_ply

        res = int(resolution[0]) if np.ndim(resolution) else int(resolution)
        verts, faces, colors = extract_mesh(self.task, res=res, iso=thresh)
        unwrap = generate_uvs_for_exporting_texture or generate_uvs_for_obj_file
        if str(filename).lower().endswith(".ply"):
            save_ply(filename, verts, faces, colors)
        elif unwrap:
            save_obj_unwrapped(filename, verts, faces, colors)
        else:
            save_obj(filename, verts, faces, colors)
        return len(verts)

    # ------------------------------------------------------------------
    # snapshots
    # ------------------------------------------------------------------
    def save_snapshot(self, path: str, include_optimizer_state: bool = False):
        task = self.task
        density_grid = None
        nerf_extra = None
        opt_state = None
        cam_offsets = None
        render_aabb = None
        if self.mode == TestbedMode.NERF:
            ds = task.dataset
            density_grid = np.asarray(task.state.grid.density)
            # dataset block: enough to reconstruct a render-ready task
            # without the original training data (reference stores the
            # dataset in its snapshots, testbed.cu:5288-5491 /
            # create_empty_nerf_dataset)
            nerf_extra = {
                "aabb_scale": ds.aabb_scale,
                "rgb": {"rays_per_batch": task.n_rays_per_batch},
                # full reference schema (json_binding.h:112-137) so a
                # reference build can read our snapshots' dataset block
                "dataset": snapshot_io.dataset_to_json(ds),
            }
            # the live render crop travels at the snapshot top level
            # (reference m_render_aabb save/restore, testbed.cu:5455)
            render_aabb = {
                "min": np.asarray(task.render_aabb_min, np.float32).tolist(),
                "max": np.asarray(task.render_aabb_max, np.float32).tolist(),
            }
            params = task.state.params
            step = task.training_step
            cam_offsets = jax_to_np_tree(task.state.cam)
            if include_optimizer_state:
                opt_state = task.state.opt_state
        else:
            params = task.params
            step = task.training_step
            if include_optimizer_state:
                opt_state = task.opt_state
        snapshot_io.save_snapshot(
            path,
            self.network_config,
            jax_to_np_tree(params),
            self.mode.value,
            training_step=step,
            loss=self.loss,
            density_grid=density_grid,
            nerf_extra=nerf_extra,
            camera={"matrix": np.asarray(self.camera_matrix).tolist(), "fov_axis": 1},
            optimizer_state=opt_state,
            cam_offsets=cam_offsets,
        )

    def _empty_nerf_dataset_from_snapshot(self, snap: dict):
        """Reconstruct a render-ready dataset from the snapshot's
        dataset block (the reference's create_empty_nerf_dataset,
        nerf_loader.cu:154-170): zero images, real cameras. Reads the
        reference json_binding schema (json_binding.h:139-188); falls
        back to the round-2 private block for old files."""
        from .io.nerf_loader import NerfDataset

        block = snap["nerf"]["dataset"]
        if "xforms" in block and not isinstance(block["xforms"], (bytes, bytearray)):
            ds = snapshot_io.dataset_from_json(block)
            if "aabb_scale" not in block and "aabb_scale" in snap["nerf"]:
                ds.aabb_scale = int(snap["nerf"]["aabb_scale"])
            return ds
        # legacy (round-2) private block
        n = int(block["n_images"])
        w, h = block["resolution"]
        xforms = np.frombuffer(block["xforms"], np.float32).reshape(n, 3, 4).copy()
        focals = np.frombuffer(block["focals"], np.float32).reshape(n, 2).copy()
        pps = np.frombuffer(block["principals"], np.float32).reshape(n, 2).copy()
        images = np.zeros((n, h, w, 4), np.uint8)
        return NerfDataset(
            images=images,
            is_hdr=bool(block.get("is_hdr", False)),
            xforms_start=xforms,
            xforms_end=xforms.copy(),
            focal_lengths=focals,
            principal_points=pps,
            rolling_shutter=np.zeros((n, 4), np.float32),
            resolution=(int(w), int(h)),
            aabb_scale=int(snap["nerf"].get("aabb_scale", 1)),
            scale=float(block.get("scale", 0.33)),
            offset=np.asarray(block.get("offset", [0.5, 0.5, 0.5]), np.float32),
        )

    def load_snapshot(self, path: str):
        doc = snapshot_io.load_snapshot_file(path)
        snap = doc["snapshot"]
        self.network_config = {k: v for k, v in doc.items() if k != "snapshot"}
        mode = TestbedMode(snap["mode"])
        self.mode = mode
        import jax.numpy as jnp

        if mode == TestbedMode.NERF and self.task is None:
            # scene-free load: rebuild the task from the snapshot's
            # dataset block (renders work; training needs real data)
            if "nerf" not in snap or "dataset" not in snap.get("nerf", {}):
                raise RuntimeError(
                    "snapshot lacks a dataset block and no scene is loaded"
                )
            from .nerf.task import NerfTask

            ds = self._empty_nerf_dataset_from_snapshot(snap)
            self.nerf_dataset = ds
            self.task = NerfTask(ds, self.network_config)

        if mode == TestbedMode.NERF:
            task = self.task
            params = snapshot_io.restore_params(snap, jax_to_np_tree(task.state.params))
            params = np_to_jax_tree(params)
            grid = snapshot_io.restore_density_grid(snap, task.max_cascade + 1)
            import dataclasses as dc

            from .nerf.occupancy import _bitfield_from_density, _skip_chain

            gstate = task.state.grid
            if grid is not None:
                density = jnp.asarray(grid)
                mean = jnp.mean(jnp.maximum(density[0], 0.0))
                bitfield = _bitfield_from_density(density, mean)
                gstate = dc.replace(
                    gstate,
                    density=density,
                    mean_density=mean,
                    bitfield=bitfield,
                    skipmip=_skip_chain(bitfield),
                )
            opt_state = task.opt.init(params)
            if "optimizer_state" in snap:
                opt_state = np_to_jax_tree(
                    snapshot_io.unpack_tree(snap["optimizer_state"], opt_state)
                )
            cam = task.state.cam
            if "cam_offsets" in snap:
                cam = np_to_jax_tree(
                    snapshot_io.unpack_tree(snap["cam_offsets"], cam)
                )
            task.state = dc.replace(
                task.state, params=params, opt_state=opt_state, grid=gstate,
                cam=cam,
            )
            task.training_step = int(snap.get("training_step", 0))
            self.training_step = task.training_step
        else:
            task = self.task
            params = snapshot_io.restore_params(snap, jax_to_np_tree(task.params))
            task.params = np_to_jax_tree(params)
            task.opt_state = task.opt.init(task.params)
            if "optimizer_state" in snap:
                task.opt_state = np_to_jax_tree(
                    snapshot_io.unpack_tree(snap["optimizer_state"], task.opt_state)
                )
            task.training_step = int(snap.get("training_step", 0))
            self.training_step = task.training_step

    # convenience metrics endpoints (parity with python_api.cu bindings)
    def compute_image_mse(self, quantize_to_byte: bool = False) -> float:
        return self.task.compute_mse(quantize_to_byte)

    def calculate_iou(self, n_samples: int = 128**3) -> float:
        return self.task.calculate_iou(n_samples)


def jax_to_np_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def np_to_jax_tree(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(x), tree)
