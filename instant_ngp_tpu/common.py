"""Common constants, enums and small math helpers.

TPU-native re-implementation of the conventions of instant-ngp
(reference: include/neural-graphics-primitives/common.h and
nerf_device.cuh — constants at nerf_device.cuh:25-44). All math here is
pure jax.numpy so it can be traced inside jit.
"""

from __future__ import annotations

import enum
import math

import jax.numpy as jnp

# --- NeRF marching constants (reference nerf_device.cuh:25-44) ---
NERF_GRIDSIZE = 128
NERF_GRID_N_CELLS = NERF_GRIDSIZE**3
NERF_RENDERING_NEAR_DISTANCE = 0.05
NERF_STEPS = 1024  # finest number of steps per unit length
NERF_CASCADES = 8
SQRT3 = math.sqrt(3.0)
STEPSIZE = SQRT3 / NERF_STEPS
MIN_CONE_STEPSIZE = STEPSIZE
# Maximum step size is the width of the coarsest gridsize cell.
MAX_CONE_STEPSIZE = STEPSIZE * (1 << (NERF_CASCADES - 1)) * NERF_STEPS / NERF_GRIDSIZE
NERF_MIN_OPTICAL_THICKNESS = 0.01
MAX_DEPTH = 16384.0

# Scene scale applied when importing standard nerf-convention datasets
# (reference nerf_loader.cu:163 `result.scale = NERF_SCALE`).
NERF_SCALE = 0.33


class TestbedMode(enum.Enum):
    NONE = "none"
    NERF = "nerf"
    SDF = "sdf"
    IMAGE = "image"
    VOLUME = "volume"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Nerf = "nerf"
    Sdf = "sdf"
    Image = "image"
    Volume = "volume"


class ColorSpace(enum.Enum):
    LINEAR = "linear"
    SRGB = "srgb"


class NerfActivation(enum.Enum):
    NONE = "none"
    RELU = "relu"
    LOGISTIC = "logistic"
    EXPONENTIAL = "exponential"


class LossType(enum.Enum):
    L2 = "l2"
    L1 = "l1"
    MAPE = "mape"
    SMAPE = "smape"
    HUBER = "huber"
    LOGL1 = "logl1"
    RELATIVE_L2 = "relativel2"


class RenderMode(enum.Enum):
    AO = "ao"
    SHADE = "shade"
    NORMALS = "normals"
    POSITIONS = "positions"
    DEPTH = "depth"
    DISTORTION = "distortion"
    COST = "cost"
    SLICE = "slice"
    ENCODING_VIS = "encoding_vis"


class GroundTruthRenderMode(enum.Enum):
    SHADE = "shade"
    DEPTH = "depth"


class MeshSdfMode(enum.Enum):
    WATERTIGHT = "watertight"
    RAYSTAB = "raystab"
    PATH_ESCAPE = "path_escape"


class RandomMode(enum.Enum):
    RANDOM = "random"
    HALTON = "halton"
    SOBOL = "sobol"
    STRATIFIED = "stratified"


class TonemapCurve(enum.Enum):
    IDENTITY = "identity"
    ACES = "aces"
    HABLE = "hable"
    REINHARD = "reinhard"


class LensMode(enum.Enum):
    PERSPECTIVE = "perspective"
    OPENCV = "opencv"
    OPENCV_FISHEYE = "opencv_fisheye"
    FTHETA = "ftheta"
    LATLONG = "latlong"
    EQUIRECTANGULAR = "equirectangular"
    ORTHOGRAPHIC = "orthographic"


class TrainMode(enum.Enum):
    NERF = "nerf"
    RFL = "rfl"
    RFL_RELAX = "rflrelax"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Nerf = "nerf"
    Rfl = "rfl"
    RflRelax = "rflrelax"


# --- color conversions (reference common_device.cuh:61-103) ---

def srgb_to_linear(c):
    c = jnp.asarray(c)
    return jnp.where(c < 0.04045, c / 12.92, jnp.power((jnp.maximum(c, 0.04045) + 0.055) / 1.055, 2.4))


def linear_to_srgb(c):
    c = jnp.asarray(c)
    return jnp.where(
        c < 0.0031308, 12.92 * c, 1.055 * jnp.power(jnp.maximum(c, 0.0031308), 1.0 / 2.4) - 0.055
    )


def logistic(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def network_to_rgb(val, activation: NerfActivation):
    """reference nerf_device.cuh:204-213."""
    if activation == NerfActivation.NONE:
        return val
    if activation == NerfActivation.RELU:
        return jnp.maximum(val, 0.0)
    if activation == NerfActivation.LOGISTIC:
        return logistic(val)
    if activation == NerfActivation.EXPONENTIAL:
        return jnp.exp(jnp.clip(val, -10.0, 10.0))
    raise ValueError(activation)


def network_to_density(val, activation: NerfActivation):
    """reference nerf_device.cuh:235-243."""
    if activation == NerfActivation.NONE:
        return val
    if activation == NerfActivation.RELU:
        return jnp.maximum(val, 0.0)
    if activation == NerfActivation.LOGISTIC:
        return logistic(val)
    if activation == NerfActivation.EXPONENTIAL:
        # NB: densities are clamped for numerical stability of exp; the
        # reference leaves density unclamped but fp16 saturates — we clamp
        # at 15 (e^15 ≈ 3.3e6, far beyond opacity saturation).
        return jnp.exp(jnp.clip(val, -15.0, 15.0))
    raise ValueError(activation)


# --- position / direction / dt warps (reference nerf_device.cuh:266-330) ---

def warp_direction(d):
    return (d + 1.0) * 0.5


def unwarp_direction(d):
    return d * 2.0 - 1.0


def warp_dt(dt):
    max_stepsize = MIN_CONE_STEPSIZE * (1 << (NERF_CASCADES - 1))
    return (dt - MIN_CONE_STEPSIZE) / (max_stepsize - MIN_CONE_STEPSIZE)


def unwarp_dt(dt):
    max_stepsize = MIN_CONE_STEPSIZE * (1 << (NERF_CASCADES - 1))
    return dt * (max_stepsize - MIN_CONE_STEPSIZE) + MIN_CONE_STEPSIZE


def next_multiple(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def powi(base: int, exp: int) -> int:
    return base**exp
