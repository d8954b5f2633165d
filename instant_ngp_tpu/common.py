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
    # pybind11 member casing of the reference (python_api.cu) — alias
    Linear = "linear"


class NerfActivation(enum.Enum):
    NONE = "none"
    RELU = "relu"
    LOGISTIC = "logistic"
    EXPONENTIAL = "exponential"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    ReLU = "relu"
    Logistic = "logistic"
    Exponential = "exponential"


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
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Shade = "shade"
    Normals = "normals"
    Positions = "positions"
    Depth = "depth"
    Distortion = "distortion"
    Cost = "cost"
    Slice = "slice"
    EncodingVis = "encoding_vis"


class GroundTruthRenderMode(enum.Enum):
    SHADE = "shade"
    DEPTH = "depth"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Shade = "shade"
    Depth = "depth"


class MeshSdfMode(enum.Enum):
    WATERTIGHT = "watertight"
    RAYSTAB = "raystab"
    PATH_ESCAPE = "path_escape"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Watertight = "watertight"
    Raystab = "raystab"
    PathEscape = "path_escape"
    # extension: exact sign from angle-weighted pseudonormals (the
    # default here; the reference's PathEscape needs OptiX)
    PSEUDONORMAL = "pseudonormal"


class RandomMode(enum.Enum):
    RANDOM = "random"
    HALTON = "halton"
    SOBOL = "sobol"
    STRATIFIED = "stratified"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Random = "random"
    Halton = "halton"
    Sobol = "sobol"
    Stratified = "stratified"


class TonemapCurve(enum.Enum):
    IDENTITY = "identity"
    ACES = "aces"
    HABLE = "hable"
    REINHARD = "reinhard"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Identity = "identity"
    Hable = "hable"
    Reinhard = "reinhard"


class LensMode(enum.Enum):
    PERSPECTIVE = "perspective"
    OPENCV = "opencv"
    OPENCV_FISHEYE = "opencv_fisheye"
    FTHETA = "ftheta"
    LATLONG = "latlong"
    EQUIRECTANGULAR = "equirectangular"
    ORTHOGRAPHIC = "orthographic"
    # pybind11 member casing of the reference (python_api.cu) — aliases
    Perspective = "perspective"
    OpenCV = "opencv"
    OpenCVFisheye = "opencv_fisheye"
    FTheta = "ftheta"
    LatLong = "latlong"
    Equirectangular = "equirectangular"
    Orthographic = "orthographic"


class Lens:
    """pyngp ngp.Lens (python_api.cu:428-433): a lens mode + parameter
    vector pair. Mode accepts LensMode enums or their string values."""

    def __init__(self, mode="perspective", params=None):
        import numpy as _np

        self.mode = LensMode(getattr(mode, "value", mode))
        self.params = _np.zeros(7, _np.float32)
        if params is not None:
            p = _np.asarray(params, _np.float32).reshape(-1)
            self.params[: len(p)] = p

    def __repr__(self):
        return f"Lens(mode={self.mode.value}, params={self.params.tolist()})"


class SDFGroundTruthMode(enum.Enum):
    """Reference ESDFGroundTruthMode (python_api.cu:364-366)."""

    RAYTRACED_MESH = "raytracedmesh"
    SPHERETRACED_MESH = "spheretracedmesh"


class EditingKernel(enum.Enum):
    """Reference EEditingKernel (camera-path keyframe brush,
    python_api.cu enum; kernels in camera_path.cu:80-115)."""

    NONE = "none"
    GAUSSIAN = "gaussian"
    QUARTIC = "quartic"
    HAT = "hat"
    BOX = "box"


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


class BoundingBox:
    """Axis-aligned box with the pyngp ngp.BoundingBox surface
    (python_api.cu BoundingBox binding; semantics from
    bounding_box.cuh:40-140). Host-side helper — device-side AABB math
    stays in plain jnp min/max arrays."""

    def __init__(self, min=None, max=None):  # noqa: A002
        import numpy as _np

        if min is None:  # empty box, ready for enlarge()
            self.min = _np.full(3, _np.inf, _np.float32)
            self.max = _np.full(3, -_np.inf, _np.float32)
        else:
            self.min = _np.asarray(min, _np.float32).reshape(3).copy()
            self.max = _np.asarray(max, _np.float32).reshape(3).copy()

    def __repr__(self):
        return f"BoundingBox(min={self.min.tolist()}, max={self.max.tolist()})"

    def is_empty(self) -> bool:
        return bool((self.max < self.min).any())

    @property
    def center(self):
        return 0.5 * (self.min + self.max)

    def diag(self):
        return self.max - self.min

    def enlarge(self, other):
        """Grow to cover a point (3,) or another BoundingBox."""
        import numpy as _np

        if isinstance(other, BoundingBox):
            self.min = _np.minimum(self.min, other.min)
            self.max = _np.maximum(self.max, other.max)
        else:
            p = _np.asarray(other, _np.float32).reshape(3)
            self.min = _np.minimum(self.min, p)
            self.max = _np.maximum(self.max, p)

    def inflate(self, amount: float):
        self.min = self.min - amount
        self.max = self.max + amount

    def contains(self, p) -> bool:
        import numpy as _np

        p = _np.asarray(p, _np.float32).reshape(3)
        return bool(((p >= self.min) & (p <= self.max)).all())

    def intersection(self, other: "BoundingBox") -> "BoundingBox":
        import numpy as _np

        return BoundingBox(_np.maximum(self.min, other.min),
                           _np.minimum(self.max, other.max))

    def intersects(self, other: "BoundingBox") -> bool:
        return not self.intersection(other).is_empty()

    def relative_pos(self, p):
        import numpy as _np

        p = _np.asarray(p, _np.float32).reshape(3)
        return (p - self.min) / _np.maximum(self.diag(), 1e-12)

    def ray_intersect(self, pos, dir):  # noqa: A002
        """Slab-method ray/box interval (reference
        BoundingBox::ray_intersect, bounding_box.cuh:105-125; pyngp
        python_api.cu:423). Returns (tmin, tmax); no hit ⇔ tmin > tmax.
        Zero direction components follow IEEE inf semantics like the
        CUDA original."""
        import numpy as _np

        pos = _np.asarray(pos, _np.float32).reshape(3)
        dir = _np.asarray(dir, _np.float32).reshape(3)  # noqa: A001
        zero = dir == 0.0
        with _np.errstate(divide="ignore", invalid="ignore"):
            t1 = (self.min - pos) / dir
            t2 = (self.max - pos) / dir
        lo = _np.minimum(t1, t2)
        hi = _np.maximum(t1, t2)
        # axis-parallel rays: inside the slab → unbounded, else no hit
        inside = (pos >= self.min) & (pos <= self.max)
        lo = _np.where(zero, _np.where(inside, -_np.inf, _np.inf), lo)
        hi = _np.where(zero, _np.where(inside, _np.inf, -_np.inf), hi)
        return float(lo.max()), float(hi.min())

    def signed_distance(self, p) -> float:
        """Negative inside, positive outside (reference
        BoundingBox::signed_distance, bounding_box.cuh:127-131)."""
        import numpy as _np

        p = _np.asarray(p, _np.float32).reshape(3)
        q = _np.abs(p - self.center) - 0.5 * self.diag()
        return float(_np.linalg.norm(_np.maximum(q, 0.0))
                     + min(float(q.max()), 0.0))

    def distance(self, p) -> float:
        return float(self.distance_sq(p) ** 0.5)

    def distance_sq(self, p) -> float:
        import numpy as _np

        p = _np.asarray(p, _np.float32).reshape(3)
        d = _np.maximum(_np.maximum(self.min - p, p - self.max), 0.0)
        return float((d * d).sum())

    def get_vertices(self):
        """The 8 corner points (bounding_box.cuh get_vertices order)."""
        import numpy as _np

        lo, hi = self.min, self.max
        return _np.asarray([
            [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
            [lo[0], hi[1], lo[2]], [hi[0], hi[1], lo[2]],
            [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
            [lo[0], hi[1], hi[2]], [hi[0], hi[1], hi[2]],
        ], _np.float32)
