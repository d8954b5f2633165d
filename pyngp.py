"""pyngp compatibility shim.

The reference exposes a pybind11 module `pyngp` (python_api.cu) that
scripts/run.py drives. This module re-exports our Testbed with the same
surface so those drivers work against the TPU framework unchanged:

    import pyngp as ngp
    testbed = ngp.Testbed()
    testbed.load_training_data(scene)
    while testbed.frame(): ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from instant_ngp_tpu.common import (  # noqa: F401
    BoundingBox,
    ColorSpace,
    EditingKernel,
    GroundTruthRenderMode,
    Lens,
    LensMode,
    LossType,
    MeshSdfMode,
    NerfActivation,
    RandomMode,
    RenderMode,
    SDFGroundTruthMode,
    TestbedMode,
    TonemapCurve,
    TrainMode,
)
from instant_ngp_tpu.render.brdf import BRDFParams  # noqa: F401
from instant_ngp_tpu.render.camera_path import (  # noqa: F401
    CameraPath,
    CameraPathPos,
    Keyframe,
)
from instant_ngp_tpu.render.camera_path import (  # noqa: F401
    Keyframe as CameraKeyframe,
)
from instant_ngp_tpu.render.camera_path import (  # noqa: F401
    RenderSettings as CameraPathRenderSettings,
)
from instant_ngp_tpu.render.camera_predictor import (  # noqa: F401
    CameraPredictionMode,
)
from instant_ngp_tpu.testbed import Testbed, mode_from_scene  # noqa: F401


def mode_from_string(s: str) -> TestbedMode:
    """pyngp.mode_from_string (python_api.cu mode_from_string binding)."""
    return TestbedMode(str(s).lower())

# enum aliases matching pyngp naming (python_api.cu:309-430): the
# reference export_values()-s its enums into the module namespace
Nerf = TestbedMode.NERF
Sdf = TestbedMode.SDF
Image = TestbedMode.IMAGE
Volume = TestbedMode.VOLUME
# ELossType members (python_api.cu Loss enum; SmoothL1 ≡ Huber)
SmoothL1 = LossType.HUBER
Huber = LossType.HUBER
L1 = LossType.L1
L2 = LossType.L2
RelativeL2 = LossType.RELATIVE_L2
Mape = LossType.MAPE
Smape = LossType.SMAPE
LogL1 = LossType.LOGL1
# ECameraPredictionMode members (python_api.cu:401-407)
MatLogLinear = CameraPredictionMode.MAT_LOG_LINEAR
MatLogQuadratic = CameraPredictionMode.MAT_LOG_QUADRATIC
Se3LogLinear = CameraPredictionMode.SE3_LINEAR
Se3LogQuadratic = CameraPredictionMode.SE3_QUADRATIC
# ESDFGroundTruthMode members (python_api.cu:364-366)
RaytracedMesh = SDFGroundTruthMode.RAYTRACED_MESH
SpheretracedMesh = SDFGroundTruthMode.SPHERETRACED_MESH
# EEditingKernel members (camera-path brush)
Gaussian = EditingKernel.GAUSSIAN
Quartic = EditingKernel.QUARTIC
Hat = EditingKernel.HAT
Box = EditingKernel.BOX

# reference module-level classes (python_api.cu:435, 781/869/876):
# `ngp.path` wraps fs::path — pathlib.Path is the drop-in; `Training`
# is the pybind name of the nested per-primitive training views
path = Path
from instant_ngp_tpu.testbed import _NerfTrainingView as Training  # noqa: E402,F401

__all__ = [
    "Testbed",
    "TestbedMode",
    "BoundingBox",
    "BRDFParams",
    "CameraKeyframe",
    "CameraPath",
    "CameraPathPos",
    "CameraPathRenderSettings",
    "CameraPredictionMode",
    "EditingKernel",
    "GroundTruthRenderMode",
    "Lens",
    "LensMode",
    "LossType",
    "MeshSdfMode",
    "NerfActivation",
    "RandomMode",
    "RenderMode",
    "SDFGroundTruthMode",
    "TonemapCurve",
    "TrainMode",
    "mode_from_scene",
    "mode_from_string",
    "Nerf",
    "Sdf",
    "Image",
    "Volume",
]
