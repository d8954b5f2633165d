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
    LensMode,
    LossType,
    MeshSdfMode,
    NerfActivation,
    RandomMode,
    RenderMode,
    TestbedMode,
    TonemapCurve,
    TrainMode,
)
from instant_ngp_tpu.testbed import Testbed, mode_from_scene  # noqa: F401


def mode_from_string(s: str) -> TestbedMode:
    """pyngp.mode_from_string (python_api.cu mode_from_string binding)."""
    return TestbedMode(str(s).lower())

# enum aliases matching pyngp naming (python_api.cu:309-430)
Nerf = TestbedMode.NERF
Sdf = TestbedMode.SDF
Image = TestbedMode.IMAGE
Volume = TestbedMode.VOLUME

__all__ = [
    "Testbed",
    "TestbedMode",
    "BoundingBox",
    "mode_from_scene",
    "mode_from_string",
    "Nerf",
    "Sdf",
    "Image",
    "Volume",
]
