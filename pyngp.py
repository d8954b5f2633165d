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

# enum aliases matching pyngp naming (python_api.cu:309-430)
Nerf = TestbedMode.NERF
Sdf = TestbedMode.SDF
Image = TestbedMode.IMAGE
Volume = TestbedMode.VOLUME

__all__ = [
    "Testbed",
    "TestbedMode",
    "mode_from_scene",
    "Nerf",
    "Sdf",
    "Image",
    "Volume",
]
