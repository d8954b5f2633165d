"""instant_ngp_tpu — a TPU-native (JAX/XLA/Pallas) neural graphics
primitives framework with the capabilities of NVlabs/instant-ngp."""

__version__ = "0.1.0"

from .common import TestbedMode  # noqa: F401
from .testbed import Testbed, mode_from_scene  # noqa: F401
