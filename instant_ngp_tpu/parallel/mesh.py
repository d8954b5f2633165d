"""Device-mesh helpers.

The reference's only multi-device feature is single-node multi-GPU
render fan-out via cudaMemcpyPeerAsync (testbed.cu:5547-5658). The
TPU-native mapping (SURVEY.md §2.11-5): one jax.sharding.Mesh; params
and occupancy bitfield replicated over ICI, ray/pixel batches sharded;
gradient psum over ICI; multi-host via jax.distributed over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))
