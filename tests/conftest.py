"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (SURVEY.md §4).

NB: in this environment jax is pre-imported at interpreter startup with
JAX_PLATFORMS=axon, so env vars alone are too late — we must flip the
config before any backend is initialized.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
