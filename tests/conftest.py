"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
XLA_FLAGS=--xla_force_host_platform_device_count (SURVEY.md §4).
"""

import os

# Force CPU even when the ambient env points at a TPU (the suite is
# designed for the virtual 8-device mesh; running it through a remote
# TPU tunnel is slow and numerically looser).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
