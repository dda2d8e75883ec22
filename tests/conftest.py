"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the way the reference validates hardware
without an FPGA (SURVEY.md §4.5): simulated devices. Env vars must be set
before jax initializes its backends, hence the top-level assignment.
"""

import os

# The session environment pins JAX_PLATFORMS to the real TPU backend; tests
# always run on the virtual CPU mesh unless explicitly overridden.
os.environ["JAX_PLATFORMS"] = os.environ.get("OFDMGAN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have imported jax already (registering the hardware
# backend), in which case the env var above came too late — force the
# platform through the config API, which takes effect as long as no backend
# has been initialized yet.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_threefry_partitionable", True)
