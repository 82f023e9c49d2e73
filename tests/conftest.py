"""Test configuration: run on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests force the CPU
backend and 8 virtual devices so sharding logic is validated hermetically
without TPU hardware. Must happen before jax initializes its backends.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
