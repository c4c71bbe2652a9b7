"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize registers the axon TPU platform and exports
JAX_PLATFORMS=axon, so a plain setdefault is not enough: we must override the
platform via jax.config before any backend is initialized, and inject the
virtual-device XLA flag first.  Tests then exercise real multi-device meshes
without TPU hardware (bench.py, by contrast, runs on the real chip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from lcpc_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
