"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU
backend before any test code runs, so the JAX_PLATFORMS env var is
already frozen into jax.config - override the config value directly
(before any backend is initialized) instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# re-scope the persistent compile cache for the CPU backend (host-ISA
# keyed subdir; bfc_tpu/utils/cache.py) - the package scoped it by the
# env platform, which the line above just overrode
import bfc_tpu  # noqa: E402,F401
from bfc_tpu.utils.cache import apply_cache_dir  # noqa: E402

apply_cache_dir("cpu")
