"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; following the standard JAX trick
(SURVEY.md §4.6) we force the host platform and split it into 8 virtual
devices so sharding/pjit tests exercise real collective lowering.

NOTE: this image's axon sitecustomize force-registers the TPU plugin and
sets jax_platforms="axon,cpu" regardless of the env var, so we must override
through jax.config AFTER import (env JAX_PLATFORMS=cpu alone is ignored).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
