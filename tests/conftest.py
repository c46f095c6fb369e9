"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication). The host
image pins JAX to the TPU backend through a sitecustomize hook, so we must
re-pin to CPU via jax.config *before* any backend is initialized.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Deterministic, high-precision matmuls for golden-value parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
