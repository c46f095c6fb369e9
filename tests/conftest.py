"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device code paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication). The host
image pins JAX to the TPU backend through a sitecustomize hook, so we must
re-pin to CPU via jax.config *before* any backend is initialized.
"""

import os
import sys

# CASE_RG_TEST_TPU=1: keep the host's real TPU backend for TARGETED runs
# of the real-TPU-only tests (e.g. the Mosaic-PRNG kernel consistency
# test — the interpreter has no prng_seed lowering). The full suite is
# NOT expected to pass on TPU (golden-value tests assume CPU f32).
_TPU = os.environ.get("CASE_RG_TEST_TPU") == "1"
if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Deterministic, high-precision matmuls for golden-value parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

if not _TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: repeat suite runs skip recompiling the big
# train-step/decode programs (the suite is compile-dominated on this 1-core
# host). Keyed on backend+jaxlib+flags, so CPU test entries don't collide
# with the TPU CLI cache entries.
_cache_dir = os.environ.get(
    "CASE_RG_TEST_COMPILE_CACHE",
    os.path.expanduser("~/.cache/case_rg_tpu_xla_tests"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
