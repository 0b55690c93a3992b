"""Test configuration: CPU backend with a virtual 8-device mesh and x64 on.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since real multi-chip hardware is not
available in CI; numeric oracles run in f64 to certify the algorithms, and
separate f32 tests bound the TPU-precision error.

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the TPU plugin before any conftest runs, so the platform must be forced via
jax.config (backends initialize lazily), not env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: XLA compiles dominate test time on the small
# CI machine; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
# Only cache genuinely slow compiles: every persistent-cache write calls
# XLA's executable.serialize(), which has (rarely, non-deterministically)
# segfaulted mid-suite under the full test load; a 1 s threshold keeps the
# wins (the multi-second solver compiles) while cutting the number of
# serialize calls ~10x.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
