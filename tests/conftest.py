"""Test configuration: CPU backend with a virtual 8-device mesh and x64 on —
or, with ``--runtpu``, the real TPU running only the ``tpu``-marked tier.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count) since real multi-chip hardware is not
available in CI; numeric oracles run in f64 to certify the algorithms, and
separate f32 tests bound the TPU-precision error. The ``tpu`` tier
(tests/test_tpu_hardware.py) runs the COMPILED Pallas kernels on the real
device against the same oracles — the analogue of the reference running its
gtest suites on the deployment target (ocs2_sqp/CMakeLists.txt:102-112).

Note: the environment's sitecustomize imports jax and pins JAX_PLATFORMS to
the TPU plugin before any conftest runs, so the platform must be forced via
jax.config (backends initialize lazily), not env vars. Platform selection
therefore happens in pytest_configure, after options are parsed.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Keep stage scans rolled in CI: tracing the fully-unrolled solver graphs is
# pure uncacheable Python time and dominated suite wall clock (numerics are
# identical; the unroll is a TPU pipelining optimization, ops/riccati.py).
os.environ.setdefault("CHEETA_STAGE_UNROLL", "1")

import pytest  # noqa: E402


def _compute_cpu_key() -> str:
    """Host-CPU-feature hash keying the XLA:CPU persistent cache dir (AOT
    executables are machine-specific; loading a foreign entry SIGILLs)."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            _flags = next((ln for ln in f if ln.startswith("flags")), "")
        return hashlib.sha1(_flags.encode()).hexdigest()[:10]
    except OSError:
        return "generic"


# Module-level so tests that spawn subprocesses (test_launch.py) can point
# them at the same cache dir.
_cpu_key = _compute_cpu_key()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (golden-GRF NLP oracles, multihost "
             "subprocess, long closed-loop) — the once-per-round full tier")
    parser.addoption(
        "--runtpu", action="store_true", default=False,
        help="run ONLY the tpu-marked tier on the real TPU device (compiled "
             "Pallas kernels vs stored oracles). Do not run concurrently "
             "with bench.py — they share the chip.")


def pytest_configure(config):
    import jax
    if config.getoption("--runtpu"):
        # Real device; f32 (x64 stays off — the TPU tier certifies the f32
        # deployment path, the CPU tier certifies the algorithms in f64).
        # Persistent cache shared with bench.py so kernels reuse compiles.
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        return
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Persistent compilation cache: XLA compiles dominate test time on the
    # small CI machine; cache them across runs. The cache dir is keyed by
    # the host CPU's feature set: XLA:CPU AOT executables are
    # machine-specific, and loading an entry produced on a different host
    # (this environment migrates VMs between sessions) SIGILLs/segfaults
    # mid-suite — the "rare non-deterministic serialize segfault" of
    # earlier rounds was this.
    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/jax_cache_cpu_{_cpu_key}")
    # Only cache genuinely slow compiles: every persistent-cache write calls
    # XLA's executable.serialize(), which has (rarely, non-deterministically)
    # segfaulted mid-suite under the full test load; a 1 s threshold keeps
    # the wins (the multi-second solver compiles) while cutting the number
    # of serialize calls ~10x.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound in-process XLA/jit state: with the full ~160-test suite in one
    process, accumulated compiler state has (reproducibly, only in the full
    run — any half passes) segfaulted XLA:CPU mid-compile around the ~90th
    test. Clearing the in-memory caches between modules keeps the process
    small; compiled artifacts reload from the persistent disk cache."""
    yield
    import jax
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """Default run excludes the ``slow`` and ``tpu`` tiers; ``--runslow``
    restores the full CPU suite; ``--runtpu`` selects ONLY the tpu tier
    (the rest assume the CPU/f64 configuration)."""
    if config.getoption("--runtpu"):
        skip = pytest.mark.skip(reason="--runtpu runs only the tpu tier")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
        return
    skip_tpu = pytest.mark.skip(reason="tpu tier: run with --runtpu on "
                                       "hardware")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
