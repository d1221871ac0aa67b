"""Test configuration.

Mirrors the reference's "mpirun on one host" testing model (SURVEY.md §4): we run
the sharded code paths on a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count`` instead of needing a real TPU slice.
"""

import os

# Must happen before jax is imported anywhere.  Force CPU even when the outer
# environment points at a TPU platform — the suite is designed to run anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen" not in os.environ["XLA_FLAGS"]:
    # parallel LLVM codegen thrashes on few-core hosts (see CLAUDE.md)
    os.environ["XLA_FLAGS"] += " --xla_cpu_parallel_codegen_split_count=1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    # force cpu even when a sitecustomize-installed TPU plugin pins jax_platforms
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
try:
    # Persistent compile cache: OPT-IN ONLY (SE_TEST_COMPILE_CACHE=1).  The
    # suite is dominated by XLA:CPU compiles (~15 min cold) and a warm cache
    # helps — but this jaxlib's XLA:CPU executable serialize/deserialize is
    # INTERMITTENTLY FATAL for the large staged-solve executables: three
    # suite runs on 2026-08-18 died with SIGSEGV inside
    # backend.deserialize_executable / executable.serialize (with and
    # without concurrent processes, with and without an interprocess lock).
    # A randomly-crashing suite is worse than a slow one, so the default is
    # no persistent cache.  When opted in, the suite uses its own dir
    # (.jax_cache_tests) and serializes cache access across processes.
    if os.environ.get("SE_TEST_COMPILE_CACHE") != "1":
        raise RuntimeError("test compile cache is opt-in")
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tests")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # This jaxlib's cache read/write is NOT safe against a concurrent writer
    # even within one dir (observed twice on 2026-08-18: SIGSEGV inside
    # get_executable_and_time and put_executable_and_time when two pytest
    # processes shared the dir).  Serialize both entry points across
    # processes with an flock so overlapping suite runs are safe.
    import fcntl as _fcntl

    import jax._src.compilation_cache as _cc

    _lock_path = _cache_dir + ".lock"

    def _interprocess_locked(fn):
        def wrapper(*a, **k):
            os.makedirs(_cache_dir, exist_ok=True)
            with open(_lock_path, "w") as f:
                _fcntl.flock(f, _fcntl.LOCK_EX)
                return fn(*a, **k)
        return wrapper

    _cc.get_executable_and_time = _interprocess_locked(
        _cc.get_executable_and_time)
    _cc.put_executable_and_time = _interprocess_locked(
        _cc.put_executable_and_time)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA:CPU on this 1-core host segfaults inside backend_compile partway
    through a ONE-PROCESS full-suite run (reproduced 2026-08-18 twice and
    2026-08-19 at tests/test_solver.py::test_staged_profile_subphases; the
    very same compile succeeds in a fresh process — an accumulation effect
    in the CPU client, not a bad test).  Dropping every live executable
    between modules keeps the per-process accumulation bounded at roughly
    one module's worth, which is the per-file regime tools/run_tests.sh
    already proved stable.  Costs recompiles of the handful of lru-cached
    solvers shared across modules."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
