"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Tests never require TPU hardware; multi-chip sharding is validated on
XLA's forced host-platform device count, per the framework's test strategy
(SURVEY.md section 4).

Note: the harness environment pins JAX_PLATFORMS=axon (a TPU tunnel) and a
sitecustomize imports jax before pytest loads this file, so env vars are
already baked -- we must use jax.config.update, which works any time before
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt and braces for subprocesses
# XLA:CPU's parallel LLVM codegen nondeterministically segfaults late in
# long many-compilation processes (crash stacks in
# backend_compile_and_load / executable serialization, unrelated to test
# bodies; observed ~tests 95-110 of the suite on a 2-core host).
# Serializing codegen removes the racy path.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_parallel_codegen_split_count=1"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent on-disk compilation cache: the suite compiles hundreds of
# XLA:CPU programs in one process, and the LLVM-backed compiler has been
# observed to segfault nondeterministically late in such runs (crash stack
# in backend_compile_and_load, unrelated to any test body).  Reusing
# compiled artifacts across runs cuts in-process compilations -- and reruns
# after a crash resume from cache instead of recompiling everything.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module.

    XLA:CPU segfaults nondeterministically after ~100 in-process
    compilations (crash stacks inside backend_compile_and_load /
    executable serialization, independent of which test is running --
    consistent with LLVM JIT code-memory exhaustion, not with any test
    body).  Dropping the in-memory jit caches between modules keeps the
    live-executable count bounded; the persistent on-disk compilation
    cache (above) makes re-tracing of shared programs cheap.
    """
    yield
    jax.clear_caches()
