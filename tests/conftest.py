"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

The driver benches on a real TPU chip; tests run hardware-free on the CPU
backend with 8 virtual devices so `parallel/` sharding paths are exercised
exactly as they would be on an 8-chip ICI mesh.
"""

import os

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) pre-imports jax at
# interpreter startup and pins the platform to the remote-TPU "axon" tunnel,
# ignoring JAX_PLATFORMS.  Tests must force local CPU — both for speed (no
# tunneled compiles) and for the 8-device virtual mesh — via jax.config,
# which still wins as long as no computation has run yet.
# AAT_TEST_PLATFORM=tpu opts OUT of the CPU forcing for targeted runs of
# the TPU-marked compiled-Pallas tests (e.g.
# `AAT_TEST_PLATFORM=tpu python -m pytest tests/test_pallas_stft.py -k
# compiled`) — do not run the full suite this way: every compile is a slow
# tunnel round-trip and the 8-device mesh tests need the virtual CPU mesh.
_FORCE_CPU = os.environ.get("AAT_TEST_PLATFORM", "cpu") == "cpu"
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the big scan/vmap pipelines take tens of
# seconds to compile; cache across test runs (in-repo so it survives /tmp
# cleanup).  Must be set through jax.config — the sitecustomize pre-import
# already materialized JAX_* env vars, so env settings are ignored.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Every XLA:CPU compile mmaps JIT code regions that live as long as the
# compiled executable.  Across a full-suite process the ~240 tests' programs
# accumulate several tens of thousands of mappings and eventually exhaust the
# kernel's vm.max_map_count (default 65530), at which point the *next* mmap
# inside jaxlib fails and the process segfaults — always late in the run, in
# whatever happened to compile/(de)serialize next (historically test_yin.py,
# simply because it sorts last).  Dropping compiled executables after each
# test module keeps the process's mapping count bounded; the on-disk
# persistent cache makes the cross-module recompiles this forces cheap.
@pytest.fixture(autouse=True, scope="module")
def _bound_jit_mappings():
    yield
    jax.clear_caches()
