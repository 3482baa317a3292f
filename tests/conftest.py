"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4 implication).

Note: this environment's sitecustomize registers a remote "axon" TPU
PJRT plugin in every process and forces jax_platforms=axon,cpu; tests
must not run through the (high-latency) TPU tunnel, so we override the
platform list to cpu *after* jax import but before any backend is
initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _reset_jax_between_modules():
    """Drop compiled executables between test modules.

    The full suite compiles ~100+ XLA CPU programs in one process; by
    ~95 tests in, a further compile SIGSEGVs inside
    `backend_compile_and_load` (VERDICT r4 weak #1 — deterministic at
    test_majorant.py::test_octant_boxes_preserve_estimator, while every
    module passes in isolation).  Freeing the jit/pjit caches at module
    boundaries keeps the live-executable population bounded so the
    one-command `pytest tests/ -q` certification actually runs end to
    end.  Costs re-compiles of cross-module shared programs only.
    """
    yield
    jax.clear_caches()
    gc.collect()
