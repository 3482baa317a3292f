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
