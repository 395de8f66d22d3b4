"""Test configuration: force the CPU backend with 8 virtual devices so every
test (including multi-chip sharding tests) runs without touching TPU hardware.

Note: this environment pre-registers a TPU PJRT plugin at interpreter startup
(so the JAX_PLATFORMS env var alone is ignored); jax.config.update is the
reliable way to pin the backend, and XLA_FLAGS must be set before the CPU
client initializes (which happens lazily, so here is early enough).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
