"""Test environment: CPU backend with 8 virtual devices.

The TPU-world equivalent of "multi-node testing without a cluster"
(SURVEY.md §4): all mesh/sharding logic is exercised on a fake 8-device
CPU mesh. Note: in this environment the JAX_PLATFORMS env var is
overridden by the harness (config value 'axon,cpu'), so we must force the
platform via jax.config *before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
