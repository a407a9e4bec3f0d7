"""Test environment: CPU backend with 8 virtual devices.

The TPU-world equivalent of "multi-node testing without a cluster"
(SURVEY.md §4): all mesh/sharding logic is exercised on a fake 8-device
CPU mesh. Note: in this environment the JAX_PLATFORMS env var is
overridden by the harness (config value 'axon,cpu'), so we must force the
platform via jax.config *before* any backend is initialized.
"""

import os

_TPU_SMOKE = os.environ.get("TTS_TPU_SMOKE") == "1"

if not _TPU_SMOKE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_SMOKE:
    # TTS_TPU_SMOKE=1 keeps the real backend so tests/test_tpu_smoke.py
    # (the `-m tpu` tier) runs the Pallas kernels non-interpreted on the
    # actual chip.
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: model-compile-heavy tests re-hit the same
# executables across runs and across xdist workers (pytest.ini runs the
# suite with -n auto). Measured: test_transformer_tts 80s cold -> 54s warm
# on a 1-core host.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
