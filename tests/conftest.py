"""Test configuration: force an 8-device virtual CPU mesh.

This is JAX's standard mechanism for testing multi-chip sharding without
hardware (SURVEY.md §4) — the reference has no distributed tests at all; we
simulate 8 chips on CPU.

Note: the environment pre-sets ``JAX_PLATFORMS=axon`` (a TPU plugin) and the
plugin re-registers itself even if the env var is overridden, so we must
force the platform through ``jax.config`` after import, before any backend
initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_CACHE_DIR = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/ecg_byte_tpu_jax_cache"
)
# propagate to the CLI subprocess tests (they inherit os.environ)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the CLI e2e tests spawn subprocesses that
# each recompile the same tiny models; caching cuts suite wall-clock to a
# fraction on repeat runs (cache misses only on the first ever run).
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
