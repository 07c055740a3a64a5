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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
