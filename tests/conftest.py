"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere.  This is JAX's standard mechanism
for testing multi-chip sharding without hardware (SURVEY.md §4) — the
reference has no distributed tests at all; we simulate 8 chips on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
