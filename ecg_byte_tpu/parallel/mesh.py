"""Mesh construction over TPU slices (or virtual CPU devices in tests)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("dp", "fsdp", "tp")


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "fsdp", "tp") mesh.

    Axis roles:
      dp    — pure data parallelism (batch sharding, gradient psum);
      fsdp  — data parallelism that additionally shards parameters/optimizer
              state (ZeRO-3); batches shard over dp x fsdp combined;
      tp    — megatron tensor parallelism (heads / MLP hidden sharding),
              laid out innermost so its collectives ride the fastest ICI
              links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = dp * fsdp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, fsdp, tp)
    return Mesh(arr, AXES)


def default_mesh(tp: int = 1, fsdp: int = 1) -> Mesh:
    """All local devices, remainder on the dp axis."""
    n = local_device_count()
    dp = n // (tp * fsdp)
    return make_mesh(dp=max(dp, 1), fsdp=fsdp, tp=tp)
