"""Orbax checkpointing with the reference's file roles.

The reference saves ``best_model.pth`` on val-loss improvement,
``crash_model.pth`` on exception/exit, and mid-epoch snapshots every 50k
steps (main.py:298-346, runners/train.py:35-53) — model weights only, no
optimizer state, no resume.  Here each role is an orbax checkpoint directory
carrying the FULL train state (trainable, optimizer, step), which upgrades
the reference with true resume while keeping the same best/crash semantics.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(directory: str, role: str) -> str:
    return os.path.join(os.path.abspath(directory), role)


def save_checkpoint(directory: str, role: str, state: Any, *, epoch: int = 0) -> None:
    """Save a pytree under ``{directory}/{role}`` (role: best_model /
    crash_model / best_train_model_{e}_{s})."""
    path = _path(directory, role)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state, "epoch": np.asarray(epoch)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(directory: str, role: str, target: Optional[Any] = None):
    """Load a checkpoint; ``target`` provides structure/shape/dtype template.

    Returns (state, epoch)."""
    path = _path(directory, role)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        template = {
            "state": jax.tree.map(ocp.utils.to_shape_dtype_struct, target),
            "epoch": ocp.utils.to_shape_dtype_struct(np.asarray(0)),
        }
        payload = ckptr.restore(path, template)
    else:
        payload = ckptr.restore(path)
    return payload["state"], int(payload["epoch"])


def checkpoint_exists(directory: str, role: str) -> bool:
    return os.path.isdir(_path(directory, role))
