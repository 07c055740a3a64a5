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


def state_is_alive(state: Any) -> bool:
    """True unless any ``jax.Array`` leaf's buffer has been deleted.

    The train step donates its input state (train/step.py
    ``donate_argnums=(0,)``), so after a mid-epoch interrupt the caller's
    reference points at deleted device buffers.  CPU ignores donation, which
    is why only this explicit check (not an access attempt) is portable
    across test and TPU environments.
    """
    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array):
            try:
                if leaf.is_deleted():
                    return False
            except Exception:
                return False
    return True


def save_crash_checkpoint(
    directory: str,
    state: Any,
    fallback: Optional[Any],
    *,
    epoch: int = 0,
    fallback_epoch: int = 0,
) -> str:
    """Crash-save path (reference main.py:322-346 semantics, donation-safe).

    Saves the live ``state`` when its buffers are intact; otherwise falls
    back to ``fallback`` — a host-RAM snapshot taken at the last epoch
    boundary, which a donated-and-deleted live state cannot invalidate.

    Returns the source actually saved: ``"live"``, ``"snapshot"``, or
    ``"none"`` (nothing savable).
    """
    if state_is_alive(state):
        save_checkpoint(directory, "crash_model", state, epoch=epoch)
        return "live"
    if fallback is not None:
        save_checkpoint(directory, "crash_model", fallback, epoch=fallback_epoch)
        return "snapshot"
    return "none"
