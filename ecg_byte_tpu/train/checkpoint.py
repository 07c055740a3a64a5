"""Orbax checkpointing with the reference's file roles.

The reference saves ``best_model.pth`` on val-loss improvement,
``crash_model.pth`` on exception/exit, and mid-epoch snapshots every 50k
steps (main.py:298-346, runners/train.py:35-53) — model weights only, no
optimizer state, no resume.  Here each role is an orbax checkpoint directory
carrying the FULL train state (trainable, optimizer, step), which upgrades
the reference with true resume while keeping the same best/crash semantics.
"""

from __future__ import annotations

import json
import os
from typing import Any, NamedTuple, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(directory: str, role: str) -> str:
    return os.path.join(os.path.abspath(directory), role)


def _meta_path(directory: str, role: str) -> str:
    return _path(directory, role) + ".meta.json"


def _mutable_payload(state: Any) -> Any:
    """The leaves the train step actually mutates.

    Under PEFT (``state.base`` frozen) that is {trainable, opt_state, step}
    — a few hundred MB at flagship size, vs multi-GB with the immutable
    bf16 base included.  The base never changes during training and is
    reconstructible from ``--hf_weights``/init, so crash saves and host
    snapshots never need to carry it.
    """
    if getattr(state, "base", None) is not None:
        return {
            "trainable": state.trainable,
            "opt_state": state.opt_state,
            "step": state.step,
        }
    return state


class HostSnapshot(NamedTuple):
    """Host-RAM mirror of a state's mutable leaves (crash-save fallback)."""

    payload: Any
    mutable_only: bool
    nbytes: int


def snapshot_state(state: Any, limit_bytes: Optional[int] = None):
    """Mirror the mutable leaves of ``state`` into host RAM.

    Returns a :class:`HostSnapshot`, or None when the mutable set exceeds
    ``limit_bytes`` (only possible for full-finetune states; PEFT states
    shrink to the adapter + Adam moments and always fit).
    """
    payload = _mutable_payload(state)
    mutable_only = payload is not state
    nbytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(payload)
        if hasattr(x, "dtype")
    )
    if limit_bytes is not None and nbytes > limit_bytes:
        return None
    return HostSnapshot(jax.tree.map(np.asarray, payload), mutable_only, nbytes)


def save_checkpoint(
    directory: str, role: str, state: Any, *, epoch: int = 0,
    mutable_only: bool = False,
) -> None:
    """Save a pytree under ``{directory}/{role}`` (role: best_model /
    crash_model / best_train_model_{e}_{s}).

    ``mutable_only=True`` records in the sidecar that ``state`` is a
    {trainable, opt_state, step} payload without the frozen base;
    :func:`load_checkpoint` then grafts the base back from its template.
    """
    path = _path(directory, role)
    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state, "epoch": np.asarray(epoch)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(_meta_path(directory, role), "w") as f:
        json.dump({"mutable_only": bool(mutable_only)}, f)


def _is_mutable_only(directory: str, role: str) -> bool:
    try:
        with open(_meta_path(directory, role)) as f:
            return bool(json.load(f).get("mutable_only", False))
    except (OSError, ValueError):
        return False  # pre-sidecar checkpoints are always full states


def load_checkpoint(directory: str, role: str, target: Optional[Any] = None):
    """Load a checkpoint; ``target`` provides structure/shape/dtype template.

    Mutable-only checkpoints (flagship crash saves) are restored against
    the mutable subset of ``target`` and merged with its (freshly built)
    frozen base.  Returns (state, epoch)."""
    path = _path(directory, role)
    ckptr = ocp.StandardCheckpointer()
    mutable_only = _is_mutable_only(directory, role)
    if target is not None:
        tmpl_state = _mutable_payload(target) if mutable_only else target
        template = {
            "state": jax.tree.map(ocp.utils.to_shape_dtype_struct, tmpl_state),
            "epoch": ocp.utils.to_shape_dtype_struct(np.asarray(0)),
        }
        payload = ckptr.restore(path, template)
    else:
        payload = ckptr.restore(path)
    state = payload["state"]
    if mutable_only and target is not None and getattr(target, "base", None) is not None:
        state = type(target)(
            trainable=state["trainable"],
            base=target.base,
            opt_state=state["opt_state"],
            step=state["step"],
        )
    return state, int(payload["epoch"])


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
    fallback: Optional[HostSnapshot],
    *,
    epoch: int = 0,
    fallback_epoch: int = 0,
) -> str:
    """Crash-save path (reference main.py:322-346 semantics, donation-safe).

    Saves the live ``state`` when its buffers are intact; otherwise falls
    back to ``fallback`` — a host-RAM snapshot taken at the last epoch
    boundary, which a donated-and-deleted live state cannot invalidate.
    Under PEFT both paths save only the mutable leaves, so flagship-sized
    frozen bases never gate whether a crash save happens.

    Returns the source actually saved: ``"live"``, ``"snapshot"``, or
    ``"none"`` (nothing savable).
    """
    if state_is_alive(state):
        payload = _mutable_payload(state)
        save_checkpoint(
            directory, "crash_model", payload, epoch=epoch,
            mutable_only=payload is not state,
        )
        return "live"
    if fallback is not None:
        save_checkpoint(
            directory, "crash_model", fallback.payload, epoch=fallback_epoch,
            mutable_only=fallback.mutable_only,
        )
        return "snapshot"
    return "none"
