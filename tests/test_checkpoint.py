"""Checkpoint roles + the donation-safe crash save.

The train step donates its input state (train/step.py donate_argnums), so
after a mid-epoch interrupt the caller's live state points at deleted
buffers.  CPU ignores donation, so these tests simulate it by explicitly
`.delete()`ing the buffers — the crash save must then fall back to the
host-RAM epoch snapshot (reference crash semantics: main.py:322-346).

Crash saves carry only the MUTABLE leaves under PEFT: the frozen base is
immutable and reconstructible, so a flagship-sized base must never gate
whether a crash checkpoint happens (round-2 verdict item 3).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.train import create_train_state
from ecg_byte_tpu.train.checkpoint import (
    load_checkpoint,
    save_crash_checkpoint,
    snapshot_state,
    state_is_alive,
)
from ecg_byte_tpu.train.scheduler import make_optimizer


def _tiny_state(peft=True):
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    return config, opt, create_train_state(
        config, opt, jax.random.PRNGKey(0), peft=peft
    )


def _delete_buffers(state):
    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array):
            leaf.delete()


def test_crash_checkpoint_saves_live_state(tmp_path):
    _, _, state = _tiny_state()
    assert state_is_alive(state)
    src = save_crash_checkpoint(str(tmp_path), state, None, epoch=3)
    assert src == "live"
    _, _, template = _tiny_state()
    loaded, epoch = load_checkpoint(str(tmp_path), "crash_model", template)
    assert epoch == 3
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crash_checkpoint_falls_back_to_snapshot_when_donated(tmp_path):
    """Simulated donation: live buffers deleted -> snapshot must be saved."""
    _, _, state = _tiny_state()
    snapshot = snapshot_state(state)  # host copy (epoch boundary)
    host_trainable = jax.tree.map(np.asarray, state.trainable)
    _delete_buffers(state)
    assert not state_is_alive(state)

    src = save_crash_checkpoint(
        str(tmp_path), state, snapshot, epoch=7, fallback_epoch=5
    )
    assert src == "snapshot"
    _, _, template = _tiny_state()
    loaded, epoch = load_checkpoint(str(tmp_path), "crash_model", template)
    assert epoch == 5
    for a, b in zip(
        jax.tree.leaves(host_trainable), jax.tree.leaves(loaded.trainable)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the base was grafted back from the template, not the checkpoint
    for a, b in zip(jax.tree.leaves(template.base), jax.tree.leaves(loaded.base)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crash_checkpoint_none_when_nothing_savable(tmp_path):
    _, _, state = _tiny_state()
    _delete_buffers(state)
    assert save_crash_checkpoint(str(tmp_path), state, None) == "none"


def test_snapshot_excludes_frozen_base():
    """A PEFT snapshot must not mirror the base: its size is bounded by the
    adapters + opt state, so a base exceeding the limit cannot kill it."""
    _, _, state = _tiny_state()
    base_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state.base)
    )
    mutable_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves((state.trainable, state.opt_state, state.step))
    )
    # limit below the base size but >= the mutable set: snapshot survives
    snap = snapshot_state(state, limit_bytes=mutable_bytes)
    assert snap is not None and snap.mutable_only
    assert snap.nbytes == mutable_bytes
    assert snap.nbytes < base_bytes + mutable_bytes


def test_full_finetune_snapshot_respects_limit():
    """Non-PEFT states have no frozen base: everything is mutable, and the
    size bail still applies (returns None over the limit)."""
    _, _, state = _tiny_state(peft=False)
    assert snapshot_state(state, limit_bytes=1) is None
    snap = snapshot_state(state)
    assert snap is not None and not snap.mutable_only


def test_crash_roundtrip_with_oversized_base(tmp_path):
    """End-to-end flagship scenario: base larger than the snapshot limit,
    live state donated mid-epoch — the crash save must still happen and
    restore against a freshly built base."""
    _, _, state = _tiny_state()
    mutable_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves((state.trainable, state.opt_state, state.step))
    )
    # a limit the FULL state (mutable + base) would blow but the mutable
    # set exactly fits — the flagship shape of the problem
    snap = snapshot_state(state, limit_bytes=mutable_bytes)
    assert snap is not None, "mutable-only snapshot must fit under the limit"
    _delete_buffers(state)
    src = save_crash_checkpoint(
        str(tmp_path), state, snap, epoch=2, fallback_epoch=1
    )
    assert src == "snapshot"
    _, _, template = _tiny_state()
    loaded, epoch = load_checkpoint(str(tmp_path), "crash_model", template)
    assert epoch == 1
    assert jax.tree.structure(loaded) == jax.tree.structure(template)


def test_trainer_window_accumulation_matches_per_step():
    """Device-side loss windowing must produce the same epoch average as the
    old per-step float() path, for any window/batch-count alignment."""
    from ecg_byte_tpu.train.runner import trainer

    losses = [2.0, 1.0, 4.0, 0.5, 3.0, 1.5, 2.5]

    class FakeState:
        step = 0

    def step_fn(state, batch, rng):
        return state, jnp.asarray(losses[batch["input_ids"]])

    class Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            for i in range(len(losses)):
                yield {
                    "tokenized_signal": np.asarray(i),
                    "attn_mask": np.zeros(1, np.int32),
                    "quantized_signal_ids_input": np.zeros(1, np.int32),
                    "position_ids": np.zeros(1, np.int32),
                }

    logged = []
    for log_every in (1, 2, 3, 7, 100):
        _, out = trainer(
            FakeState(), step_fn, Loader(), None, epoch=0, toy=True,
            log_fn=lambda d: logged.append(d), log_every=log_every,
        )
        np.testing.assert_allclose(out["average_loss"], np.mean(losses), rtol=1e-6)
    # windowed log lines carry the window average
    assert any("train_step_loss" in d for d in logged)
