"""Checkpoint roles + the donation-safe crash save.

The train step donates its input state (train/step.py donate_argnums), so
after a mid-epoch interrupt the caller's live state points at deleted
buffers.  CPU ignores donation, so these tests simulate it by explicitly
`.delete()`ing the buffers — the crash save must then fall back to the
host-RAM epoch snapshot (reference crash semantics: main.py:322-346).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.train import create_train_state
from ecg_byte_tpu.train.checkpoint import (
    load_checkpoint,
    save_crash_checkpoint,
    state_is_alive,
)
from ecg_byte_tpu.train.scheduler import make_optimizer


def _tiny_state():
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    return config, opt, create_train_state(
        config, opt, jax.random.PRNGKey(0), peft=True
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
    snapshot = jax.tree.map(np.asarray, state)  # host copy (epoch boundary)
    _delete_buffers(state)
    assert not state_is_alive(state)

    src = save_crash_checkpoint(
        str(tmp_path), state, snapshot, epoch=7, fallback_epoch=5
    )
    assert src == "snapshot"
    _, _, template = _tiny_state()
    loaded, epoch = load_checkpoint(str(tmp_path), "crash_model", template)
    assert epoch == 5
    for a, b in zip(jax.tree.leaves(snapshot), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_crash_checkpoint_none_when_nothing_savable(tmp_path):
    _, _, state = _tiny_state()
    _delete_buffers(state)
    assert save_crash_checkpoint(str(tmp_path), state, None) == "none"


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
