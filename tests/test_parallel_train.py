"""Sharded training on the 8-device virtual CPU mesh: dp / fsdp / tp configs
must produce the same losses as single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.parallel import make_mesh, default_mesh
from ecg_byte_tpu.train import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from ecg_byte_tpu.train.scheduler import make_optimizer, noam_schedule
from ecg_byte_tpu.train.step import shard_state


def _toy_batch(config, rng, b=8, s=12):
    ids = rng.integers(0, config.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[:, :2] = 0
    labels = np.where(mask == 1, ids, -100)
    return {
        "input_ids": jnp.asarray(ids),
        "attn_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
    }


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_noam_schedule_matches_reference():
    sched = noam_schedule(d_model=512, warmup_steps=500)
    # reference: init_lr = 512^-0.5; step counter starts at 1
    for ref_step in [1, 10, 500, 5000]:
        want = 512**-0.5 * min(ref_step**-0.5, 500**-1.5 * ref_step)
        got = float(sched(ref_step - 1))
        np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("peft", [True, False])
def test_train_step_runs_and_learns(peft):
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    state = create_train_state(config, opt, jax.random.PRNGKey(0), peft=peft)
    step_fn = make_train_step(config, opt)
    batch = _toy_batch(config, np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(12):
        state, loss = step_fn(state, batch, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12


@pytest.mark.parametrize(
    "mesh_shape", [dict(dp=8), dict(dp=2, tp=4), dict(fsdp=4, tp=2), dict(dp=2, fsdp=2, tp=2)]
)
def test_sharded_training_matches_single_device(mesh_shape):
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    rng = jax.random.PRNGKey(0)
    batch = _toy_batch(config, np.random.default_rng(1))

    # single-device ground truth (no dropout: rng fixed but dropout uses
    # fold_in(step); keep peft=False so no dropout path at all)
    state0 = create_train_state(config, opt, rng, peft=False)
    step0 = make_train_step(config, opt)
    sref, _ = state0, None
    ref_losses = []
    for _ in range(4):
        sref, loss = step0(sref, batch, jax.random.PRNGKey(9))
        ref_losses.append(float(loss))

    mesh = make_mesh(**mesh_shape)
    state = create_train_state(config, opt, rng, peft=False)
    state = shard_state(state, config, mesh, peft=False, fsdp="fsdp" in mesh_shape)
    with mesh:
        stepm = make_train_step(config, opt, mesh)
        losses = []
        for _ in range(4):
            state, loss = stepm(state, batch, jax.random.PRNGKey(9))
            losses.append(float(loss))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=2e-4)


def test_sharded_peft_training_with_eval():
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    mesh = default_mesh(tp=2)  # dp=4, tp=2
    state = create_train_state(config, opt, jax.random.PRNGKey(0), peft=True)
    state = shard_state(state, config, mesh, peft=True)
    batch = _toy_batch(config, np.random.default_rng(2))
    with mesh:
        step_fn = make_train_step(config, opt, mesh)
        eval_fn = make_eval_step(config, mesh)
        before = float(eval_fn(state, batch))
        rng = jax.random.PRNGKey(3)
        for _ in range(10):
            state, _ = step_fn(state, batch, rng)
        after = float(eval_fn(state, batch))
    assert after < before


def test_base_params_frozen_under_peft():
    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    state = create_train_state(config, opt, jax.random.PRNGKey(0), peft=True)
    step_fn = make_train_step(config, opt)
    batch = _toy_batch(config, np.random.default_rng(3))
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.base)
    state, _ = step_fn(state, batch, jax.random.PRNGKey(4))
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(state.base)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_trainer_survives_bad_batches():
    """Reference per-step exception swallowing (runners/train.py:59-61)."""
    from ecg_byte_tpu.train.runner import trainer

    config = tiny_test_config("llama", vocab_size=64)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    state = create_train_state(config, opt, jax.random.PRNGKey(0), peft=True)
    step_fn = make_train_step(config, opt)
    good = _toy_batch(config, np.random.default_rng(0), b=2, s=8)
    raw_good = {
        "tokenized_signal": good["input_ids"],
        "attn_mask": good["attn_mask"],
        "quantized_signal_ids_input": good["labels"],
        "position_ids": jnp.tile(jnp.arange(8), (2, 1)),
    }

    class Loader:
        def set_epoch(self, e):
            pass

        def __iter__(self):
            yield raw_good
            yield None                       # invalid batch -> skipped
            yield {"tokenized_signal": "garbage"}  # raises -> swallowed
            yield raw_good

    state, out = trainer(
        state, step_fn, Loader(), jax.random.PRNGKey(1), epoch=0, toy=True
    )
    assert np.isfinite(out["average_loss"])
    assert int(state.step) == 2  # only the two good batches stepped


def test_tp_sharded_greedy_decode():
    """Serving path: greedy decode with tensor-parallel-sharded params must
    reproduce single-device decoding exactly."""
    from ecg_byte_tpu.infer import greedy_generate
    from ecg_byte_tpu.models import transformer as T
    from ecg_byte_tpu.parallel import param_specs, shard_tree

    config = tiny_test_config("llama", vocab_size=64)
    params = T.init_params(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 64, size=(2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)

    want = np.asarray(greedy_generate(
        params, config, ids, mask, max_new_tokens=8,
        eos_token_id=-1, pad_token_id=0,
    ))

    mesh = make_mesh(dp=1, tp=4)
    sharded = shard_tree(params, param_specs(config), mesh)
    with mesh:
        got = np.asarray(greedy_generate(
            sharded, config, ids, mask, max_new_tokens=8,
            eos_token_id=-1, pad_token_id=0,
        ))
    np.testing.assert_array_equal(got, want)


def test_chunked_loss_step_matches_dense():
    """make_train_step(chunked_loss=True) reproduces the dense-loss step."""
    config = tiny_test_config("llama", vocab_size=256)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 256, (4, 32)), np.int32)
    batch = {"input_ids": ids, "attn_mask": np.ones((4, 32), np.int32),
             "labels": ids}
    key = jax.random.PRNGKey(0)

    losses = {}
    for chunked in (False, True):
        state = create_train_state(
            config, opt, jax.random.PRNGKey(1), peft=True
        )
        step = make_train_step(config, opt, None, chunked_loss=chunked)
        for _ in range(3):
            state, loss = step(state, batch, key)
        losses[chunked] = float(loss)
    np.testing.assert_allclose(losses[False], losses[True], rtol=2e-4)


def test_chunked_loss_tp_sharded_matches_single_device():
    """chunked_loss under a dp x tp mesh (head tiles tp-sharded instead of
    replicated) must reproduce the single-device chunked loss."""
    from ecg_byte_tpu.train.step import shard_state

    config = tiny_test_config("llama", vocab_size=256)
    opt = make_optimizer(config.hidden_size, warmup_steps=10)
    rng = np.random.default_rng(3)
    ids = np.asarray(rng.integers(0, 256, (8, 32)), np.int32)
    batch = {"input_ids": ids, "attn_mask": np.ones((8, 32), np.int32),
             "labels": ids}
    key = jax.random.PRNGKey(0)

    state = create_train_state(config, opt, jax.random.PRNGKey(1), peft=True)
    step = make_train_step(config, opt, None, chunked_loss=True)
    state, want = step(state, batch, key)

    mesh = make_mesh(dp=2, tp=4)
    state2 = create_train_state(config, opt, jax.random.PRNGKey(1), peft=True)
    state2 = shard_state(state2, config, mesh, peft=True)
    with mesh:
        stepm = make_train_step(config, opt, mesh, chunked_loss=True)
        state2, got = stepm(state2, batch, key)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-5)
