"""Transformer correctness: masking/position semantics, loss, decode parity
with the full forward pass, LoRA overlay behavior, all three arch families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.models import lora as lora_lib
from ecg_byte_tpu.models import transformer as T


@pytest.fixture(scope="module", params=["llama", "gemma", "gpt2"])
def model(request):
    config = tiny_test_config(request.param)
    params = T.init_params(config, jax.random.PRNGKey(0))
    return config, params


def _batch(config, rng, b=2, s=16, n_pad=3):
    ids = rng.integers(0, config.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[:, :n_pad] = 0  # left padding
    return jnp.asarray(ids), jnp.asarray(mask)


def test_forward_shapes_and_dtype(model):
    config, params = model
    ids, mask = _batch(config, np.random.default_rng(0))
    logits = T.forward(params, config, ids, mask)
    assert logits.shape == (2, 16, config.vocab_size)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_position_ids_reference_convention():
    mask = jnp.asarray([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])
    pos = np.asarray(T.make_position_ids(mask))
    np.testing.assert_array_equal(pos, [[0, 0, 0, 1, 2], [0, 1, 2, 3, 4]])


def test_left_pad_invariance(model):
    """Valid-token logits must not depend on left-pad token ids."""
    config, params = model
    rng = np.random.default_rng(1)
    ids, mask = _batch(config, rng, b=1, s=12, n_pad=4)
    logits1 = T.forward(params, config, ids, mask)
    ids2 = np.asarray(ids).copy()
    ids2[:, :4] = (ids2[:, :4] + 7) % config.vocab_size  # scramble pads
    logits2 = T.forward(params, config, jnp.asarray(ids2), mask)
    if config.learned_pos_embeddings:
        # gpt2 adds pos embeds by position id; pads have pos 0 but their ids
        # still differ -> only compare valid region
        pass
    np.testing.assert_allclose(
        np.asarray(logits1)[:, 4:], np.asarray(logits2)[:, 4:], atol=2e-4
    )


def test_loss_ignore_index(model):
    config, params = model
    ids, mask = _batch(config, np.random.default_rng(2))
    logits = T.forward(params, config, ids, mask)
    labels_all_ignored = jnp.full(ids.shape, -100)
    assert float(T.causal_lm_loss(logits, labels_all_ignored)) == 0.0
    labels = jnp.where(mask == 1, ids, -100)
    loss = float(T.causal_lm_loss(logits, labels))
    assert 0.0 < loss < 3 * np.log(config.vocab_size)


def test_loss_matches_manual():
    config = tiny_test_config("llama", vocab_size=11)
    params = T.init_params(config, jax.random.PRNGKey(1))
    ids = jnp.asarray([[1, 2, 3, 4]])
    labels = jnp.asarray([[-100, 2, 3, -100]])
    logits = T.forward(params, config, ids)
    lp = jax.nn.log_softmax(np.asarray(logits, np.float64), axis=-1)
    want = -(lp[0, 0, 2] + lp[0, 1, 3]) / 2
    got = float(T.causal_lm_loss(logits, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_decode_matches_forward(model):
    """Greedy prefill+decode_step must reproduce argmax of the full forward."""
    config, params = model
    rng = np.random.default_rng(3)
    b, s_prompt, n_new, s_max = 2, 10, 5, 20
    ids, mask = _batch(config, rng, b=b, s=s_prompt, n_pad=2)

    # incremental path
    cache = T.init_kv_cache(config, b, s_max)
    logits, cache, next_pos = T.prefill(params, config, ids, mask, cache)
    toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
    cache_mask = jnp.concatenate(
        [mask, jnp.zeros((b, s_max - s_prompt), jnp.int32)], axis=1
    )
    positions = next_pos
    for step in range(1, n_new):
        widx = s_prompt + step - 1
        cache_mask = cache_mask.at[:, widx].set(1)
        logits, cache = T.decode_step(
            params, config, toks[-1], positions, widx, cache, cache_mask
        )
        positions = positions + 1
        toks.append(jnp.argmax(logits, -1).astype(jnp.int32))

    # full-forward path: append tokens one by one and argmax the last position
    full_ids, full_mask = np.asarray(ids), np.asarray(mask)
    want = []
    for _ in range(n_new):
        logits_full = T.forward(
            params, config, jnp.asarray(full_ids), jnp.asarray(full_mask)
        )
        nxt = np.asarray(jnp.argmax(logits_full[:, -1], -1)).astype(np.int32)
        want.append(nxt)
        full_ids = np.concatenate([full_ids, nxt[:, None]], axis=1)
        full_mask = np.concatenate(
            [full_mask, np.ones((b, 1), np.int32)], axis=1
        )

    got = np.stack([np.asarray(t) for t in toks])
    np.testing.assert_array_equal(got, np.stack(want))


def test_lora_zero_init_is_identity(model):
    config, params = model
    lora = lora_lib.init_lora(config, jax.random.PRNGKey(5))
    ids, mask = _batch(config, np.random.default_rng(4))
    base = T.forward(params, config, ids, mask)
    with_lora = T.forward(params, config, ids, mask, lora=lora)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora), atol=1e-6)


def test_lora_merge_matches_overlay(model):
    config, params = model
    rng = jax.random.PRNGKey(6)
    lora = lora_lib.init_lora(config, rng)
    # make B nonzero so the adapter does something
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ids, mask = _batch(config, np.random.default_rng(5))
    overlay = T.forward(params, config, ids, mask, lora=lora)
    merged = lora_lib.merge_lora(params, lora, config)
    folded = T.forward(merged, config, ids, mask)
    np.testing.assert_allclose(
        np.asarray(overlay), np.asarray(folded), atol=5e-3
    )


def test_resize_embeddings():
    config = tiny_test_config("llama", vocab_size=64)
    params = T.init_params(config, jax.random.PRNGKey(7))
    params2, config2 = T.resize_embeddings(params, config, 100)
    assert params2["embed"].shape == (100, config.hidden_size)
    assert config2.vocab_size == 100
    mean_row = np.mean(np.asarray(params["embed"], np.float32), axis=0)
    np.testing.assert_allclose(
        np.asarray(params2["embed"][64:], np.float32),
        np.tile(mean_row, (36, 1)),
        atol=1e-6,
    )
    # forward still works with new token ids
    ids = jnp.asarray([[0, 70, 99]])
    logits = T.forward(params2, config2, ids)
    assert logits.shape == (1, 3, 100)


def test_inputs_embeds_path(model):
    config, params = model
    ids, mask = _batch(config, np.random.default_rng(6))
    embeds = jnp.take(params["embed"], ids, axis=0)
    if config.embed_scale:
        pass  # _inputs_to_hidden applies the gemma scale internally
    via_ids = T.forward(params, config, ids, mask)
    via_embeds = T.forward(params, config, None, mask, inputs_embeds=embeds)
    np.testing.assert_allclose(
        np.asarray(via_ids), np.asarray(via_embeds), atol=2e-4
    )


def test_attentions_path(model):
    config, params = model
    ids, mask = _batch(config, np.random.default_rng(7), b=1, s=8, n_pad=2)
    logits, attn = T.forward(params, config, ids, mask, return_attentions=True)
    assert attn.shape == (config.num_layers, 1, config.num_heads, 8, 8)
    a = np.asarray(attn, np.float32)
    # rows over valid keys sum to 1; pad keys get ~0 weight for valid queries
    sums = a.sum(-1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-3)
    assert np.max(a[..., 2:, :2]) < 1e-6  # valid queries ignore pad keys
    # causality above the diagonal for valid (non-pad) query rows; pad query
    # rows have every key masked and produce meaningless uniform rows, like HF
    valid = a[0, 0, 0, 2:, :]
    for i in range(valid.shape[0]):
        tail = valid[i, i + 3 :]  # row i is query position i+2
        assert tail.size == 0 or np.max(tail) < 1e-6
    # fused and eager paths agree
    logits2 = T.forward(params, config, ids, mask)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(logits2), atol=2e-4
    )


def test_chunked_lm_loss_matches_dense():
    """Vocab-tiled loss == dense loss (value and trainable grads)."""
    config = tiny_test_config("llama", vocab_size=300)
    params = T.init_params(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 300, (2, 24)), jnp.int32)
    labels = jnp.where(jnp.asarray(rng.random((2, 24)) < 0.3), -100, ids)

    def dense(p):
        return T.causal_lm_loss(T.forward(p, config, ids, remat=False), labels)

    def chunked(p):
        h = T.forward(p, config, ids, remat=False, return_hidden=True)
        return T.chunked_lm_loss(p, config, h, labels, chunk=128)

    ld, gd = jax.value_and_grad(dense)(params)
    lc, gc = jax.value_and_grad(chunked)(params)
    np.testing.assert_allclose(float(ld), float(lc), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gc)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_manual_attention_vjp_matches_autodiff():
    """The grouped-attention custom VJP (bf16 gradient intermediates) must
    match XLA autodiff of the same forward within bf16 rounding."""
    from ecg_byte_tpu.ops.attention import (
        _grouped_attention, _grouped_probs,
    )

    rng = jax.random.PRNGKey(0)
    b, s, kh, g, d = 2, 64, 2, 4, 16
    qg = jax.random.normal(rng, (b, s, kh, g, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, kh, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, kh, d), jnp.float32)
    mask = jnp.asarray(np.r_[np.zeros(5), np.ones(s - 5)][None].repeat(b, 0),
                       jnp.int32)

    def ref(qg, k, v):
        p = _grouped_probs(qg, k, mask)
        return jnp.einsum("bkgqs,bskd->bqkgd", p, v).astype(jnp.float32).sum()

    def man(qg, k, v):
        return _grouped_attention(qg, k, v, mask).astype(jnp.float32).sum()

    # forward identical
    np.testing.assert_allclose(float(ref(qg, k, v)), float(man(qg, k, v)),
                               rtol=1e-6)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(qg, k, v)
    g_man = jax.grad(man, argnums=(0, 1, 2))(qg, k, v)
    for a, b_ in zip(g_ref, g_man):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(b_) / scale, np.asarray(a) / scale, atol=1.2e-2
        )


def test_fused_lm_loss_matches_dense():
    """lm_loss_from_hidden: value == causal_lm_loss(_unembed(h)); grads wrt
    hidden match autodiff within the bf16 dlogits rounding."""
    config = tiny_test_config("llama", vocab_size=96)
    params = T.init_params(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, s = 2, 12
    hidden = jnp.asarray(rng.normal(size=(b, s, config.hidden_size)),
                         jnp.float32)
    labels = rng.integers(0, 96, (b, s))
    labels[:, :5] = -100  # prompt masking
    labels = jnp.asarray(labels, jnp.int32)

    ref_val = T.causal_lm_loss(T._unembed(params, config, hidden), labels)
    got_val = T.lm_loss_from_hidden(params, config, hidden, labels)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-6)

    g_ref = jax.grad(
        lambda h: T.causal_lm_loss(T._unembed(params, config, h), labels)
    )(hidden)
    g_got = jax.grad(
        lambda h: T.lm_loss_from_hidden(params, config, h, labels)
    )(hidden)
    scale = np.abs(np.asarray(g_ref)).max() + 1e-9
    np.testing.assert_allclose(
        np.asarray(g_got) / scale, np.asarray(g_ref) / scale, atol=1.5e-2
    )
    # all-masked rows contribute nothing and produce no NaNs
    all_masked = jnp.full_like(labels, -100)
    val = T.lm_loss_from_hidden(params, config, hidden, all_masked)
    assert float(val) == 0.0


def test_fused_lm_loss_scaled_cotangent():
    """The custom CE backward must scale with the upstream cotangent (a 2x
    outer factor doubles grads), not assume gbar == 1."""
    config = tiny_test_config("llama", vocab_size=64)
    params = T.init_params(config, jax.random.PRNGKey(2))
    rng = np.random.default_rng(1)
    hidden = jnp.asarray(rng.normal(size=(1, 8, config.hidden_size)),
                         jnp.float32)
    labels = jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)
    g1 = jax.grad(lambda h: T.lm_loss_from_hidden(params, config, h, labels))(hidden)
    g2 = jax.grad(
        lambda h: 2.0 * T.lm_loss_from_hidden(params, config, h, labels)
    )(hidden)
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(g1), rtol=1e-5)


def test_lora_dropout_styles():
    """Both dropout placements: zero-rate equals no-dropout exactly; at
    nonzero rate each style perturbs ONLY the adapter contribution, and
    "input" reproduces HF PEFT's input-row masking semantics."""
    config = tiny_test_config("llama")
    params = T.init_params(config, jax.random.PRNGKey(0))
    lora = lora_lib.init_lora(config, jax.random.PRNGKey(1))
    lora = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(9), x.shape, x.dtype)
        * 0.05,
        lora,
    )
    rng = np.random.default_rng(3)
    ids, mask = _batch(config, rng)
    key = jax.random.PRNGKey(7)

    base = T.forward(params, config, ids, mask, lora=lora)
    for style in ("rank", "input"):
        cfg = config.replace(lora_dropout_style=style)
        # rate 0: dropout_rng present but inert
        z = T.forward(params, cfg.replace(lora_dropout=0.0), ids, mask,
                      lora=lora, dropout_rng=key)
        np.testing.assert_array_equal(np.asarray(z), np.asarray(base))
        # nonzero rate: output changes, stays finite, and is deterministic
        # in the rng key
        d1 = T.forward(params, cfg.replace(lora_dropout=0.5), ids, mask,
                       lora=lora, dropout_rng=key)
        d2 = T.forward(params, cfg.replace(lora_dropout=0.5), ids, mask,
                       lora=lora, dropout_rng=key)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert np.all(np.isfinite(np.asarray(d1)))
        assert not np.array_equal(np.asarray(d1), np.asarray(base)), style
    # rate 1.0 under "rank" kills the whole adapter branch: equals the
    # frozen base forward exactly
    killed = T.forward(
        params, config.replace(lora_dropout=1.0 - 1e-7), ids, mask,
        lora=jax.tree.map(jnp.zeros_like, lora), dropout_rng=key,
    )
    plain = T.forward(params, config, ids, mask)
    np.testing.assert_allclose(
        np.asarray(killed), np.asarray(plain), atol=1e-5
    )


def test_int8_kv_cache_decode_close_to_bf16():
    """The int8 serving KV cache (per-row scales, dequant folded around
    the decode-attention dots) tracks the bf16 cache: per-step logits
    stay close and greedy tokens agree on a confident model."""
    from ecg_byte_tpu.infer.decode import greedy_generate

    config = tiny_test_config("llama", vocab_size=64)
    params = T.init_params(config, jax.random.PRNGKey(2))
    rng = np.random.default_rng(8)
    b, s_prompt, s_max = 2, 12, 20
    ids, mask = _batch(config, rng, b=b, s=s_prompt, n_pad=2)

    caches = {
        "bf16": T.init_kv_cache(config, b, s_max),
        "int8": T.init_kv_cache(config, b, s_max, dtype=jnp.int8),
    }
    assert caches["int8"]["k"].dtype == jnp.int8
    assert caches["int8"]["k_scale"].shape == caches["int8"]["k"].shape[:-1]

    logits = {}
    for name in caches:
        lg, caches[name], next_pos = T.prefill(
            params, config, ids, mask, caches[name]
        )
        logits[name] = lg
    # prefill logits identical: prefill attends the fresh bf16 K/V
    np.testing.assert_allclose(
        np.asarray(logits["bf16"], np.float32),
        np.asarray(logits["int8"], np.float32),
        atol=1e-6,
    )

    cache_mask = jnp.concatenate(
        [mask, jnp.zeros((b, s_max - s_prompt), jnp.int32)], axis=1
    )
    tok = jnp.argmax(logits["bf16"], -1).astype(jnp.int32)
    positions = next_pos.astype(jnp.int32)
    for step in range(1, 5):
        widx = s_prompt + step - 1
        cache_mask = cache_mask.at[:, widx].set(1)
        new_logits = {}
        for name in caches:
            new_logits[name], caches[name] = T.decode_step(
                params, config, tok, positions, widx, caches[name],
                cache_mask,
            )
        lb = np.asarray(new_logits["bf16"], np.float32)
        li = np.asarray(new_logits["int8"], np.float32)
        # int8 rows carry ~0.4% relative error; logits are O(1)
        scale = np.maximum(np.abs(lb).max(), 1.0)
        np.testing.assert_allclose(li / scale, lb / scale, atol=0.05)
        tok = jnp.argmax(new_logits["bf16"], -1).astype(jnp.int32)
        positions = positions + 1

    # e2e generate smoke with the flag: static shapes, finite, in-vocab
    out = greedy_generate(
        params, config, ids, mask, max_new_tokens=6, int8_kv=True
    )
    out = np.asarray(out)
    assert out.shape == (b, 6)
    assert ((0 <= out) & (out < config.vocab_size)).all()


def test_quant_kv_rows_roundtrip():
    """Per-row symmetric int8: dequant error bounded by scale/2 per
    element, zero rows exact."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 3, 16)) * 3.0, jnp.float32)
    x = x.at[0, 0].set(0.0)
    q, s = T._quant_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3)
    deq = np.asarray(q, np.float32) * np.asarray(s, np.float32)[..., None]
    err = np.abs(deq - np.asarray(x))
    bound = np.asarray(s, np.float32)[..., None] * 0.51 + 1e-2
    assert (err <= bound).all()
    assert (deq[0, 0] == 0).all()
