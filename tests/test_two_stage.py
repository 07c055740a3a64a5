"""Two-stage stack: ResNet1d, attention pool, MERL loss, ViT/CLIP, fusion
splicing (adapt_sequence parity with a per-row reference implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.models import encoders as enc
from ecg_byte_tpu.models import fusion as fus
from ecg_byte_tpu.models import resnet1d, vision
from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.models import transformer as T


def test_resnet_shapes_and_bn_state():
    rng = jax.random.PRNGKey(0)
    p, s, meta = resnet1d.init_resnet(rng, "resnet18")
    assert meta["out_channels"] == 512
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12, 256)), jnp.float32)
    y, new_s = resnet1d.resnet_forward(p, s, meta, x, train=True)
    assert y.shape == (2, 512, 256 // 16)
    # bn running stats updated in train mode
    assert not np.allclose(
        np.asarray(new_s["stem_bn"]["mean"]), np.asarray(s["stem_bn"]["mean"])
    )
    # eval mode: state unchanged, deterministic
    y2, same_s = resnet1d.resnet_forward(p, s, meta, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(same_s["stem_bn"]["mean"]), np.asarray(s["stem_bn"]["mean"])
    )


def test_resnet_bottleneck_channels():
    p, s, meta = resnet1d.init_resnet(jax.random.PRNGKey(0), "resnet50")
    assert meta["out_channels"] == 2048


def test_resnet_bf16_compute_parity():
    """bf16-MXU conv path (f32 accumulation, f32 BN) tracks the f32 path
    closely enough for contrastive pretraining; gradients flow."""
    p, s, meta = resnet1d.init_resnet(jax.random.PRNGKey(0), "resnet18")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, 256)), jnp.float32)
    y32, st32 = resnet1d.resnet_forward(p, s, meta, x, train=True)
    y16, st16 = resnet1d.resnet_forward(
        p, s, meta, x, train=True, compute_dtype=jnp.bfloat16
    )
    assert y16.dtype == jnp.float32  # accumulation/output stays f32
    a32, a16 = np.asarray(y32), np.asarray(y16)
    denom = np.abs(a32).mean() + 1e-6
    assert np.abs(a16 - a32).mean() / denom < 0.05
    # BN running stats computed from the f32-accumulated activations agree
    m32 = np.asarray(st32["stem_bn"]["mean"])
    m16 = np.asarray(st16["stem_bn"]["mean"])
    np.testing.assert_allclose(m16, m32, rtol=0.05, atol=1e-3)

    def loss(p):
        y, _ = resnet1d.resnet_forward(
            p, s, meta, x, train=True, compute_dtype=jnp.bfloat16
        )
        return jnp.mean(jnp.square(y))

    g = jax.grad(loss)(p)
    gnorm = float(
        sum(jnp.sum(jnp.square(v)) for v in jax.tree_util.tree_leaves(g))
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_attention_pool():
    rng = jax.random.PRNGKey(1)
    p = enc.init_attention_pool(rng, spacial_dim=8, embed_dim=32, num_heads=4)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 32, 8)), jnp.float32)
    pooled, att = enc.attention_pool(p, x)
    assert pooled.shape == (3, 32)
    assert att.shape == (3, 8)
    # cls self-weight is dropped (merl.py:31): rows sum to slightly < 1
    sums = np.asarray(att).sum(-1)
    assert np.all(sums > 0.5) and np.all(sums < 1.0)


def test_clip_loss_perfect_alignment():
    x = jnp.eye(8, 16)
    loss_aligned, acc1, _ = enc.clip_loss(x, x)
    y = jnp.roll(x, 1, axis=0)
    loss_shuffled, _, _ = enc.clip_loss(x, y)
    assert float(loss_aligned) < float(loss_shuffled)
    assert float(acc1) == 100.0


def test_merl_pretrain_loss_trains():
    import optax

    rng = jax.random.PRNGKey(2)
    p, s, meta = resnet1d.init_resnet(rng, "resnet18")
    head = enc.init_merl_head(
        jax.random.PRNGKey(3), feature_channels=512, spacial_dim=8
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 12, 128)), jnp.float32)
    text = jnp.asarray(np.random.default_rng(3).normal(size=(8, 768)), jnp.float32)

    params = {"resnet": p, "head": head}
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, bn):
        def loss_fn(pp):
            feats, new_bn = resnet1d.resnet_forward(
                pp["resnet"], bn, meta, x, train=True
            )
            loss, _ = enc.merl_pretrain_loss(pp["head"], feats, text)
            return loss, new_bn
        (loss, new_bn), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, state = opt.update(g, state)
        return optax.apply_updates(params, up), state, new_bn, loss

    bn = s
    losses = []
    for _ in range(8):
        params, state, bn, loss = step(params, state, bn)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_vit_mim_loss_and_hidden_states():
    cfg = vision.tiny_vision_config()
    p = vision.init_vit(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.normal(size=(2, 3, 32, 32)), jnp.float32)
    mask = jnp.asarray(rng.random((2, cfg.num_patches)) < 0.75)
    loss = vision.vit_mim_loss(p, cfg, pixels, mask)
    assert np.isfinite(float(loss))
    seq, hiddens = vision.vit_encode(p, cfg, pixels, mask, collect_hidden=True)
    assert seq.shape == (2, cfg.num_patches + 1, cfg.hidden_size)
    assert len(hiddens) == cfg.num_layers + 1  # embeddings + each layer


def test_clip_forward_contrastive():
    cfg = vision.tiny_clip_config()
    p = vision.init_clip(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, 300, size=(4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)
    pixels = jnp.asarray(rng.normal(size=(4, 3, 32, 32)), jnp.float32)
    out = vision.clip_forward(p, cfg, ids, mask, pixels, return_loss=True)
    assert out["image_embeds"].shape == (4, cfg.projection_dim)
    assert out["text_embeds"].shape == (4, cfg.projection_dim)
    assert np.isfinite(float(out["loss"]))


def reference_adapt_sequence(sig_embed, text_embed, token_ids, attn_mask,
                             labels=None, position_ids=None, sig_id=-1):
    """Per-row Python reimplementation of model_utils.py:96-157 semantics."""
    add_idx = 2 if labels is not None else 1
    combined, masks, labs, poss = [], [], [], []
    for b in range(token_ids.shape[0]):
        idx = int(np.nonzero(token_ids[b] == sig_id)[0][0])
        emb = np.concatenate([
            text_embed[b, : idx + 1], sig_embed[b], text_embed[b, idx + add_idx:]
        ])
        m = np.concatenate([attn_mask[b, : idx + 1], [1], attn_mask[b, idx + add_idx:]])
        combined.append(emb)
        masks.append(m)
        if labels is not None:
            l = np.concatenate([labels[b, : idx + 1], [-100], labels[b, idx + add_idx:]])
            before = position_ids[b, : idx + 1]
            new_pos = before[-1] + 1
            after = position_ids[b, idx + add_idx:] + 1
            poss.append(np.concatenate([before, [new_pos], after]))
            labs.append(l)
    out = {"combined_embeds": np.stack(combined), "attn_mask": np.stack(masks)}
    if labels is not None:
        out["labels"] = np.stack(labs)
        out["position_ids"] = np.stack(poss)
    return out


@pytest.mark.parametrize("with_labels", [True, False])
def test_adapt_sequence_matches_reference(with_labels):
    rng = np.random.default_rng(6)
    b, s, d = 3, 10, 4
    sig_id = 99
    token_ids = rng.integers(0, 50, size=(b, s))
    pos = rng.integers(2, 7, size=b)
    for i in range(b):
        token_ids[i, pos[i]] = sig_id
    text_embed = rng.normal(size=(b, s, d)).astype(np.float32)
    sig_embed = rng.normal(size=(b, 1, d)).astype(np.float32)
    attn_mask = np.ones((b, s), np.int64)
    labels = rng.integers(0, 50, size=(b, s)) if with_labels else None
    position_ids = np.tile(np.arange(s), (b, 1)) if with_labels else None

    want = reference_adapt_sequence(
        sig_embed, text_embed, token_ids, attn_mask, labels, position_ids, sig_id
    )
    got = fus.adapt_sequence(
        jnp.asarray(sig_embed), jnp.asarray(text_embed), jnp.asarray(token_ids),
        jnp.asarray(attn_mask),
        jnp.asarray(labels) if with_labels else None,
        jnp.asarray(position_ids) if with_labels else None,
        sig_id=sig_id,
    )
    np.testing.assert_allclose(
        np.asarray(got["combined_embeds"]), want["combined_embeds"], atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got["attn_mask"]), want["attn_mask"])
    if with_labels:
        np.testing.assert_array_equal(np.asarray(got["labels"]), want["labels"])
        np.testing.assert_array_equal(
            np.asarray(got["position_ids"]), want["position_ids"]
        )


def test_fusion_loss_and_generate_resnet():
    llm_config = tiny_test_config("llama", vocab_size=128)
    llm_params = T.init_params(llm_config, jax.random.PRNGKey(7))
    rp, rs, meta = resnet1d.init_resnet(jax.random.PRNGKey(8), "resnet18")
    fusion = fus.init_fusion(
        jax.random.PRNGKey(9), "resnet_model", llm_config.hidden_size,
        resnet_channels=512,
    )
    encoders = {"resnet": (rp, rs, meta)}
    rng = np.random.default_rng(7)
    b, s = 2, 12
    sig_id = 120
    ids = rng.integers(0, 100, size=(b, s))
    ids[:, 2] = sig_id
    batch = {
        "tokenized_signal": jnp.asarray(ids, jnp.int32),
        "attn_mask": jnp.ones((b, s), jnp.int32),
        "quantized_signal_ids_input": jnp.asarray(ids, jnp.int32),
        "position_ids": jnp.tile(jnp.arange(s), (b, 1)),
        "norm_signal": jnp.asarray(rng.normal(size=(b, 12, 128)), jnp.float32),
    }
    loss = fus.fusion_lm_loss(
        llm_params, llm_config, fusion, "resnet_model", batch, sig_id,
        encoders=encoders,
    )
    assert np.isfinite(float(loss))
    # gradient flows to fusion but not through the frozen resnet
    g = jax.grad(
        lambda f: fus.fusion_lm_loss(
            llm_params, llm_config, f, "resnet_model", batch, sig_id,
            encoders=encoders,
        )
    )(fusion)
    assert float(jnp.abs(g["image_projection"]["w"]).sum()) > 0

    gen_batch = {
        "tokenized_signal2": batch["tokenized_signal"],
        "attn_mask2": batch["attn_mask"],
        "norm_signal": batch["norm_signal"],
    }
    out = fus.fusion_generate(
        llm_params, llm_config, fusion, "resnet_model", gen_batch, sig_id,
        encoders=encoders, max_new_tokens=4, eos_token_id=-5, pad_token_id=0,
    )
    assert out.shape == (b, 4)


def test_bert_encoder_forward_and_loader(tmp_path):
    """Functional BERT: forward shapes, pooler, HF checkpoint round-trip."""
    import json
    from safetensors.numpy import save_file
    from ecg_byte_tpu.models import bert as B

    cfg = B.tiny_bert_config()
    params = B.init_bert(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    hidden, pooled = B.bert_forward(params, cfg, ids, mask)
    assert hidden.shape == (2, 10, 32) and pooled.shape == (2, 32)
    assert np.all(np.abs(np.asarray(pooled)) <= 1.0)  # tanh pooler

    # craft an HF-layout checkpoint and load it back
    rng = np.random.default_rng(1)
    hf_cfg = {"vocab_size": 128, "hidden_size": 32, "num_hidden_layers": 2,
              "num_attention_heads": 4, "intermediate_size": 64,
              "max_position_embeddings": 64, "type_vocab_size": 2,
              "layer_norm_eps": 1e-12}
    json.dump(hf_cfg, open(tmp_path / "config.json", "w"))
    t = {
        "embeddings.word_embeddings.weight": rng.normal(size=(128, 32)),
        "embeddings.position_embeddings.weight": rng.normal(size=(64, 32)),
        "embeddings.token_type_embeddings.weight": rng.normal(size=(2, 32)),
        "embeddings.LayerNorm.weight": np.ones(32),
        "embeddings.LayerNorm.bias": np.zeros(32),
        "pooler.dense.weight": rng.normal(size=(32, 32)),
        "pooler.dense.bias": np.zeros(32),
    }
    for i in range(2):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = rng.normal(size=(32, 32))
            t[p + f"attention.self.{nm}.bias"] = np.zeros(32)
        t[p + "attention.output.dense.weight"] = rng.normal(size=(32, 32))
        t[p + "attention.output.dense.bias"] = np.zeros(32)
        t[p + "attention.output.LayerNorm.weight"] = np.ones(32)
        t[p + "attention.output.LayerNorm.bias"] = np.zeros(32)
        t[p + "intermediate.dense.weight"] = rng.normal(size=(64, 32))
        t[p + "intermediate.dense.bias"] = np.zeros(64)
        t[p + "output.dense.weight"] = rng.normal(size=(32, 64))
        t[p + "output.dense.bias"] = np.zeros(32)
        t[p + "output.LayerNorm.weight"] = np.ones(32)
        t[p + "output.LayerNorm.bias"] = np.zeros(32)
    t = {k: (np.asarray(v) * 0.05).astype(np.float32) for k, v in t.items()}
    save_file(t, str(tmp_path / "model.safetensors"))
    params2, cfg2 = B.load_hf_bert(str(tmp_path))
    enc = B.JaxBertTextEncoder(params2, cfg2)
    emb = enc(np.asarray(ids), np.asarray(mask))
    assert emb.shape == (2, 32)
    assert np.all(np.isfinite(emb))
    # deterministic (frozen)
    np.testing.assert_array_equal(emb, enc(np.asarray(ids), np.asarray(mask)))
