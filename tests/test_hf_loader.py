"""HF checkpoint ingestion: craft tiny HF-layout checkpoints on disk and
verify config mapping, weight orientation, and a working forward pass."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from ecg_byte_tpu.models import transformer as T
from ecg_byte_tpu.models.hf_loader import config_from_hf, load_hf_checkpoint


def _write_llama_ckpt(d, vocab=64, hidden=32, layers=2, heads=4, kv=2, inter=48):
    cfg = {
        "model_type": "llama",
        "vocab_size": vocab,
        "hidden_size": hidden,
        "num_hidden_layers": layers,
        "num_attention_heads": heads,
        "num_key_value_heads": kv,
        "head_dim": hidden // heads,
        "intermediate_size": inter,
        "max_position_embeddings": 128,
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,
    }
    json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
    rng = np.random.default_rng(0)
    hd = hidden // heads
    t = {"model.embed_tokens.weight": rng.normal(size=(vocab, hidden)),
         "model.norm.weight": np.ones(hidden)}
    for i in range(layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(hidden)
        t[p + "post_attention_layernorm.weight"] = np.ones(hidden)
        t[p + "self_attn.q_proj.weight"] = rng.normal(size=(heads * hd, hidden))
        t[p + "self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, hidden))
        t[p + "self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, hidden))
        t[p + "self_attn.o_proj.weight"] = rng.normal(size=(hidden, heads * hd))
        t[p + "mlp.gate_proj.weight"] = rng.normal(size=(inter, hidden))
        t[p + "mlp.up_proj.weight"] = rng.normal(size=(inter, hidden))
        t[p + "mlp.down_proj.weight"] = rng.normal(size=(hidden, inter))
    t = {k: (v * 0.05).astype(np.float32) for k, v in t.items()}
    save_file(t, os.path.join(d, "model.safetensors"))
    return t


def _write_gpt2_ckpt(d, vocab=64, hidden=32, layers=2, heads=4):
    cfg = {
        "model_type": "gpt2",
        "vocab_size": vocab,
        "n_embd": hidden,
        "n_layer": layers,
        "n_head": heads,
        "n_positions": 128,
        "n_inner": None,
        "layer_norm_epsilon": 1e-5,
    }
    json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
    rng = np.random.default_rng(1)
    inner = 4 * hidden
    t = {
        "wte.weight": rng.normal(size=(vocab, hidden)),
        "wpe.weight": rng.normal(size=(128, hidden)),
        "ln_f.weight": np.ones(hidden), "ln_f.bias": np.zeros(hidden),
    }
    for i in range(layers):
        p = f"h.{i}."
        t[p + "ln_1.weight"] = np.ones(hidden); t[p + "ln_1.bias"] = np.zeros(hidden)
        t[p + "ln_2.weight"] = np.ones(hidden); t[p + "ln_2.bias"] = np.zeros(hidden)
        t[p + "attn.c_attn.weight"] = rng.normal(size=(hidden, 3 * hidden))
        t[p + "attn.c_attn.bias"] = np.zeros(3 * hidden)
        t[p + "attn.c_proj.weight"] = rng.normal(size=(hidden, hidden))
        t[p + "attn.c_proj.bias"] = np.zeros(hidden)
        t[p + "mlp.c_fc.weight"] = rng.normal(size=(hidden, inner))
        t[p + "mlp.c_fc.bias"] = np.zeros(inner)
        t[p + "mlp.c_proj.weight"] = rng.normal(size=(inner, hidden))
        t[p + "mlp.c_proj.bias"] = np.zeros(hidden)
    t = {k: (np.asarray(v) * 0.05).astype(np.float32) for k, v in t.items()}
    save_file(t, os.path.join(d, "model.safetensors"))
    return t


def test_llama_config_and_weights(tmp_path):
    tensors = _write_llama_ckpt(str(tmp_path))
    config = config_from_hf(str(tmp_path))
    assert config.arch == "llama" and config.num_kv_heads == 2
    params, config = load_hf_checkpoint(str(tmp_path), dtype="float32")
    # orientation: our kernel[in, out] == HF weight[out, in].T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["q_proj"]["kernel"][0]),
        tensors["model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["embed"]), tensors["model.embed_tokens.weight"], rtol=1e-6
    )
    logits = T.forward(params, config, jnp.asarray([[1, 2, 3]]))
    assert logits.shape == (1, 3, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_gpt2_config_and_weights(tmp_path):
    tensors = _write_gpt2_ckpt(str(tmp_path))
    params, config = load_hf_checkpoint(str(tmp_path), dtype="float32")
    assert config.arch == "gpt2" and config.use_bias
    # Conv1D already [in, out]; q is the first third of c_attn
    np.testing.assert_allclose(
        np.asarray(params["layers"]["q_proj"]["kernel"][0]),
        tensors["h.0.attn.c_attn.weight"][:, :32],
        rtol=1e-6,
    )
    logits = T.forward(params, config, jnp.asarray([[1, 2, 3]]))
    assert logits.shape == (1, 3, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_resize_after_load(tmp_path):
    _write_llama_ckpt(str(tmp_path))
    params, config = load_hf_checkpoint(str(tmp_path), dtype="float32")
    params, config = T.resize_embeddings(params, config, 100)
    logits = T.forward(params, config, jnp.asarray([[99]]))
    assert logits.shape == (1, 1, 100)
