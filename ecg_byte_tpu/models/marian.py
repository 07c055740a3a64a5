"""Functional JAX Marian encoder-decoder (opus-mt) for report translation.

Replaces the reference's torch ``AutoModelForSeq2SeqLM`` German->English
translation (/root/reference/ecg_byte/utils/preprocess_utils.py:664-713)
with a torch-free port: the last torch dependency in the package.

Architecture parity with HF ``MarianMTModel`` (oracle-tested against a
tiny random torch checkpoint in tests/test_marian.py):

  - shared embeddings scaled by sqrt(d_model), STATIC sinusoidal position
    embeddings in the Bart/Marian block layout (sin of even columns in the
    first half, cos of odd columns in the second half, no offset);
  - post-LayerNorm encoder layers (residual -> add -> LN), decoder layers
    with causal self-attention + cross-attention over the encoder output;
  - logits = hidden @ shared.T + final_logits_bias.

Greedy decode runs as ONE jitted program: encoder + cross-K/V prefill,
then a ``lax.while_loop`` over decode steps with a self-attention KV
cache — the same single-program structure as infer/decode.py, so the
offline translation pass is TPU-resident with no per-token host trips.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
_NEG_INF = -1e30


@dataclass(frozen=True)
class MarianConfig:
    vocab_size: int
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    activation: str = "swish"
    max_position_embeddings: int = 512
    pad_token_id: int = 58100
    eos_token_id: int = 0
    decoder_start_token_id: int = 58100
    scale_embedding: bool = True

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


def config_from_hf(hf: dict) -> MarianConfig:
    return MarianConfig(
        vocab_size=hf["vocab_size"],
        d_model=hf.get("d_model", 512),
        encoder_layers=hf.get("encoder_layers", 6),
        decoder_layers=hf.get("decoder_layers", 6),
        num_heads=hf.get("encoder_attention_heads", 8),
        ffn_dim=hf.get("encoder_ffn_dim", 2048),
        activation=hf.get("activation_function", "swish"),
        max_position_embeddings=hf.get("max_position_embeddings", 512),
        pad_token_id=hf.get("pad_token_id", 58100),
        eos_token_id=hf.get("eos_token_id", 0),
        decoder_start_token_id=hf.get(
            "decoder_start_token_id", hf.get("pad_token_id", 58100)
        ),
        scale_embedding=hf.get("scale_embedding", True),
    )


def sinusoidal_positions(n_pos: int, dim: int) -> np.ndarray:
    """MarianSinusoidalPositionalEmbedding weight: sin block then cos block."""
    pos = np.arange(n_pos, dtype=np.float64)[:, None]
    j = np.arange(dim, dtype=np.float64)[None, :]
    enc = pos / np.power(10000.0, 2.0 * (j // 2) / dim)
    out = np.zeros((n_pos, dim), np.float32)
    half = dim // 2
    out[:, :half] = np.sin(enc[:, 0::2])
    out[:, half:] = np.cos(enc[:, 1::2])
    return out


def _act(x, kind: str):
    if kind in ("swish", "silu"):
        return jax.nn.silu(x)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind in ("gelu", "gelu_new"):
        return jax.nn.gelu(x, approximate=(kind == "gelu_new"))
    raise NotImplementedError(f"activation {kind!r}")


def _ln(x, p):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["w"] + p["b"]).astype(x.dtype)


def _dense(x, p):
    return x @ p["w"] + p["b"]


def _split_heads(x, n_heads):
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads)


def _attention(q, k, v, bias):
    """q (B,Sq,H,D), k/v (B,Sk,H,D), bias broadcastable to (B,H,Sq,Sk)."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (d**-0.5), k)
    logits = logits.astype(jnp.float32) + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    b, s, h, dd = out.shape
    return out.reshape(b, s, h * dd)


def _mha(x, kv, p, n_heads, bias):
    q = _split_heads(_dense(x, p["q"]), n_heads)
    k = _split_heads(_dense(kv, p["k"]), n_heads)
    v = _split_heads(_dense(kv, p["v"]), n_heads)
    return _dense(_attention(q, k, v, bias), p["o"])


def _ffn(x, p, activation):
    return _dense(_act(_dense(x, p["fc1"]), activation), p["fc2"])


def _embed(params, config: MarianConfig, ids, pos_start=0):
    h = jnp.take(params["shared"], ids, axis=0)
    if config.scale_embedding:
        h = h * np.sqrt(config.d_model).astype(np.float32)
    s = ids.shape[1]
    pos = params["positions"][pos_start : pos_start + s]
    return h + pos[None]


def encode(params: Params, config: MarianConfig, src_ids, src_mask):
    """Encoder forward -> (B, S, D) hidden states."""
    h = _embed(params, config, src_ids)
    key_ok = src_mask[:, None, None, :].astype(jnp.bool_)
    bias = jnp.where(key_ok, 0.0, _NEG_INF)
    for layer in params["encoder"]:
        h = _ln(h + _mha(h, h, layer["self"], config.num_heads, bias),
                layer["self_ln"])
        h = _ln(h + _ffn(h, layer, config.activation), layer["final_ln"])
    return h


def _decoder_layer(h, layer, config, self_bias, cross_kv, cross_bias,
                   self_kv=None):
    """One decoder layer.  ``self_kv=(k, v)`` are the (possibly cached)
    self-attention keys/values aligned with ``self_bias``."""
    n = config.num_heads
    q = _split_heads(_dense(h, layer["self"]["q"]), n)
    if self_kv is None:
        k = _split_heads(_dense(h, layer["self"]["k"]), n)
        v = _split_heads(_dense(h, layer["self"]["v"]), n)
    else:
        k, v = self_kv
    attn = _dense(_attention(q, k, v, self_bias), layer["self"]["o"])
    h = _ln(h + attn, layer["self_ln"])
    ck, cv = cross_kv
    q = _split_heads(_dense(h, layer["cross"]["q"]), n)
    cross = _dense(_attention(q, ck, cv, cross_bias), layer["cross"]["o"])
    h = _ln(h + cross, layer["cross_ln"])
    h = _ln(h + _ffn(h, layer, config.activation), layer["final_ln"])
    return h


def _cross_kv(params, config, enc_h):
    return [
        (
            _split_heads(_dense(enc_h, layer["cross"]["k"]), config.num_heads),
            _split_heads(_dense(enc_h, layer["cross"]["v"]), config.num_heads),
        )
        for layer in params["decoder"]
    ]


def forward(params: Params, config: MarianConfig, src_ids, src_mask,
            tgt_ids):
    """Teacher-forced seq2seq forward -> f32 logits (B, St, V)."""
    enc_h = encode(params, config, src_ids, src_mask)
    cross_bias = jnp.where(
        src_mask[:, None, None, :].astype(jnp.bool_), 0.0, _NEG_INF
    )
    st = tgt_ids.shape[1]
    causal = jnp.tril(jnp.ones((st, st), jnp.bool_))
    self_bias = jnp.where(causal[None, None], 0.0, _NEG_INF)
    h = _embed(params, config, tgt_ids)
    kvs = _cross_kv(params, config, enc_h)
    for layer, ckv in zip(params["decoder"], kvs):
        h = _decoder_layer(h, layer, config, self_bias, ckv, cross_bias)
    logits = h @ params["shared"].T + params["final_logits_bias"]
    return logits.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "max_length"))
def _greedy_impl(params, config: MarianConfig, src_ids, src_mask,
                 max_length: int):
    b = src_ids.shape[0]
    enc_h = encode(params, config, src_ids, src_mask)
    cross_bias = jnp.where(
        src_mask[:, None, None, :].astype(jnp.bool_), 0.0, _NEG_INF
    )
    kvs = _cross_kv(params, config, enc_h)
    L = config.decoder_layers
    hd, nh = config.head_dim, config.num_heads
    k_cache = jnp.zeros((L, b, max_length, nh, hd), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    tokens = jnp.full((b, max_length), config.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(config.decoder_start_token_id)
    done = jnp.zeros((b,), jnp.bool_)

    def step_logits(tok, pos, k_cache, v_cache):
        # static positions: gather the position row dynamically
        h = (
            jnp.take(params["shared"], tok[:, None], axis=0)
            * (np.sqrt(config.d_model).astype(np.float32)
               if config.scale_embedding else 1.0)
            + jax.lax.dynamic_slice_in_dim(
                params["positions"], pos, 1, axis=0
            )[None]
        )
        valid = jnp.arange(max_length)[None, :] <= pos  # (1, max_len)
        self_bias = jnp.where(valid[:, None, None, :], 0.0, _NEG_INF)
        new_k, new_v = k_cache, v_cache
        for li, (layer, ckv) in enumerate(zip(params["decoder"], kvs)):
            k_step = _split_heads(_dense(h, layer["self"]["k"]), nh)
            v_step = _split_heads(_dense(h, layer["self"]["v"]), nh)
            new_k = jax.lax.dynamic_update_slice(
                new_k, k_step[None].astype(new_k.dtype), (li, 0, pos, 0, 0)
            )
            new_v = jax.lax.dynamic_update_slice(
                new_v, v_step[None].astype(new_v.dtype), (li, 0, pos, 0, 0)
            )
            h = _decoder_layer(
                h, layer, config, self_bias, ckv, cross_bias,
                self_kv=(new_k[li], new_v[li]),
            )
        logits = (h[:, 0] @ params["shared"].T + params["final_logits_bias"])
        return logits.astype(jnp.float32), new_k, new_v

    def cond(state):
        i, tokens, done, _, _ = state
        return (i < max_length - 1) & ~jnp.all(done)

    def body(state):
        i, tokens, done, k_cache, v_cache = state
        logits, k_cache, v_cache = step_logits(
            tokens[:, i], i, k_cache, v_cache
        )
        # HF Marian masks the pad token out of generation (bad_words_ids)
        logits = logits.at[:, config.pad_token_id].set(-jnp.inf)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, config.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
        done = done | (nxt == config.eos_token_id)
        return (i + 1, tokens, done, k_cache, v_cache)

    _, tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, done, k_cache, v_cache)
    )
    return tokens


def greedy_generate(params: Params, config: MarianConfig, src_ids, src_mask,
                    max_length: int = 128):
    """HF ``generate(max_length=..., num_beams=1)`` semantics: start at
    ``decoder_start_token_id``, greedy argmax with the pad token banned,
    per-row stop at eos, output includes the start token (HF keeps it)."""
    return _greedy_impl(
        params, config, jnp.asarray(src_ids, jnp.int32),
        jnp.asarray(src_mask, jnp.int32), max_length,
    )


# ---------------------------------------------------------------------------
# HF checkpoint ingestion


def _t(x):
    return jnp.asarray(np.asarray(x), jnp.float32)


def load_hf_marian(model_dir: str) -> Tuple[Params, MarianConfig]:
    """Load a local HF MarianMT checkpoint (safetensors or pytorch_model.bin
    is NOT supported — safetensors only, matching models/hf_loader.py)."""
    from ecg_byte_tpu.models.hf_loader import _load_safetensors

    with open(os.path.join(model_dir, "config.json")) as f:
        config = config_from_hf(json.load(f))
    t = _load_safetensors(model_dir)

    def g(name):
        for k in (name, f"model.{name}"):
            if k in t:
                return t[k]
        raise KeyError(name)

    def dense(prefix):
        return {
            "w": _t(g(f"{prefix}.weight")).T,
            "b": _t(g(f"{prefix}.bias")),
        }

    def ln(prefix):
        return {"w": _t(g(f"{prefix}.weight")), "b": _t(g(f"{prefix}.bias"))}

    def enc_layer(i):
        p = f"encoder.layers.{i}"
        return {
            "self": {
                "q": dense(f"{p}.self_attn.q_proj"),
                "k": dense(f"{p}.self_attn.k_proj"),
                "v": dense(f"{p}.self_attn.v_proj"),
                "o": dense(f"{p}.self_attn.out_proj"),
            },
            "self_ln": ln(f"{p}.self_attn_layer_norm"),
            "fc1": dense(f"{p}.fc1"),
            "fc2": dense(f"{p}.fc2"),
            "final_ln": ln(f"{p}.final_layer_norm"),
        }

    def dec_layer(i):
        p = f"decoder.layers.{i}"
        return {
            "self": {
                "q": dense(f"{p}.self_attn.q_proj"),
                "k": dense(f"{p}.self_attn.k_proj"),
                "v": dense(f"{p}.self_attn.v_proj"),
                "o": dense(f"{p}.self_attn.out_proj"),
            },
            "self_ln": ln(f"{p}.self_attn_layer_norm"),
            "cross": {
                "q": dense(f"{p}.encoder_attn.q_proj"),
                "k": dense(f"{p}.encoder_attn.k_proj"),
                "v": dense(f"{p}.encoder_attn.v_proj"),
                "o": dense(f"{p}.encoder_attn.out_proj"),
            },
            "cross_ln": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1": dense(f"{p}.fc1"),
            "fc2": dense(f"{p}.fc2"),
            "final_ln": ln(f"{p}.final_layer_norm"),
        }

    try:
        bias = _t(g("final_logits_bias")).reshape(-1)
    except KeyError:
        bias = jnp.zeros((config.vocab_size,), jnp.float32)

    params: Params = {
        "shared": _t(g("shared.weight")),
        "positions": jnp.asarray(
            sinusoidal_positions(config.max_position_embeddings, config.d_model)
        ),
        "encoder": [enc_layer(i) for i in range(config.encoder_layers)],
        "decoder": [dec_layer(i) for i in range(config.decoder_layers)],
        "final_logits_bias": bias,
    }
    return params, config
