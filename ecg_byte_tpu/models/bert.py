"""Functional BERT encoder (MedCPT-compatible) for the MERL text branch.

The reference pairs the MERL ResNet with a frozen ``ncbi/MedCPT-Query-
Encoder`` BERT whose ``pooler_output`` feeds the contrastive projection
(merl.py:197-201; pretrain.py:146-151).  Note the reference wraps the text
encoder in ``no_grad`` (merl.py:197), so despite freezing only layers 0-8
the text tower never receives gradients — a fully frozen encoder matches
its actual training behavior.

This is a standard post-LN BERT: word+position+type embeddings with
LayerNorm, encoder blocks (x = LN(x + attn); x = LN(x + mlp)), and a tanh
pooler over [CLS].  Weights load from a local HF checkpoint
(``bert.embeddings...`` / ``embeddings...`` naming both handled).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.ops.attention import full_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    norm_eps: float = 1e-12


def tiny_bert_config() -> BertConfig:
    return BertConfig(vocab_size=128, hidden_size=32, num_layers=2,
                      num_heads=4, intermediate_size=64,
                      max_position_embeddings=64)


def init_bert(rng, config: BertConfig) -> Params:
    c = config
    ks = jax.random.split(rng, 12)

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.float32) * 0.02

    L = c.num_layers
    return {
        "word_embed": dense(ks[0], (c.vocab_size, c.hidden_size)),
        "pos_embed": dense(ks[1], (c.max_position_embeddings, c.hidden_size)),
        "type_embed": dense(ks[2], (c.type_vocab_size, c.hidden_size)),
        "embed_ln": jnp.ones((c.hidden_size,)),
        "embed_ln_b": jnp.zeros((c.hidden_size,)),
        "layers": {
            "qkv": dense(ks[3], (L, c.hidden_size, 3 * c.hidden_size)),
            "qkv_b": jnp.zeros((L, 3 * c.hidden_size)),
            "out": dense(ks[4], (L, c.hidden_size, c.hidden_size)),
            "out_b": jnp.zeros((L, c.hidden_size)),
            "attn_ln": jnp.ones((L, c.hidden_size)),
            "attn_ln_b": jnp.zeros((L, c.hidden_size)),
            "fc1": dense(ks[5], (L, c.hidden_size, c.intermediate_size)),
            "fc1_b": jnp.zeros((L, c.intermediate_size)),
            "fc2": dense(ks[6], (L, c.intermediate_size, c.hidden_size)),
            "fc2_b": jnp.zeros((L, c.hidden_size)),
            "mlp_ln": jnp.ones((L, c.hidden_size)),
            "mlp_ln_b": jnp.zeros((L, c.hidden_size)),
        },
        "pooler_w": dense(ks[7], (c.hidden_size, c.hidden_size)),
        "pooler_b": jnp.zeros((c.hidden_size,)),
    }


def _ln(x, w, b, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def bert_forward(
    params: Params,
    config: BertConfig,
    input_ids: jax.Array,
    attention_mask: Optional[jax.Array] = None,
    *,
    return_all_layers: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (last_hidden (B, S, H), pooler_output (B, H)).

    ``return_all_layers=True`` returns ((L+1, B, S, H) stacked hidden
    states incl. the embedding output, pooler_output) — BERTScore picks an
    intermediate layer (utils/bertscore.py).
    """
    c = config
    b, s = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, s), jnp.int32)
    pos = jnp.arange(s)
    x = (
        jnp.take(params["word_embed"], input_ids, axis=0)
        + params["pos_embed"][pos][None]
        + params["type_embed"][0][None, None]
    )
    x = _ln(x, params["embed_ln"], params["embed_ln_b"], c.norm_eps)

    def layer(x, lp):
        qkv = x @ lp["qkv"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = c.hidden_size // c.num_heads
        q = q.reshape(b, s, c.num_heads, d)
        k = k.reshape(b, s, c.num_heads, d)
        v = v.reshape(b, s, c.num_heads, d)
        attn, _ = full_attention(q, k, v, attention_mask)
        attn = attn.reshape(b, s, c.hidden_size)
        x = _ln(x + attn @ lp["out"] + lp["out_b"],
                lp["attn_ln"], lp["attn_ln_b"], c.norm_eps)
        h = jax.nn.gelu(x @ lp["fc1"] + lp["fc1_b"], approximate=False)
        x = _ln(x + h @ lp["fc2"] + lp["fc2_b"],
                lp["mlp_ln"], lp["mlp_ln_b"], c.norm_eps)
        return x, (x if return_all_layers else None)

    embed_out = x
    x, layer_outs = jax.lax.scan(layer, x, params["layers"])
    pooled = jnp.tanh(x[:, 0] @ params["pooler_w"] + params["pooler_b"])
    if return_all_layers:
        all_states = jnp.concatenate([embed_out[None], layer_outs], axis=0)
        return all_states, pooled
    return x, pooled


def load_hf_bert(model_dir: str) -> Tuple[Params, BertConfig]:
    """Load a local HF BERT checkpoint (e.g. MedCPT-Query-Encoder)."""
    import json
    import os

    from ecg_byte_tpu.models.hf_loader import _load_safetensors

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    config = BertConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf["max_position_embeddings"],
        type_vocab_size=hf.get("type_vocab_size", 2),
        norm_eps=hf.get("layer_norm_eps", 1e-12),
    )
    t = _load_safetensors(model_dir)

    def g(key):
        return t.get(key, t.get("bert." + key))

    L = config.num_layers

    def stack(fmt, transpose=False):
        mats = []
        for i in range(L):
            w = g(fmt.format(i=i))
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), jnp.float32)

    def stack_qkv(bias):
        mats = []
        for i in range(L):
            parts = []
            for name in ("query", "key", "value"):
                key = f"encoder.layer.{i}.attention.self.{name}." + (
                    "bias" if bias else "weight"
                )
                w = g(key)
                parts.append(w if bias else w.T)
            mats.append(np.concatenate(parts, axis=-1))
        return jnp.asarray(np.stack(mats), jnp.float32)

    params = {
        "word_embed": jnp.asarray(g("embeddings.word_embeddings.weight"), jnp.float32),
        "pos_embed": jnp.asarray(g("embeddings.position_embeddings.weight"), jnp.float32),
        "type_embed": jnp.asarray(g("embeddings.token_type_embeddings.weight"), jnp.float32),
        "embed_ln": jnp.asarray(g("embeddings.LayerNorm.weight"), jnp.float32),
        "embed_ln_b": jnp.asarray(g("embeddings.LayerNorm.bias"), jnp.float32),
        "layers": {
            "qkv": stack_qkv(False),
            "qkv_b": stack_qkv(True),
            "out": stack("encoder.layer.{i}.attention.output.dense.weight", True),
            "out_b": stack("encoder.layer.{i}.attention.output.dense.bias"),
            "attn_ln": stack("encoder.layer.{i}.attention.output.LayerNorm.weight"),
            "attn_ln_b": stack("encoder.layer.{i}.attention.output.LayerNorm.bias"),
            "fc1": stack("encoder.layer.{i}.intermediate.dense.weight", True),
            "fc1_b": stack("encoder.layer.{i}.intermediate.dense.bias"),
            "fc2": stack("encoder.layer.{i}.output.dense.weight", True),
            "fc2_b": stack("encoder.layer.{i}.output.dense.bias"),
            "mlp_ln": stack("encoder.layer.{i}.output.LayerNorm.weight"),
            "mlp_ln_b": stack("encoder.layer.{i}.output.LayerNorm.bias"),
        },
        "pooler_w": jnp.asarray(g("pooler.dense.weight").T, jnp.float32),
        "pooler_b": jnp.asarray(g("pooler.dense.bias"), jnp.float32),
    }
    return params, config


class JaxBertTextEncoder:
    """Frozen text encoder callable backed by the functional BERT."""

    def __init__(self, params: Params, config: BertConfig, tokenizer=None):
        self.params = params
        self.config = config
        self.tokenizer = tokenizer
        self._fn = jax.jit(
            lambda ids, mask: bert_forward(params, config, ids, mask)[1]
        )

    def __call__(self, input_ids, attention_mask) -> np.ndarray:
        return np.asarray(
            self._fn(jnp.asarray(np.asarray(input_ids), jnp.int32),
                     jnp.asarray(np.asarray(attention_mask), jnp.int32))
        )
