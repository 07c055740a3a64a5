"""Signal/text encoder heads for the two-stage (MERL-style) pipeline.

Mirrors ecg_byte/models/merl.py:12-31,140-271:
  - cls-token attention pooling over ResNet features;
  - the MERL pretrain head: 1x1 down-conv 2048->256, dual projections with
    dropout views, frozen text-encoder projection MLP, and the combined
    cross-modal + uni-modal CLIP loss at temperature 0.07.

Distribution note: the reference all_gathers embeddings across DDP ranks to
form a global contrastive batch (merl.py:204-230).  Under GSPMD the batch
axis is already global — computing the loss on the (sharded) global batch
makes XLA insert the same gathers, with exact (symmetric) gradients instead
of the reference's local-shard-only gradient approximation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.models.resnet1d import conv1d

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Attention pooling (merl.py:12-31)


def init_attention_pool(
    rng, spacial_dim: int, embed_dim: int, num_heads: int, output_dim: Optional[int] = None
) -> Params:
    ks = jax.random.split(rng, 6)
    out_dim = output_dim or embed_dim

    def dense(key, shape):
        bound = (1.0 / shape[0]) ** 0.5
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

    return {
        "pos_embed": jax.random.normal(ks[0], (1, spacial_dim + 1, embed_dim)) / embed_dim,
        "cls_token": jax.random.normal(ks[1], (1, 1, embed_dim)),
        "in_proj": dense(ks[2], (embed_dim, 3 * embed_dim)),
        "in_proj_bias": jnp.zeros((3 * embed_dim,)),
        "out_proj": dense(ks[3], (embed_dim, embed_dim)),
        "out_proj_bias": jnp.zeros((embed_dim,)),
        "c_proj": dense(ks[4], (embed_dim, out_dim)),
        "c_proj_bias": jnp.zeros((out_dim,)),
    }


def attention_pool(
    p: Params, x: jax.Array, num_heads: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """x: (B, C, L) -> pooled (B, out_dim), attention map (B, L).

    cls-token single-query multi-head attention over [cls; tokens] with
    positional embedding, like merl.py:22-31.  The returned map drops the
    cls self-weight (merl.py:31), so rows sum to < 1.
    """
    b = x.shape[0]
    h = num_heads
    x = jnp.swapaxes(x, 1, 2)  # (B, L, C)
    cls = p["cls_token"] + p["pos_embed"][:, :1]
    cls = jnp.broadcast_to(cls, (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(x.dtype)
    e = x.shape[-1]
    qkv = x @ p["in_proj"] + p["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q[:, :1].reshape(b, 1, h, e // h)  # query = cls token only
    k = k.reshape(b, -1, h, e // h)
    v = v.reshape(b, -1, h, e // h)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * ((e // h) ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, 1, e)
    out = out @ p["out_proj"] + p["out_proj_bias"]
    out = out @ p["c_proj"] + p["c_proj_bias"]
    att_map = jnp.mean(probs[:, :, 0, 1:], axis=1)  # avg heads, drop cls key
    return out[:, 0], att_map


# ---------------------------------------------------------------------------
# CLIP-style contrastive loss (merl.py:237-271)


def precision_at_k(sim: jax.Array, labels: jax.Array, ks=(1, 5)):
    order = jnp.argsort(-sim, axis=1)
    hits = order == labels[:, None]
    out = []
    for k in ks:
        out.append(jnp.mean(jnp.any(hits[:, :k], axis=1)) * 100.0)
    return out


def clip_loss(x: jax.Array, y: jax.Array, temperature: float = 0.07):
    """Symmetric InfoNCE over the (global) batch; returns (loss, acc1, acc5)."""
    x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    y = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("id,jd->ij", x, y) / temperature
    labels = jnp.arange(x.shape[0])
    logp_t = jax.nn.log_softmax(sim, axis=1)
    logp_i = jax.nn.log_softmax(sim.T, axis=1)
    loss_t = -jnp.mean(jnp.take_along_axis(logp_t, labels[:, None], 1))
    loss_i = -jnp.mean(jnp.take_along_axis(logp_i, labels[:, None], 1))
    i2t1, i2t5 = precision_at_k(sim, labels)
    t2i1, t2i5 = precision_at_k(sim.T, labels)
    return loss_t + loss_i, (i2t1 + t2i1) / 2.0, (i2t5 + t2i5) / 2.0


# ---------------------------------------------------------------------------
# MERL pretrain head (merl.py:140-234)


def init_merl_head(
    rng,
    feature_channels: int = 2048,
    proj_out: int = 256,
    text_dim: int = 768,
    spacial_dim: int = 32,
) -> Params:
    ks = jax.random.split(rng, 8)

    def dense(key, d_in, d_out):
        bound = (1.0 / d_in) ** 0.5
        return jax.random.uniform(key, (d_in, d_out), jnp.float32, -bound, bound)

    return {
        "downconv": jax.random.normal(ks[0], (proj_out, feature_channels, 1))
        * (1.0 / np.sqrt(feature_channels)),
        "att_pool": init_attention_pool(ks[1], spacial_dim, proj_out, 4, proj_out),
        "linear1": dense(ks[2], proj_out, proj_out),
        "linear2": dense(ks[3], proj_out, proj_out),
        "proj_t_w1": dense(ks[4], text_dim, proj_out),
        "proj_t_b1": jnp.zeros((proj_out,)),
        "proj_t_w2": dense(ks[5], proj_out, proj_out),
        "proj_t_b2": jnp.zeros((proj_out,)),
    }


def merl_pretrain_loss(
    head: Params,
    features: jax.Array,  # (B, C, L') resnet output
    text_emb: jax.Array,  # (B, 768) frozen text-encoder pooled output
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
):
    """Combined cross-modal + uni-modal contrastive loss (merl.py:171-234)."""
    ecg_emb = conv1d(features, head["downconv"])  # (B, 256, L')
    proj_ecg, att_map = attention_pool(head["att_pool"], ecg_emb)
    proj_ecg = proj_ecg / (jnp.linalg.norm(proj_ecg, axis=-1, keepdims=True) + 1e-8)

    pooled = jnp.mean(ecg_emb, axis=-1)  # AdaptiveAvgPool1d(1)
    e1 = pooled @ head["linear1"]
    e2 = pooled @ head["linear2"]
    if dropout_rng is not None and dropout_rate > 0:
        k1, k2 = jax.random.split(dropout_rng)
        e1 = jnp.where(
            jax.random.bernoulli(k1, 1 - dropout_rate, e1.shape), e1 / (1 - dropout_rate), 0
        )
        e2 = jnp.where(
            jax.random.bernoulli(k2, 1 - dropout_rate, e2.shape), e2 / (1 - dropout_rate), 0
        )

    proj_text = jax.nn.gelu(text_emb @ head["proj_t_w1"] + head["proj_t_b1"])
    proj_text = proj_text @ head["proj_t_w2"] + head["proj_t_b2"]
    proj_text = proj_text / (jnp.linalg.norm(proj_text, axis=-1, keepdims=True) + 1e-8)

    cma_loss, acc1, acc5 = clip_loss(proj_ecg, proj_text)
    uma_loss, _, _ = clip_loss(e1, e2)
    return cma_loss + uma_loss, {"acc1": acc1, "acc5": acc5, "att_map": att_map}


# ---------------------------------------------------------------------------
# Frozen text encoders


class HashTextEncoder:
    """Deterministic offline stand-in for the frozen MedCPT BERT
    (merl.py:197-201): hashed token embeddings mean-pooled to ``dim``.

    Frozen by construction (no trainable params), so the training dynamics
    of the MERL head are preserved without any model download.
    """

    def __init__(self, dim: int = 768, vocab_hash: int = 1 << 16, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.table = rng.normal(size=(vocab_hash, dim)).astype(np.float32) / np.sqrt(dim)
        self.vocab_hash = vocab_hash
        self.dim = dim

    def __call__(self, input_ids: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
        ids = np.asarray(input_ids) % self.vocab_hash
        emb = self.table[ids]  # (B, S, D)
        mask = np.asarray(attention_mask)[..., None].astype(np.float32)
        return (emb * mask).sum(1) / np.maximum(mask.sum(1), 1.0)


def load_frozen_text_encoder(
    model_name: Optional[str] = None, allow_hash_fallback: bool = False
) -> Callable:
    """Frozen text encoder: functional JAX BERT from a local checkpoint
    (e.g. MedCPT-Query-Encoder), or the hash encoder when no checkpoint
    is named.

    The reference computes the text embedding under no_grad (merl.py:197),
    so a frozen encoder reproduces its actual training behavior.

    A named checkpoint that fails to load RAISES (a corrupt local BERT
    must not silently turn the MERL baseline into hash embeddings
    mid-run) unless ``allow_hash_fallback=True`` was explicitly set
    (``--allow_hash_text_encoder`` in the pretrain CLI)."""
    if model_name:
        try:
            import os

            from ecg_byte_tpu.models.bert import JaxBertTextEncoder, load_hf_bert

            params, config = load_hf_bert(model_name)
            # MedCPT is a BERT: its checkpoint ships vocab.txt, which the
            # in-repo WordPiece tokenizes exactly (oracle-tested vs
            # BertTokenizer in tests/test_metrics.py) — the MERL path is
            # transformers-free.  Hash fallback only when no vocab exists.
            tokenizer = None
            vocab_file = os.path.join(model_name, "vocab.txt")
            if os.path.exists(vocab_file):
                from ecg_byte_tpu.tokenizer.wordpiece import WordPieceTokenizer

                lower = True
                cfg_file = os.path.join(model_name, "tokenizer_config.json")
                if os.path.exists(cfg_file):
                    import json

                    with open(cfg_file) as f:
                        lower = json.load(f).get("do_lower_case", True)
                tokenizer = WordPieceTokenizer(vocab_file, lower_case=lower)
            return JaxBertTextEncoder(params, config, tokenizer)
        except Exception as e:
            if not allow_hash_fallback:
                raise RuntimeError(
                    f"text encoder checkpoint {model_name!r} failed to "
                    f"load ({e}); pass allow_hash_fallback=True "
                    "(--allow_hash_text_encoder) to degrade to the hash "
                    "encoder instead"
                ) from e
            print(f"local BERT unavailable ({e}); using hash text encoder")
    return HashTextEncoder()
