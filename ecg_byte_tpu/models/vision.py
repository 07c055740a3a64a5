"""ViT and CLIP encoders (functional JAX) for the two-stage baselines.

Covers the HF surface the reference consumes:
  - ``ViTForMaskedImageModeling`` (models/vit.py, data_loader.py:175-177):
    patch embedding with a mask token substituted at 75% of positions,
    pre-LN encoder, pixel-reconstruction decoder, L1 loss on masked patches,
    and the full hidden-state stack (VIT_LLM averages all hidden states,
    models/llm.py:131-133);
  - ``CLIPModel`` (models/clip.py): dual ViT-image/causal-text towers with
    projections, learnable logit scale, symmetric contrastive loss
    (``return_loss=True``), and ``image_embeds`` for CLIP_LLM fusion.

Both towers share one stacked-layer pre-LN encoder implementation scanned
with ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.ops.attention import causal_attention, full_attention

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    channels: int = 3

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_length: int = 77


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    vision: VisionConfig = VisionConfig(patch_size=32)
    text: ClipTextConfig = ClipTextConfig()
    projection_dim: int = 512


def tiny_vision_config(**kw) -> VisionConfig:
    base = dict(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                num_heads=4, intermediate_size=64)
    base.update(kw)
    return VisionConfig(**base)


def tiny_clip_config() -> ClipConfig:
    return ClipConfig(
        vision=tiny_vision_config(),
        text=ClipTextConfig(vocab_size=300, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64, max_length=16),
        projection_dim=24,
    )


# ---------------------------------------------------------------------------
# Shared pre-LN encoder stack


def _init_stack(rng, layers, hidden, mlp):
    ks = jax.random.split(rng, 8)

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.float32) * 0.02

    L = layers
    return {
        "ln1": jnp.ones((L, hidden)),
        "ln1_b": jnp.zeros((L, hidden)),
        "qkv": dense(ks[0], (L, hidden, 3 * hidden)),
        "qkv_b": jnp.zeros((L, 3 * hidden)),
        "out": dense(ks[1], (L, hidden, hidden)),
        "out_b": jnp.zeros((L, hidden)),
        "ln2": jnp.ones((L, hidden)),
        "ln2_b": jnp.zeros((L, hidden)),
        "fc1": dense(ks[2], (L, hidden, mlp)),
        "fc1_b": jnp.zeros((L, mlp)),
        "fc2": dense(ks[3], (L, mlp, hidden)),
        "fc2_b": jnp.zeros((L, hidden)),
    }


def _ln(x, w, b, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _stack_forward(
    p: Params,
    x: jax.Array,
    num_heads: int,
    *,
    causal: bool = False,
    pad_mask: Optional[jax.Array] = None,
    collect_hidden: bool = False,
):
    """Pre-LN transformer encoder.  Returns (last_hidden, hidden_list)."""
    b, s, h = x.shape
    d = h // num_heads
    hidden_states: List[jax.Array] = [x] if collect_hidden else []
    L = p["ln1"].shape[0]

    def layer(x, i):
        lp = jax.tree.map(lambda a: a[i], p)
        hn = _ln(x, lp["ln1"], lp["ln1_b"])
        qkv = hn @ lp["qkv"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, num_heads, d)
        k = k.reshape(b, s, num_heads, d)
        v = v.reshape(b, s, num_heads, d)
        if causal:
            attn, _ = causal_attention(q, k, v, pad_mask, use_flash=False)
        else:
            attn, _ = full_attention(q, k, v, pad_mask)
        x = x + attn.reshape(b, s, h) @ lp["out"] + lp["out_b"]
        hn = _ln(x, lp["ln2"], lp["ln2_b"])
        x = x + jax.nn.gelu(hn @ lp["fc1"] + lp["fc1_b"], approximate=True) @ lp["fc2"] + lp["fc2_b"]
        return x

    if collect_hidden:
        for i in range(L):
            x = layer(x, i)
            hidden_states.append(x)
        return x, hidden_states
    x = jax.lax.fori_loop(0, L, lambda i, x: layer(x, i), x)
    return x, hidden_states


# ---------------------------------------------------------------------------
# ViT (masked image modeling)


def init_vit(rng, config: VisionConfig) -> Params:
    c = config
    ks = jax.random.split(rng, 8)
    n = c.num_patches
    return {
        "patch_embed": jax.random.normal(
            ks[0], (c.hidden_size, c.channels, c.patch_size, c.patch_size)
        ) * 0.02,
        "patch_bias": jnp.zeros((c.hidden_size,)),
        "cls_token": jax.random.normal(ks[1], (1, 1, c.hidden_size)) * 0.02,
        "mask_token": jax.random.normal(ks[2], (1, 1, c.hidden_size)) * 0.02,
        "pos_embed": jax.random.normal(ks[3], (1, n + 1, c.hidden_size)) * 0.02,
        "encoder": _init_stack(ks[4], c.num_layers, c.hidden_size, c.intermediate_size),
        "final_ln": jnp.ones((c.hidden_size,)),
        "final_ln_b": jnp.zeros((c.hidden_size,)),
        "decoder": jax.random.normal(
            ks[5], (c.hidden_size, c.patch_size * c.patch_size * c.channels)
        ) * 0.02,
        "decoder_b": jnp.zeros((c.patch_size * c.patch_size * c.channels,)),
    }


def _patchify_embed(p, config: VisionConfig, pixels: jax.Array) -> jax.Array:
    """(B, C, H, W) -> (B, N, hidden) via the patch conv."""
    out = jax.lax.conv_general_dilated(
        pixels,
        p["patch_embed"],
        window_strides=(config.patch_size, config.patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    b, h, gh, gw = out.shape
    return out.reshape(b, h, gh * gw).swapaxes(1, 2) + p["patch_bias"]


def vit_encode(
    p: Params,
    config: VisionConfig,
    pixels: jax.Array,
    bool_masked_pos: Optional[jax.Array] = None,
    collect_hidden: bool = False,
):
    """Returns (sequence_output (B, N+1, H), hidden_states list)."""
    x = _patchify_embed(p, config, pixels)
    if bool_masked_pos is not None:
        mask = bool_masked_pos[..., None].astype(x.dtype)
        x = x * (1 - mask) + p["mask_token"] * mask
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"]
    x, hiddens = _stack_forward(
        p["encoder"], x, config.num_heads, collect_hidden=collect_hidden
    )
    x = _ln(x, p["final_ln"], p["final_ln_b"])
    return x, hiddens


def vit_mim_loss(
    p: Params, config: VisionConfig, pixels: jax.Array, bool_masked_pos: jax.Array
) -> jax.Array:
    """Masked-image-modeling L1 reconstruction loss on masked patches."""
    seq, _ = vit_encode(p, config, pixels, bool_masked_pos)
    patch_pred = seq[:, 1:] @ p["decoder"] + p["decoder_b"]  # (B, N, P*P*C)
    c = config
    ps = c.patch_size
    g = c.image_size // ps
    b = pixels.shape[0]
    target = pixels.reshape(b, c.channels, g, ps, g, ps)
    target = target.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    l1 = jnp.abs(patch_pred - target).mean(-1)
    mask = bool_masked_pos.astype(jnp.float32)
    return jnp.sum(l1 * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---------------------------------------------------------------------------
# CLIP


def init_clip(rng, config: ClipConfig) -> Params:
    ks = jax.random.split(rng, 10)
    v, t = config.vision, config.text
    return {
        "vision": init_vit(ks[0], v),
        "text_embed": jax.random.normal(ks[1], (t.vocab_size, t.hidden_size)) * 0.02,
        "text_pos": jax.random.normal(ks[2], (t.max_length, t.hidden_size)) * 0.02,
        "text_encoder": _init_stack(ks[3], t.num_layers, t.hidden_size, t.intermediate_size),
        "text_final_ln": jnp.ones((t.hidden_size,)),
        "text_final_ln_b": jnp.zeros((t.hidden_size,)),
        "visual_projection": jax.random.normal(
            ks[4], (v.hidden_size, config.projection_dim)) * 0.02,
        "text_projection": jax.random.normal(
            ks[5], (t.hidden_size, config.projection_dim)) * 0.02,
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
    }


def clip_image_embeds(p, config: ClipConfig, pixel_values: jax.Array) -> jax.Array:
    seq, _ = vit_encode(p["vision"], config.vision, pixel_values)
    return seq[:, 0] @ p["visual_projection"]


def clip_text_embeds(p, config: ClipConfig, input_ids, attention_mask) -> jax.Array:
    t = config.text
    s = input_ids.shape[1]
    x = jnp.take(p["text_embed"], input_ids, axis=0) + p["text_pos"][:s]
    x, _ = _stack_forward(
        p["text_encoder"], x, t.num_heads, causal=True, pad_mask=attention_mask
    )
    x = _ln(x, p["text_final_ln"], p["text_final_ln_b"])
    # HF convention: pooled = hidden at the highest-id (eot) token position
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return pooled @ p["text_projection"]


def clip_forward(
    p: Params,
    config: ClipConfig,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    pixel_values: jax.Array,
    return_loss: bool = False,
):
    """Returns dict(loss, image_embeds, text_embeds) like HF CLIPModel."""
    image_embeds = clip_image_embeds(p, config, pixel_values)
    text_embeds = clip_text_embeds(p, config, input_ids, attention_mask)
    out = {"image_embeds": image_embeds, "text_embeds": text_embeds, "loss": None}
    if return_loss:
        ie = image_embeds / (jnp.linalg.norm(image_embeds, axis=-1, keepdims=True) + 1e-8)
        te = text_embeds / (jnp.linalg.norm(text_embeds, axis=-1, keepdims=True) + 1e-8)
        scale = jnp.exp(p["logit_scale"])
        logits = jnp.einsum("id,jd->ij", te, ie) * scale
        labels = jnp.arange(logits.shape[0])
        lt = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(logits, 1), labels[:, None], 1))
        li = -jnp.mean(jnp.take_along_axis(jax.nn.log_softmax(logits.T, 1), labels[:, None], 1))
        out["loss"] = (lt + li) / 2.0
    return out
