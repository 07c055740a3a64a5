"""Two-stage fusion: splice a frozen signal-encoder embedding into the LLM
input at the ``<signal>`` slot.

Functional counterparts of CLIP_LLM / VIT_LLM / CLIP_VIT_LLM / ResNet_LLM
(models/llm.py:42-334) and ``adapt_sequence`` (utils/model_utils.py:96-157).
The reference resolves the <signal> position with a hard-coded token id
131757; here the id always comes from the tokenizer (SURVEY.md §7.7), and
the splice is a vectorized gather instead of a per-row Python loop.

Reference quirks NOT replicated (they crash as shipped): the undefined
``combined_embeds`` in all four generate() methods (models/llm.py:105 etc.)
— our decode slices the prompt off inside ``greedy_generate``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

IGNORE_INDEX = -100


def adapt_sequence(
    sig_embed: jax.Array,  # (B, 1, D)
    text_embed: jax.Array,  # (B, S, D)
    token_ids: jax.Array,  # (B, S)
    attn_mask: jax.Array,  # (B, S)
    labels: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    sig_id: int = -1,
    ignore_index: int = IGNORE_INDEX,
) -> Dict[str, jax.Array]:
    """Insert the encoder embedding right after the <signal> token.

    Training mode (labels given, add_idx=2): the slot after <signal> is
    consumed, output length == S.  Inference mode (add_idx=1): pure insert,
    output length == S + 1.  Matches model_utils.py:96-157 exactly.
    """
    b, s, d = text_embed.shape
    add_idx = 2 if labels is not None else 1
    s_out = s + 2 - add_idx
    sig_pos = jnp.argmax(token_ids == sig_id, axis=-1)  # (B,)
    p = sig_pos + 1  # insertion slot

    j = jnp.arange(s_out)[None, :]  # (1, S_out)
    pv = p[:, None]
    # source index into concat([text (0..S-1), sig (S)])
    src = jnp.where(j < pv, j, jnp.where(j == pv, s, j + add_idx - 2))
    src = jnp.clip(src, 0, s)

    ext_embed = jnp.concatenate([text_embed, sig_embed.astype(text_embed.dtype)], axis=1)
    combined = jnp.take_along_axis(ext_embed, src[..., None], axis=1)

    def splice_scalar(field, insert_value):
        ext = jnp.concatenate(
            [field, jnp.full((b, 1), insert_value, field.dtype)], axis=1
        )
        return jnp.take_along_axis(ext, src, axis=1)

    out = {
        "combined_embeds": combined,
        "attn_mask": splice_scalar(attn_mask.astype(jnp.int32), 1),
    }
    if labels is not None:
        out["labels"] = splice_scalar(labels, ignore_index)
        # position ids: before unchanged; inserted = pos[p-1] + 1; after +1
        pos_before = jnp.take_along_axis(position_ids, jnp.maximum(p - 1, 0)[:, None], 1)[:, 0]
        ext_pos = jnp.concatenate(
            [position_ids, (pos_before + 1)[:, None].astype(position_ids.dtype)], axis=1
        )
        new_pos = jnp.take_along_axis(ext_pos, src, axis=1)
        new_pos = jnp.where(j > pv, new_pos + 1, new_pos)
        out["position_ids"] = new_pos
    return out


# ---------------------------------------------------------------------------
# Encoder-side embedding extraction (frozen stage-1 backbones)


def init_projection(rng, d_in: int, d_out: int) -> Params:
    bound = (1.0 / d_in) ** 0.5
    k1, k2 = jax.random.split(rng)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (d_out,), jnp.float32, -bound, bound),
    }


def init_fusion(rng, kind: str, llm_hidden: int, resnet_channels: int = 2048,
                clip_dim: int = 512, vit_dim: int = 768) -> Params:
    """Trainable stage-2 fusion parameters per backbone kind
    (models/llm.py:51,120,199-206,283)."""
    ks = jax.random.split(rng, 4)
    if kind == "clip_model":
        return {"image_projection": init_projection(ks[0], clip_dim, llm_hidden)}
    if kind == "vit_model":
        return {"image_projection": init_projection(ks[0], vit_dim, llm_hidden)}
    if kind == "clip_vit_model":
        return {
            "clip_projection": init_projection(ks[0], clip_dim, llm_hidden),
            "vit_projection": init_projection(ks[1], vit_dim, llm_hidden),
            "fusion_w1": init_projection(ks[2], 2 * llm_hidden, llm_hidden),
            "fusion_w2": init_projection(ks[3], llm_hidden, llm_hidden),
        }
    if kind == "resnet_model":
        return {"image_projection": init_projection(ks[0], resnet_channels, llm_hidden)}
    raise ValueError(f"unknown fusion kind {kind!r}")


def _apply_proj(p: Params, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def encoder_embedding(
    kind: str,
    fusion: Params,
    batch: Dict[str, jax.Array],
    *,
    clip=None,  # (params, config)
    vit=None,  # (params, config)
    resnet=None,  # (params, state, meta)
) -> jax.Array:
    """Frozen backbone -> projected (B, 1, llm_hidden) embedding.

    CLIP: image_embeds (llm.py:64-65); ViT: mean over all hidden states and
    tokens (llm.py:131-134); ResNet: avg-pooled features (llm.py:292-296);
    CLIP+ViT: dual projection + 2-layer fusion MLP (llm.py:212-231).
    """
    if kind == "clip_model":
        from ecg_byte_tpu.models.vision import clip_image_embeds

        emb = clip_image_embeds(clip[0], clip[1], batch["clip_pixel"])
        emb = jax.lax.stop_gradient(emb)
        proj = _apply_proj(fusion["image_projection"], emb)
    elif kind == "vit_model":
        from ecg_byte_tpu.models.vision import vit_encode

        _, hiddens = vit_encode(
            vit[0], vit[1], batch["vit_pixel"], batch.get("mask"), collect_hidden=True
        )
        emb = jnp.mean(jnp.stack(hiddens), axis=0).mean(axis=1)
        emb = jax.lax.stop_gradient(emb)
        proj = _apply_proj(fusion["image_projection"], emb)
    elif kind == "clip_vit_model":
        from ecg_byte_tpu.models.vision import clip_image_embeds, vit_encode

        clip_emb = jax.lax.stop_gradient(
            clip_image_embeds(clip[0], clip[1], batch["clip_pixel"])
        )
        _, hiddens = vit_encode(
            vit[0], vit[1], batch["vit_pixel"], batch.get("mask"), collect_hidden=True
        )
        vit_emb = jax.lax.stop_gradient(jnp.mean(jnp.stack(hiddens), 0).mean(1))
        pc = _apply_proj(fusion["clip_projection"], clip_emb)
        pv = _apply_proj(fusion["vit_projection"], vit_emb)
        fused = jnp.concatenate([pc, pv], axis=-1)
        fused = jax.nn.relu(_apply_proj(fusion["fusion_w1"], fused))
        proj = _apply_proj(fusion["fusion_w2"], fused)
    elif kind == "resnet_model":
        from ecg_byte_tpu.models.resnet1d import resnet_forward

        feats, _ = resnet_forward(
            resnet[0], resnet[1], resnet[2], batch["norm_signal"], train=False
        )
        emb = jax.lax.stop_gradient(jnp.mean(feats, axis=-1))  # AdaptiveAvgPool1d(1)
        proj = _apply_proj(fusion["image_projection"], emb)
    else:
        raise ValueError(kind)
    return proj[:, None, :]


def fusion_lm_loss(
    llm_params,
    llm_config,
    fusion: Params,
    kind: str,
    batch: Dict[str, jax.Array],
    sig_id: int,
    *,
    lora=None,
    dropout_rng=None,
    encoders: Dict[str, Any],
    remat="dots",
    scan_unroll=True,
    chunked_loss: bool = False,
):
    """Stage-2 training loss: splice + causal LM on inputs_embeds
    (models/llm.py:54-77 and friends).

    Uses the same loss machinery as the stage-1 train step: the LM runs
    ``return_hidden=True`` and the cross entropy comes from
    :func:`transformer.lm_loss_from_hidden` (fused bf16-backward dense CE
    — identical loss value, no separate (B, S, V) f32 logits round-trip)
    or :func:`transformer.chunked_lm_loss` when ``chunked_loss=True``
    (vocab-tiled, for batches where even one logits tile is too big).
    ``remat``/``scan_unroll`` follow :func:`train.make_train_step`."""
    from ecg_byte_tpu.models import transformer as T

    sig_embed = encoder_embedding(kind, fusion, batch, **encoders)
    token_ids = batch["tokenized_signal"]
    text_embed = jnp.take(llm_params["embed"], token_ids, axis=0)
    adapted = adapt_sequence(
        sig_embed, text_embed, token_ids,
        batch["attn_mask"].astype(jnp.int32),
        batch["quantized_signal_ids_input"],
        batch["position_ids"],
        sig_id=sig_id,
    )
    hidden = T.forward(
        llm_params, llm_config, None,
        adapted["attn_mask"], adapted["position_ids"],
        inputs_embeds=adapted["combined_embeds"],
        lora=lora, dropout_rng=dropout_rng,
        remat=remat, return_hidden=True, scan_unroll=scan_unroll,
    )
    if chunked_loss:
        return T.chunked_lm_loss(
            llm_params, llm_config, hidden, adapted["labels"]
        )
    return T.lm_loss_from_hidden(
        llm_params, llm_config, hidden, adapted["labels"]
    )


def fusion_generate(
    llm_params,
    llm_config,
    fusion: Params,
    kind: str,
    batch: Dict[str, jax.Array],
    sig_id: int,
    *,
    lora=None,
    encoders: Dict[str, Any],
    max_new_tokens: int = 128,
    eos_token_id: int = -1,
    pad_token_id: int = 0,
    int8_kv: bool = False,
):
    """Stage-2 greedy decode: prompt consumed as spliced embeddings
    (the both-inputs HF workaround, README.md:308), continuation as ids."""
    from ecg_byte_tpu.infer.decode import greedy_generate

    sig_embed = encoder_embedding(kind, fusion, batch, **encoders)
    token_ids = batch["tokenized_signal2"]
    text_embed = jnp.take(llm_params["embed"], token_ids, axis=0)
    adapted = adapt_sequence(
        sig_embed, text_embed, token_ids, batch["attn_mask2"].astype(jnp.int32),
        sig_id=sig_id,
    )
    return greedy_generate(
        llm_params, llm_config, None, adapted["attn_mask"],
        inputs_embeds=adapted["combined_embeds"], lora=lora,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, int8_kv=int8_kv,
    )
