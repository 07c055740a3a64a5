"""Jitted autoregressive greedy decoding with a KV cache.

Reference decode budget (models/llm.py:26-37): greedy, ``max_new_tokens=128``,
eos stop, KV cache, prompt sliced off the output.  The HF loop re-dispatches
Python per token; here prefill + a ``lax.while_loop`` of fused decode steps
compile to a single XLA program with static shapes, stopping early once every
row has emitted eos.

Also covers the two-stage generation quirk the reference needs a vendored HF
fork for (README.md:308, generation/utils.py:392-400): step 0 can consume
spliced ``inputs_embeds`` while subsequent steps feed token ids.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ecg_byte_tpu.models import transformer as T
from ecg_byte_tpu.models.config import TransformerConfig


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 128
    eos_token_id: int = -1
    pad_token_id: int = 0
    # int8 KV serving cache (models/transformer.init_kv_cache dtype=int8):
    # halves per-token KV traffic on the byte-bound decode path.  Opt-in —
    # outputs are close to but not bitwise-equal with the bf16 cache.
    int8_kv: bool = False


@functools.partial(
    jax.jit,
    static_argnames=("config", "gen", "has_lora", "has_embeds"),
)
def _generate_impl(
    params,
    config: TransformerConfig,
    gen: GenerateConfig,
    input_ids,
    attn_mask,
    lora,
    inputs_embeds,
    has_lora: bool,
    has_embeds: bool,
):
    b, s_prompt = attn_mask.shape
    s_max = s_prompt + gen.max_new_tokens
    lora_tree = lora if has_lora else None

    cache = T.init_kv_cache(
        config, b, s_max, dtype=jnp.int8 if gen.int8_kv else None
    )
    logits, cache, next_pos = T.prefill(
        params,
        config,
        None if has_embeds else input_ids,
        attn_mask,
        cache,
        lora=lora_tree,
        inputs_embeds=inputs_embeds if has_embeds else None,
    )
    first_tok = jnp.argmax(logits, -1).astype(jnp.int32)
    done0 = first_tok == gen.eos_token_id
    out0 = jnp.full((b, gen.max_new_tokens), gen.pad_token_id, jnp.int32)
    out0 = out0.at[:, 0].set(first_tok)
    cache_mask0 = jnp.concatenate(
        [attn_mask.astype(jnp.int32),
         jnp.zeros((b, gen.max_new_tokens), jnp.int32)],
        axis=1,
    )

    def cond(state):
        step, _, _, _, _, done, _ = state
        return (step < gen.max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, cur, positions, cache, cache_mask, done, out = state
        write_idx = s_prompt + step - 1
        cache_mask = cache_mask.at[:, write_idx].set(1)
        logits, cache = T.decode_step(
            params, config, cur, positions, write_idx, cache, cache_mask,
            lora=lora_tree,
        )
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        out = out.at[:, step].set(nxt)
        done = done | (nxt == gen.eos_token_id)
        return step + 1, nxt, positions + 1, cache, cache_mask, done, out

    state = (jnp.int32(1), first_tok, next_pos.astype(jnp.int32), cache,
             cache_mask0, done0, out0)
    _, _, _, _, _, _, out = jax.lax.while_loop(cond, body, state)
    return out


def greedy_generate(
    params,
    config: TransformerConfig,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    *,
    gen: Optional[GenerateConfig] = None,
    lora: Optional[Dict[str, Any]] = None,
    inputs_embeds: Optional[jax.Array] = None,
    max_new_tokens: int = 128,
    eos_token_id: int = -1,
    pad_token_id: int = 0,
    int8_kv: bool = False,
) -> jax.Array:
    """Greedy-decode continuations.

    Args:
      input_ids: (B, S) prompt (ignored when ``inputs_embeds`` is given,
        mirroring the embeds-first-step-only HF behavior).
      attn_mask: (B, S) validity mask (1 = valid).
      inputs_embeds: optional (B, S, D) prompt embeddings (two-stage path).

    Returns:
      (B, max_new_tokens) int32 — ONLY the newly generated tokens (prompt
      pre-sliced, models/llm.py:36 semantics), padded with ``pad_token_id``
      after each row's eos.
    """
    if gen is None:
        gen = GenerateConfig(
            max_new_tokens=max_new_tokens,
            eos_token_id=eos_token_id,
            pad_token_id=pad_token_id,
            int8_kv=int8_kv,
        )
    if attn_mask is None:
        shape = input_ids.shape if inputs_embeds is None else inputs_embeds.shape[:2]
        attn_mask = jnp.ones(shape, jnp.int32)
    return _generate_impl(
        params,
        config,
        gen,
        input_ids if input_ids is not None else jnp.zeros(attn_mask.shape, jnp.int32),
        attn_mask,
        lora if lora is not None else {},
        inputs_embeds if inputs_embeds is not None else jnp.zeros((1,), jnp.float32),
        lora is not None,
        inputs_embeds is not None,
    )
