"""Weight-only int8 quantization for serving (beyond-reference capability).

Greedy decode on TPU is HBM-bandwidth-bound: every parameter byte streams
once per token (BASELINE.md decode analysis), so halving the bytes nearly
halves the per-token time.  This module builds an int8 serving copy of an
LM parameter tree — per-output-channel symmetric quantization of every
projection kernel plus the unembed head — that the standard forward/decode
path consumes transparently: ``models/transformer._kernel_matmul``
dequantizes in-matmul (``x @ (q.astype(bf16) * scale)``), which XLA fuses
into the dot's operand read so only int8 bytes cross HBM.

What stays bf16:
  - the token embedding (gathered per token: B rows of traffic, not a
    streamed matmul; for tied models the HEAD use is quantized as an
    explicit ``lm_head_q`` copy while the gather table stays exact);
  - biases and norm scales (KBs).

This is an OPT-IN serving mode (``--int8_decode``): outputs are close to
but not bitwise-equal with the bf16 path.  The reference has no
quantized-serving capability (its decode is bf16/fp16 HF generate,
ecg_byte/models/llm.py:31-34); this exists because the TPU roofline
argument makes the win explicit.  LoRA should be merged into the base
first (models/lora.py merge-for-inference) so the adapters are quantized
with the weights they modify.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ecg_byte_tpu.models.config import TransformerConfig

_PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
)


def _quantize_kernel(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: w ~= q * scale.

    ``w``: (..., D_in, D_out); scale over the contraction axis so each
    output channel keeps its own dynamic range.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    # bf16 scales: the dequantized product q*scale stays within one bf16
    # ulp of the f32 dequant; weights were bf16 to begin with
    return q, scale.astype(jnp.bfloat16)


def quantize_lm_int8(params, config: TransformerConfig):
    """Int8 serving copy of an LM tree (init_params/load_hf layout).

    Each projection entry ``{"kernel": w, ...}`` becomes
    ``{"kernel_q": int8, "kernel_scale": bf16, ...}`` (bias preserved);
    the unembed becomes ``lm_head_q``/``lm_head_scale`` — for tied models
    quantized from ``embed.T`` while ``embed`` itself stays bf16 for the
    exact input gather.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name in _PROJ_NAMES:
        if name not in layers:
            continue
        entry = dict(layers[name])
        q, scale = _quantize_kernel(entry.pop("kernel"))
        entry["kernel_q"] = q
        entry["kernel_scale"] = scale
        layers[name] = entry
    out["layers"] = layers

    head = (
        jnp.swapaxes(params["embed"], 0, 1)
        if config.tie_word_embeddings
        else params["lm_head"]
    )
    q, scale = _quantize_kernel(head)
    out.pop("lm_head", None)
    out["lm_head_q"] = q
    out["lm_head_scale"] = scale
    return out


def dequantize_kernel(q: jax.Array, scale: jax.Array) -> jax.Array:
    """Materialized dequant (testing / fallback), bf16."""
    return q.astype(jnp.bfloat16) * scale
