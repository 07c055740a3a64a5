"""LoRA adapters as parameter-tree overlays.

The reference uses peft LoRA r=16, alpha=32, dropout 0.05 on the seven
projection modules (main.py:131-138).  Here adapters live in a *separate*
pytree shaped like the layer stack; the base parameters stay frozen and the
optimizer/train step only ever sees the adapter tree (plus any explicitly
trainable extras), which is the functional equivalent of
``requires_grad`` filtering (main.py:263).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ecg_byte_tpu.models.config import TransformerConfig

Params = Dict[str, Any]

_PROJ_DIMS = {
    "q_proj": lambda c: (c.hidden_size, c.qkv_dim),
    "k_proj": lambda c: (c.hidden_size, c.kv_dim),
    "v_proj": lambda c: (c.hidden_size, c.kv_dim),
    "o_proj": lambda c: (c.qkv_dim, c.hidden_size),
    "gate_proj": lambda c: (c.hidden_size, c.intermediate_size),
    "up_proj": lambda c: (c.hidden_size, c.intermediate_size),
    "down_proj": lambda c: (c.intermediate_size, c.hidden_size),
}


def init_lora(config: TransformerConfig, rng: jax.Array) -> Params:
    """Init LoRA trees: A ~ kaiming-uniform-ish, B = 0 (peft convention, so
    the adapted model starts exactly at the base model)."""
    c = config
    dt = jnp.dtype(c.dtype)
    layers: Params = {}
    keys = jax.random.split(rng, len(c.lora_targets))
    for key, name in zip(keys, c.lora_targets):
        if name not in _PROJ_DIMS:
            continue
        if name == "gate_proj" and c.hidden_act not in ("silu", "gelu_tanh"):
            continue
        d_in, d_out = _PROJ_DIMS[name](c)
        bound = (1.0 / d_in) ** 0.5
        a = jax.random.uniform(
            key,
            (c.num_layers, d_in, c.lora_rank),
            jnp.float32,
            minval=-bound,
            maxval=bound,
        ).astype(dt)
        b = jnp.zeros((c.num_layers, c.lora_rank, d_out), dt)
        layers[name] = {"a": a, "b": b}
    return {"layers": layers}


def merge_lora(params: Params, lora: Params, config: TransformerConfig) -> Params:
    """Fold adapters into the base weights: W' = W + (alpha/r) A @ B."""
    scale = config.lora_alpha / config.lora_rank
    merged_layers = dict(params["layers"])
    for name, ab in lora["layers"].items():
        delta = jnp.einsum("lik,lko->lio", ab["a"], ab["b"]) * scale
        proj = dict(merged_layers[name])
        proj["kernel"] = (proj["kernel"].astype(jnp.float32) + delta.astype(jnp.float32)).astype(
            proj["kernel"].dtype
        )
        merged_layers[name] = proj
    out = dict(params)
    out["layers"] = merged_layers
    return out


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
