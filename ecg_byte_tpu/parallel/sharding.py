"""PartitionSpec trees for the transformer parameter/LoRA pytrees.

Megatron-style TP sharding:
  q/k/v kernels (L, D, Hd)   -> shard output (head) dim over "tp"
  o_proj        (L, Hd, D)   -> shard input (head) dim over "tp"
  gate/up       (L, D, I)    -> shard I over "tp"
  down          (L, I, D)    -> shard I over "tp"
  embed         (V, D)       -> shard V over "tp" (GSPMD turns the gather +
                                tied-logits matmul into the right collectives)
FSDP shards the non-tp weight dim over "fsdp" (ZeRO-3); optimizer state
inherits the same specs via tree structure.  Activations are constrained at
key points in the train step (batch over ("dp","fsdp"), heads/I over "tp").
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ecg_byte_tpu.models.config import TransformerConfig


def _layer_specs(config: TransformerConfig, fsdp: bool) -> Dict[str, Any]:
    f = "fsdp" if fsdp else None
    specs: Dict[str, Any] = {
        "attn_norm": P(None, None),
        "q_proj": {"kernel": P(None, f, "tp")},
        "k_proj": {"kernel": P(None, f, "tp")},
        "v_proj": {"kernel": P(None, f, "tp")},
        "o_proj": {"kernel": P(None, "tp", f)},
        "mlp_norm": P(None, None),
        "up_proj": {"kernel": P(None, f, "tp")},
        "down_proj": {"kernel": P(None, "tp", f)},
    }
    if config.hidden_act in ("silu", "gelu_tanh"):
        specs["gate_proj"] = {"kernel": P(None, f, "tp")}
    if config.use_bias:
        for name, axis in (
            ("q_proj", "tp"),
            ("k_proj", "tp"),
            ("v_proj", "tp"),
            ("o_proj", f),
            ("up_proj", "tp"),
            ("down_proj", f),
        ):
            specs[name]["bias"] = P(None, axis)
        specs["attn_norm_bias"] = P(None, None)
        specs["mlp_norm_bias"] = P(None, None)
    return specs


def param_specs(config: TransformerConfig, fsdp: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree matching ``transformer.init_params`` output."""
    specs: Dict[str, Any] = {
        "embed": P("tp", "fsdp" if fsdp else None),
        "layers": _layer_specs(config, fsdp),
        "final_norm": P(None),
    }
    if config.use_bias:
        specs["final_norm_bias"] = P(None)
    if config.learned_pos_embeddings:
        specs["pos_embed"] = P(None, "fsdp" if fsdp else None)
    if not config.tie_word_embeddings:
        specs["lm_head"] = P("fsdp" if fsdp else None, "tp")
    return specs


def lora_specs(config: TransformerConfig, lora_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Specs for the LoRA tree: shard the same dims as the base projections.

    a: (L, d_in, r) — d_in follows the base kernel's input sharding;
    b: (L, r, d_out) — d_out follows the base kernel's output sharding.
    """
    out_tp = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    layers = {}
    for name in lora_tree["layers"]:
        if name in out_tp:
            layers[name] = {"a": P(None, None, None), "b": P(None, None, "tp")}
        else:  # o_proj / down_proj: input dim is tp-sharded
            layers[name] = {"a": P(None, "tp", None), "b": P(None, None, None)}
    return {"layers": layers}


def batch_spec() -> P:
    """Batches shard over both data axes."""
    return P(("dp", "fsdp"))


def constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_tree(tree, specs, mesh: Mesh):
    """Device-put a pytree according to a matching spec tree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree,
        specs,
        is_leaf=lambda x: x is None,
    )


def named_sharding_tree(specs, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda s: isinstance(s, P),
    )
