"""Ingest HuggingFace safetensors checkpoints into our parameter trees.

Replaces ``AutoModelForCausalLM.from_pretrained`` (main.py:142): reads a
*local* HF model directory (config.json + *.safetensors) and maps weights
into the stacked-layer pytree of models/transformer.py.  No network access —
gated-weight download is out of scope here; point ``--hf_weights`` at a
predownloaded directory.

Weight layout notes:
  - HF Linear stores [out, in]; our kernels are [in, out] -> transpose.
  - GPT-2 uses Conv1D ([in, out] already) and a fused c_attn -> split q/k/v.
  - Layers are stacked on a leading axis for ``lax.scan``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.models.config import TransformerConfig


def _load_safetensors(model_dir: str) -> Dict[str, np.ndarray]:
    try:
        from safetensors import safe_open
    except ImportError as e:
        raise ImportError("safetensors is required to load HF checkpoints") from e
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {model_dir}")
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def config_from_hf(model_dir: str) -> TransformerConfig:
    """Build our TransformerConfig from an HF config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "llama")
    if mt == "gpt2":
        return TransformerConfig(
            arch="gpt2",
            vocab_size=hf["vocab_size"],
            hidden_size=hf["n_embd"],
            num_layers=hf["n_layer"],
            num_heads=hf["n_head"],
            num_kv_heads=hf["n_head"],
            head_dim=hf["n_embd"] // hf["n_head"],
            intermediate_size=hf.get("n_inner") or 4 * hf["n_embd"],
            max_position_embeddings=hf["n_positions"],
            norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            tie_word_embeddings=True,
            learned_pos_embeddings=True,
            use_bias=True,
            hidden_act="gelu",
            lora_targets=("q_proj", "v_proj"),
        )
    arch = "gemma" if mt.startswith("gemma") else "llama"
    head_dim = hf.get("head_dim") or hf["hidden_size"] // hf["num_attention_heads"]
    # rope_scaling: Llama-3.1/3.2 ship {"rope_type": "llama3", ...} — HF
    # applies the inv_freq rescale at every position
    # (modeling_rope_utils.py), so it must be carried into the config
    rope_kw = {}
    rs = hf.get("rope_scaling") or {}
    if rs:
        rope_kw = dict(
            rope_scaling_type=rs.get("rope_type", rs.get("type")),
            rope_scaling_factor=float(rs.get("factor", 1.0)),
            rope_low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            rope_high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            rope_original_max_position=int(
                rs.get("original_max_position_embeddings", 8192)
            ),
        )
    return TransformerConfig(
        arch=arch,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=hf["num_attention_heads"],
        num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        head_dim=head_dim,
        intermediate_size=hf["intermediate_size"],
        max_position_embeddings=hf.get("max_position_embeddings", 8192),
        norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", arch == "gemma"),
        embed_scale=arch == "gemma",
        rmsnorm_unit_offset=arch == "gemma",
        hidden_act="gelu_tanh" if arch == "gemma" else "silu",
        **rope_kw,
    )


def load_hf_checkpoint(
    model_dir: str, dtype: str = "bfloat16"
) -> Tuple[Dict[str, Any], TransformerConfig]:
    """Load a local HF model directory -> (params, config)."""
    config = config_from_hf(model_dir).replace(dtype=dtype)
    t = _load_safetensors(model_dir)
    dt = jnp.dtype(dtype)
    L = config.num_layers

    def stack(fmt: str, transpose=False):
        mats = []
        for i in range(L):
            w = t[fmt.format(i=i)]
            mats.append(w.T if transpose else w)
        return jnp.asarray(np.stack(mats), dt)

    if config.arch in ("llama", "gemma"):
        prefix = "model"
        layers = {
            "attn_norm": stack(prefix + ".layers.{i}.input_layernorm.weight"),
            "q_proj": {"kernel": stack(prefix + ".layers.{i}.self_attn.q_proj.weight", True)},
            "k_proj": {"kernel": stack(prefix + ".layers.{i}.self_attn.k_proj.weight", True)},
            "v_proj": {"kernel": stack(prefix + ".layers.{i}.self_attn.v_proj.weight", True)},
            "o_proj": {"kernel": stack(prefix + ".layers.{i}.self_attn.o_proj.weight", True)},
            "mlp_norm": stack(prefix + ".layers.{i}.post_attention_layernorm.weight"),
            "gate_proj": {"kernel": stack(prefix + ".layers.{i}.mlp.gate_proj.weight", True)},
            "up_proj": {"kernel": stack(prefix + ".layers.{i}.mlp.up_proj.weight", True)},
            "down_proj": {"kernel": stack(prefix + ".layers.{i}.mlp.down_proj.weight", True)},
        }
        params: Dict[str, Any] = {
            "embed": jnp.asarray(t["model.embed_tokens.weight"], dt),
            "layers": layers,
            "final_norm": jnp.asarray(t["model.norm.weight"], dt),
        }
        if not config.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(t["lm_head.weight"].T, dt)
        return params, config

    # gpt2: fused qkv Conv1D ([in, 3*out]) and biases
    def stack_split_qkv(part: int, bias: bool):
        mats = []
        for i in range(L):
            key = f"h.{i}.attn.c_attn." + ("bias" if bias else "weight")
            w = t.get(key, t.get(f"transformer.{key}"))
            chunk = np.split(w, 3, axis=-1)[part]
            mats.append(chunk)
        return jnp.asarray(np.stack(mats), dt)

    def g(key):
        return t.get(key, t.get(f"transformer.{key}"))

    def stack_g(fmt):
        return jnp.asarray(np.stack([g(fmt.format(i=i)) for i in range(L)]), dt)

    layers = {
        "attn_norm": stack_g("h.{i}.ln_1.weight"),
        "attn_norm_bias": stack_g("h.{i}.ln_1.bias"),
        "q_proj": {"kernel": stack_split_qkv(0, False), "bias": stack_split_qkv(0, True)},
        "k_proj": {"kernel": stack_split_qkv(1, False), "bias": stack_split_qkv(1, True)},
        "v_proj": {"kernel": stack_split_qkv(2, False), "bias": stack_split_qkv(2, True)},
        "o_proj": {
            "kernel": stack_g("h.{i}.attn.c_proj.weight"),
            "bias": stack_g("h.{i}.attn.c_proj.bias"),
        },
        "mlp_norm": stack_g("h.{i}.ln_2.weight"),
        "mlp_norm_bias": stack_g("h.{i}.ln_2.bias"),
        "up_proj": {
            "kernel": stack_g("h.{i}.mlp.c_fc.weight"),
            "bias": stack_g("h.{i}.mlp.c_fc.bias"),
        },
        "down_proj": {
            "kernel": stack_g("h.{i}.mlp.c_proj.weight"),
            "bias": stack_g("h.{i}.mlp.c_proj.bias"),
        },
    }
    params = {
        "embed": jnp.asarray(g("wte.weight"), dt),
        "pos_embed": jnp.asarray(g("wpe.weight"), dt),
        "layers": layers,
        "final_norm": jnp.asarray(g("ln_f.weight"), dt),
        "final_norm_bias": jnp.asarray(g("ln_f.bias"), dt),
    }
    return params, config
