"""Functional causal-LM transformer covering Llama-3.2 / Gemma / GPT-2.

Pure-function design: parameters are a pytree of arrays with layers stacked
on a leading axis and the forward pass a ``lax.scan`` over them — one
compiled layer body regardless of depth, cheap rematerialization, and
shardings annotate the stacked arrays directly (parallel/sharding.py).

Replaces the reference's use of HF ``AutoModelForCausalLM`` (main.py:141-142)
plus its vendored transformers fork.  Matches the HF semantics the reference
depends on: left-pad attention masking with explicit ``position_ids``
(data_loader.py:26-31), labels with ``-100`` ignore (shift-by-one causal
loss), ``resize_token_embeddings`` with mean-init rows (main.py:144-151),
and an eager attention path that returns per-layer attention maps for
interpret mode (models/llm.py:12-23).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.models.config import TransformerConfig
from ecg_byte_tpu.ops.attention import causal_attention, decode_attention

Params = Dict[str, Any]


def _dtype(config: TransformerConfig):
    return jnp.dtype(config.dtype)


# ---------------------------------------------------------------------------
# Initialization


def init_params(config: TransformerConfig, rng: jax.Array) -> Params:
    """Random-init parameter tree (normal(0.02) dense init, ones norms)."""
    dt = _dtype(config)
    c = config
    keys = jax.random.split(rng, 16)

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dt)

    L = c.num_layers
    layers: Params = {
        "attn_norm": jnp.ones((L, c.hidden_size), dt),
        "q_proj": {"kernel": dense(keys[0], (L, c.hidden_size, c.qkv_dim))},
        "k_proj": {"kernel": dense(keys[1], (L, c.hidden_size, c.kv_dim))},
        "v_proj": {"kernel": dense(keys[2], (L, c.hidden_size, c.kv_dim))},
        "o_proj": {"kernel": dense(keys[3], (L, c.qkv_dim, c.hidden_size))},
        "mlp_norm": jnp.ones((L, c.hidden_size), dt),
        "up_proj": {"kernel": dense(keys[4], (L, c.hidden_size, c.intermediate_size))},
        "down_proj": {"kernel": dense(keys[5], (L, c.intermediate_size, c.hidden_size))},
    }
    if c.hidden_act in ("silu", "gelu_tanh"):  # gated MLP (llama / gemma)
        layers["gate_proj"] = {
            "kernel": dense(keys[6], (L, c.hidden_size, c.intermediate_size))
        }
    if c.use_bias:
        for name, out_dim in (
            ("q_proj", c.qkv_dim),
            ("k_proj", c.kv_dim),
            ("v_proj", c.kv_dim),
            ("o_proj", c.hidden_size),
            ("up_proj", c.intermediate_size),
            ("down_proj", c.hidden_size),
        ):
            layers[name]["bias"] = jnp.zeros((L, out_dim), dt)
        layers["attn_norm_bias"] = jnp.zeros((L, c.hidden_size), dt)
        layers["mlp_norm_bias"] = jnp.zeros((L, c.hidden_size), dt)

    params: Params = {
        "embed": dense(keys[7], (c.vocab_size, c.hidden_size)),
        "layers": layers,
        "final_norm": jnp.ones((c.hidden_size,), dt),
    }
    if c.use_bias:
        params["final_norm_bias"] = jnp.zeros((c.hidden_size,), dt)
    if c.learned_pos_embeddings:
        params["pos_embed"] = dense(keys[8], (c.max_position_embeddings, c.hidden_size))
    if not c.tie_word_embeddings:
        params["lm_head"] = dense(keys[9], (c.hidden_size, c.vocab_size))
    return params


def resize_embeddings(
    params: Params, config: TransformerConfig, new_vocab_size: int
) -> Tuple[Params, TransformerConfig]:
    """Grow the embedding (and untied head) to ``new_vocab_size``.

    New rows are initialized to the mean of existing rows, matching HF
    ``resize_token_embeddings`` mean-resizing (main.py:151 usage).
    """
    old = params["embed"]
    n_new = new_vocab_size - old.shape[0]
    if n_new <= 0:
        return params, config
    mean_row = jnp.mean(old.astype(jnp.float32), axis=0, keepdims=True)
    new_rows = jnp.broadcast_to(mean_row, (n_new, old.shape[1])).astype(old.dtype)
    params = dict(params)
    params["embed"] = jnp.concatenate([old, new_rows], axis=0)
    if "lm_head" in params:
        head = params["lm_head"]
        mean_col = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
        new_cols = jnp.broadcast_to(mean_col, (head.shape[0], n_new)).astype(head.dtype)
        params["lm_head"] = jnp.concatenate([head, new_cols], axis=1)
    return params, config.replace(vocab_size=new_vocab_size)


# ---------------------------------------------------------------------------
# Building blocks


def _slim(x):
    """Tag a value as NOT-saved under the ``remat="slim"`` policy.

    Tagged tensors are the f32/wide intermediates whose backward
    recompute is pure VPU work (norm scaling, rope rotation, silu
    product, dropout masking): cheap to replay, expensive to keep —
    at 4x1024 they are ~7 GB of the remat=False residual set, the
    difference between fitting HBM and a compile-time OOM on tighter
    chip sessions."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "ecg_slim")


def _norm_scale(x, config: TransformerConfig):
    """Per-row RMSNorm scale (B, S, 1) f32 for the norm-folded path."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), -1, keepdims=True)
    return jax.lax.rsqrt(var + config.norm_eps)


def fold_norm_scales(params: Params, config: TransformerConfig):
    """Fold RMSNorm per-feature weights into the projection kernels.

    ``RMSNorm(x) @ W == s * (x @ (w[:, None] * W))`` where
    ``s = rsqrt(mean(x^2) + eps)`` is per-row: the row scale commutes
    through the contraction, and the per-feature weight ``w`` folds into
    the kernel's input rows.  With the fold applied (and blocks running
    the ``config.norm_folded`` path) the normalized (B, S, D) tensor —
    and its f32 backward chain of reductions/broadcasts — never exists;
    measured ~14 ms of a 219 ms flagship train step (TRAINPERF round 4b).

    Returns ``(params', config')``.  Only valid for RMSNorm archs (llama/
    gemma); a gpt2 config is returned unchanged.  The folded tree keeps
    the ORIGINAL norm weights under ``attn_norm_w``/``mlp_norm_w`` (the
    LoRA A-projections fold them in per step — a (D, r) elementwise, so
    adapters still see exactly the normalized input and remain
    value-compatible with unfolded checkpoints), and sets the norm
    entries themselves to the identity so any classic-path consumer of
    the folded tree computes the same function.  This is a LOAD-TIME
    transform for a frozen base (PEFT training / serving): persist the
    original tree, not the folded one.
    """
    if config.arch == "gpt2" or config.norm_folded:
        return params, config

    def w_of(norm_w):
        w = norm_w.astype(jnp.float32)
        return (1.0 + w) if config.rmsnorm_unit_offset else w

    ident = 0.0 if config.rmsnorm_unit_offset else 1.0
    layers = dict(params["layers"])

    def fold(kernel_holder, w):
        holder = dict(kernel_holder)
        kern = holder["kernel"]
        holder["kernel"] = (
            w[:, :, None] * kern.astype(jnp.float32)
        ).astype(kern.dtype)
        return holder

    w_attn = w_of(layers["attn_norm"])  # (L, D)
    for name in ("q_proj", "k_proj", "v_proj"):
        layers[name] = fold(layers[name], w_attn)
    w_mlp = w_of(layers["mlp_norm"])
    for name in ("gate_proj", "up_proj"):
        if name in layers:
            layers[name] = fold(layers[name], w_mlp)
    layers["attn_norm_w"] = w_attn.astype(layers["attn_norm"].dtype)
    layers["mlp_norm_w"] = w_mlp.astype(layers["mlp_norm"].dtype)
    layers["attn_norm"] = jnp.full_like(layers["attn_norm"], ident)
    layers["mlp_norm"] = jnp.full_like(layers["mlp_norm"], ident)

    out = dict(params)
    out["layers"] = layers
    if "lm_head" in out and not config.tie_word_embeddings:
        w_final = w_of(params["final_norm"])  # (D,)
        head = out["lm_head"]
        out["lm_head"] = (
            w_final[:, None] * head.astype(jnp.float32)
        ).astype(head.dtype)
        out["final_norm"] = jnp.full_like(params["final_norm"], ident)
    # tied embeddings: final_norm stays as-is and _unembed keeps the
    # classic norm — one materialized norm instead of 33
    return out, config.replace(norm_folded=True)


def _pallas_norm_wanted(x) -> bool:
    """Opt-in gate for the fused RMSNorm kernel (ops/rmsnorm.py).

    Training shapes only (>= 256 rows — decode's (B, 1, D) norms are
    glue, not bandwidth); TPU platform; ECG_BYTE_PALLAS_NORM=1.  Off by
    default because the win is remat-policy-dependent (measured on v5e,
    TRAINPERF round 5: ~7 ms/step better under "slim", neutral-to-worse
    under "dots" — numbers in the kernel module docstring), so
    bench_train autotunes (remat x norm) per session instead of hard
    defaulting; the env flag opts interactive paths in and keeps the A/B
    reproducible."""
    if os.environ.get("ECG_BYTE_PALLAS_NORM") != "1":
        return False
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    if rows < 256 or x.shape[-1] % 128:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _norm(x, weight, bias, config: TransformerConfig):
    eps = config.norm_eps
    if config.arch != "gpt2" and _pallas_norm_wanted(x):
        from ecg_byte_tpu.ops import rmsnorm as _rn

        w = weight.astype(jnp.float32)
        if config.rmsnorm_unit_offset:
            w = 1.0 + w
        return _slim(_rn.rmsnorm(x, w, eps))
    xf = x.astype(jnp.float32)
    if config.arch == "gpt2":  # LayerNorm
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
    else:  # RMSNorm
        var = jnp.mean(jnp.square(xf), -1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps)
        w = weight.astype(jnp.float32)
        if config.rmsnorm_unit_offset:  # gemma: scale by (1 + w)
            w = 1.0 + w
        y = y * w
    return _slim(y).astype(x.dtype)


def rope_inv_freq(config: TransformerConfig, d: int) -> np.ndarray:
    """Inverse RoPE frequencies with HF rope_scaling parity.

    Matches the reference fork's modeling_rope_utils.py:
    default (:56-68), 'linear' (:100-110), 'llama3' (:310-350 — the
    wavelength-banded rescale Llama-3.1/3.2 checkpoints require).  Computed
    in numpy so it constant-folds at trace time.
    """
    inv = 1.0 / (
        config.rope_theta ** (np.arange(0, d, 2, dtype=np.float32) / d)
    )
    t = config.rope_scaling_type
    if t in (None, "default"):
        return inv
    if t == "linear":
        return inv / config.rope_scaling_factor
    if t == "llama3":
        factor = config.rope_scaling_factor
        low = config.rope_low_freq_factor
        high = config.rope_high_freq_factor
        old_len = config.rope_original_max_position
        low_wavelen = old_len / low
        high_wavelen = old_len / high
        wavelen = 2 * np.pi / inv
        # long wavelengths (low freq): divide by factor; short: unchanged
        inv_l = np.where(wavelen > low_wavelen, inv / factor, inv)
        # medium band: smooth interpolation between the two
        smooth = (old_len / wavelen - low) / (high - low)
        smoothed = (1 - smooth) * inv_l / factor + smooth * inv_l
        is_medium = (wavelen >= high_wavelen) & (wavelen <= low_wavelen)
        return np.where(is_medium, smoothed, inv_l).astype(np.float32)
    raise NotImplementedError(f"rope_scaling type {t!r}")


def _rope_tables(positions: jax.Array, config: TransformerConfig, d: int):
    """cos/sin tables (B, S, 1, D/2) f32 for :func:`_apply_rope`.

    Hoisted out of the layer scan: the tables depend only on positions, so
    computing them once per forward (instead of per layer inside the scan
    body, where remat recomputes them again on backward) removes 2L
    cos/sin passes per step."""
    inv_freq = rope_inv_freq(config, d)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, S, D/2)
    return jnp.cos(angles)[:, :, None, :], jnp.sin(angles)[:, :, None, :]


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotary embedding, HF rotate-half convention.  x: (B, S, H, D)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return _slim(out).astype(x.dtype)


def _rope(x: jax.Array, positions: jax.Array, config: TransformerConfig) -> jax.Array:
    """Rotary embedding from raw positions (one-shot convenience path)."""
    cos, sin = _rope_tables(positions, config, x.shape[-1])
    return _apply_rope(x, cos, sin)


def _act(x, kind: str):
    if kind == "silu":
        return jax.nn.silu(x)
    # gemma 'gelu_tanh' and gpt2 'gelu_new' are both tanh-approximated gelu
    return jax.nn.gelu(x, approximate=True)


def _kernel_matmul(x, p):
    """``x @ kernel``, transparently consuming int8 serving entries.

    ``models/quantized.py`` trees carry ``kernel_q`` (int8) +
    ``kernel_scale`` instead of ``kernel``; the dequant multiply fuses
    into the dot's operand read so only int8 bytes stream from HBM —
    the point of the weight-only decode mode.
    """
    if "kernel_q" in p:
        # scale AFTER the dot: int8 values are bf16-exact, so the matmul
        # accumulates the exact integer products in f32 and the
        # per-output-channel scale applies once per output element —
        # better numerics than rounding q*scale into bf16 weights, and a
        # cheaper fused epilogue
        return (x @ p["kernel_q"].astype(x.dtype)) * p["kernel_scale"]
    return x @ p["kernel"]


def _proj(x, layer_p, name, lora_p, config: TransformerConfig, dropout_rng,
          post_scale=None, fold_w=None):
    """Dense projection with optional LoRA overlay (models/lora.py trees).

    ``post_scale``/``fold_w``: norm-folded path, see :func:`_proj_group`.
    """
    p = layer_p[name]
    y = _kernel_matmul(x, p)
    if post_scale is not None:
        y = _slim(y * post_scale.astype(y.dtype))
    if "bias" in p:
        y = y + p["bias"]
    if lora_p is not None and name in lora_p:
        a, b = lora_p[name]["a"], lora_p[name]["b"]  # (in, r), (r, out)
        if fold_w is not None:
            a = fold_w[:, None].astype(a.dtype) * a
        rate = config.lora_dropout
        style = getattr(config, "lora_dropout_style", "rank")
        if dropout_rng is None or rate <= 0.0:
            xa = x @ a
        elif style == "rank":
            # mask the r-dim adapter activations (config.py rationale):
            # the A-dot reads raw x and the mask is (B, S, r) — ~D/r
            # fewer random bits than input-style masking
            xa = x @ a
        else:  # "input": HF PEFT parity — mask the adapter input rows
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, hash(name) % (2**31)),
                1.0 - rate,
                x.shape,
            )
            xa = _slim(jnp.where(keep, x / (1.0 - rate), 0.0)) @ a
        if post_scale is not None:
            xa = _slim(xa * post_scale.astype(xa.dtype))
        if dropout_rng is not None and rate > 0.0 and style == "rank":
            xa = _rank_dropout(xa, config, dropout_rng, name)
        y = y + (xa @ b) * (config.lora_alpha / config.lora_rank)
    return y


def _rank_dropout(xa, config: TransformerConfig, dropout_rng, salt: str):
    """Inverted dropout on the (B, S, r)-shaped adapter activations."""
    rate = config.lora_dropout
    keep = jax.random.bernoulli(
        jax.random.fold_in(dropout_rng, hash(salt) % (2**31)),
        1.0 - rate,
        xa.shape,
    )
    return jnp.where(keep, xa / (1.0 - rate), 0.0)


def _lora_dropout(x, config: TransformerConfig, dropout_rng, salt: str):
    """Inverted-dropout input for the adapter branch (PEFT lora_dropout)."""
    rate = config.lora_dropout
    if dropout_rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(
        jax.random.fold_in(dropout_rng, hash(salt) % (2**31)), 1.0 - rate,
        x.shape,
    )
    return _slim(jnp.where(keep, x / (1.0 - rate), 0.0))


def _proj_group(x, layer_p, names, lora_p, config: TransformerConfig,
                dropout_rng, post_scale=None, fold_w=None):
    """Dense projections sharing input ``x``, LoRA A-sides fused.

    The base matmuls stay separate (XLA runs them back-to-back at full MXU
    rate — merging measured neutral), but the adapter A-projections fuse
    into ONE (B,S,D) @ (D, len(names)*r) matmul: at r=16 each separate
    x@a runs a 16-wide MXU tile (~12% utilization) and re-reads x from
    HBM, which measurably taxes the step.  The fused group shares one
    dropout mask across its adapters (vs per-projection masks in HF PEFT
    — an intentional, documented deviation; masks stay independent across
    groups and layers-via-rng-fold are unchanged).

    Norm-folded path (``post_scale``/``fold_w`` set, see
    :func:`fold_norm_scales`): ``x`` is the RAW residual stream; the
    per-row rsqrt scale multiplies each dot's OUTPUT (a fused epilogue)
    and the norm's per-feature weight — already folded into the frozen
    base kernels — folds into the adapter A at (D, r) cost, so adapters
    see exactly the normalized input.
    """
    outs = []
    use_lora = lora_p is not None and all(n in lora_p for n in names)
    if use_lora:
        a_cat = jnp.concatenate([lora_p[n]["a"] for n in names], axis=-1)
        if fold_w is not None:
            a_cat = fold_w[:, None].astype(a_cat.dtype) * a_cat
        style = getattr(config, "lora_dropout_style", "rank")
        if style == "rank":
            # raw x feeds the fused A-dot; the (B, S, len*r) mask is
            # per-feature, so adapters stay independently masked
            xa = x @ a_cat
            if post_scale is not None:
                xa = _slim(xa * post_scale.astype(xa.dtype))
            if dropout_rng is not None and config.lora_dropout > 0.0:
                xa = _rank_dropout(xa, config, dropout_rng, "/".join(names))
        else:
            xin = _lora_dropout(x, config, dropout_rng, "/".join(names))
            xa = xin @ a_cat  # (B, S, len(names)*r)
            if post_scale is not None:
                xa = _slim(xa * post_scale.astype(xa.dtype))
        r = config.lora_rank
        scale = config.lora_alpha / config.lora_rank
    for i, name in enumerate(names):
        p = layer_p[name]
        y = _kernel_matmul(x, p)
        if post_scale is not None:
            # tag the scaled copy: under remat="slim" only the dot output
            # is saved; the replay is one VPU multiply
            y = _slim(y * post_scale.astype(y.dtype))
        if "bias" in p:
            y = y + p["bias"]
        if use_lora:
            y = y + (xa[..., i * r : (i + 1) * r] @ lora_p[name]["b"]) * scale
        elif lora_p is not None and name in lora_p:
            y = _proj(x, layer_p, name, lora_p, config, dropout_rng)
        outs.append(y)
    return outs


AttnFn = Callable[[jax.Array, jax.Array, jax.Array], Tuple[jax.Array, Any]]


def _block(
    config: TransformerConfig,
    h: jax.Array,
    layer_p: Params,
    lora_p: Optional[Params],
    rope: Optional[Tuple[jax.Array, jax.Array]],
    attn_fn: AttnFn,
    dropout_rng=None,
) -> Tuple[jax.Array, Any]:
    """One transformer block with a pluggable attention core.

    ``rope``: precomputed (cos, sin) tables from :func:`_rope_tables`
    (None for learned-position models) — shared across layers so the scan
    body never recomputes them.
    ``attn_fn(q, k, v) -> (attn_out (B,S,H,D), aux)`` — the caller decides
    whether that's flash attention, eager with probabilities, or KV-cache
    decode attention (and threads cache state through ``aux``).
    """
    c = config
    b, s, _ = h.shape
    folded = c.norm_folded and "attn_norm_w" in layer_p

    if folded:
        # fold_norm_scales path: raw h feeds the dots, the per-row rsqrt
        # scale applies post-dot, and the normalized (B, S, D) tensor —
        # plus its f32 backward chain — never materializes
        q, k, v = _proj_group(
            h, layer_p, ("q_proj", "k_proj", "v_proj"), lora_p, c,
            dropout_rng, post_scale=_norm_scale(h, c),
            fold_w=layer_p["attn_norm_w"],
        )
    else:
        hn = _norm(h, layer_p["attn_norm"], layer_p.get("attn_norm_bias"), c)
        q, k, v = _proj_group(
            hn, layer_p, ("q_proj", "k_proj", "v_proj"), lora_p, c,
            dropout_rng
        )
    q = q.reshape(b, s, c.num_heads, c.head_dim)
    k = k.reshape(b, s, c.num_kv_heads, c.head_dim)
    v = v.reshape(b, s, c.num_kv_heads, c.head_dim)
    if rope is not None:
        q = _apply_rope(q, *rope)
        k = _apply_rope(k, *rope)
    attn, aux = attn_fn(q, k, v)
    attn = attn.reshape(b, s, c.qkv_dim)
    h = h + _proj(attn, layer_p, "o_proj", lora_p, c, dropout_rng)

    if folded:
        gate, up = _proj_group(
            h, layer_p, ("gate_proj", "up_proj"), lora_p, c, dropout_rng,
            post_scale=_norm_scale(h, c), fold_w=layer_p["mlp_norm_w"],
        )
        inner = _slim(_act(gate, c.hidden_act) * up)
    else:
        hn = _norm(h, layer_p["mlp_norm"], layer_p.get("mlp_norm_bias"), c)
        if "gate_proj" in layer_p:
            gate, up = _proj_group(
                hn, layer_p, ("gate_proj", "up_proj"), lora_p, c, dropout_rng
            )
            inner = _slim(_act(gate, c.hidden_act) * up)
        else:
            up = _proj(hn, layer_p, "up_proj", lora_p, c, dropout_rng)
            inner = _act(up, c.hidden_act)
    h = h + _proj(inner, layer_p, "down_proj", lora_p, c, dropout_rng)
    return h, aux


def _dots_policy():
    """The tuned ``remat="dots"`` save policy (flagship-profiled on v5e).

    Three refinements over stock ``dots_with_no_batch_dims_saveable``,
    each worth real step time at the 4x1024 flagship shape:

    - dots with a NARROW contraction (K <= 32) are NOT saved: those are
      the rank-16 LoRA B-dot deltas, whose (B, S, N) outputs are as wide
      as the base projections (2 x 67 MB per layer for gate/up) but cost
      ~0.2 ms/step total to recompute from the saved (B, S, r) A-dot
      outputs — dropping their save/restore DUS traffic measured
      206.6 -> 195.0 ms/step;
    - the resident attention kernel's named residual ("ecg_attn",
      ops/attention_resident._resident_fwd) IS saved: a pallas_call is
      not a dot_general, so the unnamed policy replayed every layer's
      attention forward in the backward (-3 ms);
    - everything else follows the stock dots heuristic (wide base
      projections saved — excluding them and recomputing was measured
      NET NEGATIVE: recompute 25 ms > copies saved, TRAINPERF round 4c).
    """

    def dots_k_gt32(prim, *args, **params):
        if prim is jax.lax.dot_general_p:
            (lc, _), (lb, rb) = params["dimension_numbers"]
            if lb or rb:
                return False
            lhs = args[0]
            k = 1
            for i in lc:
                k *= lhs.shape[i]
            return k > 32
        return False

    return jax.checkpoint_policies.save_from_both_policies(
        dots_k_gt32,
        jax.checkpoint_policies.save_only_these_names("ecg_attn"),
    )


def _scan_layers(
    config: TransformerConfig,
    h: jax.Array,
    params: Params,
    lora: Optional[Params],
    layer_step,  # (h, layer_p, lora_p, extra_xs) -> (h, ys)
    extra_xs=None,  # optional pytree with leading layer axis
    remat=False,
    unroll=1,
):
    """Scan ``layer_step`` over the stacked layer axis.

    ``remat`` selects what the backward pass may read from the forward:
      - ``False``: save everything (OOMs at training sizes — the scan then
        keeps every layer's f32 attention logits, 8 GB at 4x1024x16L);
      - ``True``/``"full"``: save only layer boundaries, recompute the whole
        block (the classic remat: +2·N_mm flops on backward);
      - ``"dots"``: save matmul outputs, recompute elementwise + attention
        softmax (``dots_with_no_batch_dims_saveable``).  The recompute is
        only the S^2 attention einsums + VPU glue (~6% of layer flops at
        S=1024) while the saved set stays O(B·S·D) per layer — measured
        ~17% faster than full remat at 4x1024 on v5e, and it is the only
        mode that both fits HBM and skips the forward replay.
    """
    layers = params["layers"]
    lora_layers = lora["layers"] if lora is not None else None
    have_lora = lora_layers is not None
    have_extra = extra_xs is not None

    xs = (layers,)
    if have_lora:
        xs = xs + (lora_layers,)
    if have_extra:
        xs = xs + (extra_xs,)

    def body(carry, packed):
        idx = 1
        layer_p = packed[0]
        lora_p = packed[idx] if have_lora else None
        idx += int(have_lora)
        extra = packed[idx] if have_extra else None
        return layer_step(carry, layer_p, lora_p, extra)

    if remat == "dots":
        body = jax.checkpoint(body, policy=_dots_policy())
    elif remat == "slim":
        # save everything EXCEPT the _slim-tagged f32/wide elementwise
        # results (norm scaling, rope rotation, silu product, masked
        # adapter inputs).  Their replay is pure VPU work with no matmul
        # recompute — remat=False speed at ~7 GB less residual memory,
        # so the full-save step fits HBM on every chip session.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "ecg_slim"
            ),
        )
    elif remat:
        body = jax.checkpoint(body)
    # ``unroll=True`` (training steps) removes the scan's residual-stacking
    # machinery: under a per-layer jax.checkpoint the rolled scan must
    # dynamic-update-slice every saved dot into (L, B, S, N) stacks on the
    # forward and dynamic-slice them back on the backward — measured
    # 53 ms/step of DUS/DS traffic at the flagship 4x1024 on v5e, 7.3 ms
    # of it exposed (195.4 -> 188.1 ms/step) even after overlap.  Unrolled,
    # each layer's residuals are plain buffers the consumer reads in
    # place.  The price is compile time (L bodies instead of one), so the
    # default stays rolled for interactive paths (decode/eval/interpret).
    return jax.lax.scan(body, h, xs, unroll=unroll)


def _embed(params, config: TransformerConfig, input_ids, positions):
    h = jnp.take(params["embed"], input_ids, axis=0)
    if config.embed_scale:
        h = h * jnp.asarray(np.sqrt(config.hidden_size), h.dtype)
    if config.learned_pos_embeddings:
        h = h + jnp.take(params["pos_embed"], positions, axis=0)
    return h


def _inputs_to_hidden(params, config, input_ids, position_ids, inputs_embeds):
    if inputs_embeds is None:
        return _embed(params, config, input_ids, position_ids)
    h = inputs_embeds.astype(_dtype(config))
    if config.embed_scale:
        h = h * jnp.asarray(np.sqrt(config.hidden_size), h.dtype)
    if config.learned_pos_embeddings:
        h = h + jnp.take(params["pos_embed"], position_ids, axis=0)
    return h


def _unembed(params, config: TransformerConfig, h):
    hn = _norm(h, params["final_norm"], params.get("final_norm_bias"), config)
    if "lm_head_q" in params:  # int8 serving copy (models/quantized.py)
        logits = (
            hn @ params["lm_head_q"].astype(hn.dtype)
        ) * params["lm_head_scale"]
    elif config.tie_word_embeddings:
        logits = hn @ params["embed"].T
    else:
        logits = hn @ params["lm_head"]
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Public forward / loss


def make_position_ids(attn_mask: jax.Array) -> jax.Array:
    """cumsum-over-valid minus one, pads pinned to 0 (data_loader.py:26-31)."""
    mask = attn_mask.astype(jnp.int32)
    pos = jnp.cumsum(mask, axis=-1) - 1
    return jnp.where(mask == 0, 0, pos)


def forward(
    params: Params,
    config: TransformerConfig,
    input_ids: Optional[jax.Array],
    attn_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    *,
    lora: Optional[Params] = None,
    inputs_embeds: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
    return_attentions: bool = False,
    remat="dots",
    return_hidden: bool = False,
    scan_unroll=1,
):
    """Causal LM forward pass -> float32 logits (B, S, V).

    ``return_hidden=True`` returns the pre-final-norm hidden states
    instead of logits (for :func:`chunked_lm_loss`).

    ``attn_mask``: (B, S) 1/0 validity (pads are 0, data_loader.py:22-23).
    ``position_ids``: (B, S); defaults to the reference's cumsum convention.
    ``inputs_embeds``: optional (B, S, D) replacing the embedding lookup —
    the two-stage fusion path (models/llm.py:71-76).
    ``return_attentions``: eager path; also returns (L, B, H, S, S) probs.
    """
    c = config
    if attn_mask is None:
        shape = input_ids.shape if input_ids is not None else inputs_embeds.shape[:2]
        attn_mask = jnp.ones(shape, jnp.int32)
    if position_ids is None:
        position_ids = make_position_ids(attn_mask)
    h = _inputs_to_hidden(params, c, input_ids, position_ids, inputs_embeds)
    rope = (
        None if c.learned_pos_embeddings
        else _rope_tables(position_ids, c, c.head_dim)
    )

    if return_attentions:
        all_probs = []
        for i in range(c.num_layers):
            layer_p = jax.tree.map(lambda x: x[i], params["layers"])
            lora_p = (
                jax.tree.map(lambda x: x[i], lora["layers"])
                if lora is not None
                else None
            )

            def attn_fn(q, k, v):
                return causal_attention(q, k, v, attn_mask, return_probs=True)

            h, probs = _block(c, h, layer_p, lora_p, rope, attn_fn)
            all_probs.append(probs)
        return _unembed(params, c, h), jnp.stack(all_probs)

    def layer_step(h, layer_p, lora_p, _):
        def attn_fn(q, k, v):
            return causal_attention(q, k, v, attn_mask)

        h, _aux = _block(
            c, h, layer_p, lora_p, rope, attn_fn, dropout_rng
        )
        return h, None

    h, _ = _scan_layers(
        c, h, params, lora, layer_step, remat=remat, unroll=scan_unroll
    )
    if return_hidden:
        return h
    return _unembed(params, c, h)


def mean_attention(
    params: Params,
    config: TransformerConfig,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    *,
    lora: Optional[Params] = None,
) -> jax.Array:
    """Layer+head-averaged attention probabilities (B, S, S), streamed.

    The eager path (``forward(return_attentions=True)``) materializes the
    full (L, B, H, S, S) stack — ~4.3 GB bf16 at S=2050/H=32/L=16 —
    mirroring the reference's OOM-prone eager capture
    (runners/interpret.py:53).  The interpret runner only consumes the
    layer+head mean, so this accumulates that mean inside the layer scan:
    each layer's probabilities live and die within its own scan step,
    cutting interpret memory by ~L× and keeping one compiled layer body.
    Numerically identical to ``stack.mean(axis=(0, 2))`` (f32 accumulate;
    regression-tested in tests/test_interpret.py).
    """
    c = config
    if attn_mask is None:
        attn_mask = jnp.ones(input_ids.shape, jnp.int32)
    if position_ids is None:
        position_ids = make_position_ids(attn_mask)
    h = _inputs_to_hidden(params, c, input_ids, position_ids, None)
    b, s = input_ids.shape
    rope = (
        None if c.learned_pos_embeddings
        else _rope_tables(position_ids, c, c.head_dim)
    )

    def layer_step(carry, layer_p, lora_p, _):
        h, acc = carry

        def attn_fn(q, k, v):
            return causal_attention(q, k, v, attn_mask, return_probs=True)

        h2, probs = _block(c, h, layer_p, lora_p, rope, attn_fn)
        return (h2, acc + jnp.mean(probs.astype(jnp.float32), axis=1)), None

    acc0 = jnp.zeros((b, s, s), jnp.float32)
    (_, acc), _ = _scan_layers(c, (h, acc0), params, lora, layer_step)
    return acc / c.num_layers


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """HF CausalLM loss: shift-by-one cross entropy, -100 ignored, mean."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(valid, -token_ll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


@jax.custom_vjp
def _dense_ce(h2, head, shift_labels):
    """Mean CE over valid rows of (h2 @ head); -100 labels ignored.

    Forward math matches :func:`causal_lm_loss` (f32 logits + logsumexp).
    The custom backward recomputes softmax from the saved f32 logits and
    writes the dlogits cotangent in bf16 before the dX matmul — XLA's
    autodiff keeps softmax + dlogits in f32, which makes the loss backward
    HBM-bound (measured 31.1 -> ~18 ms at 4x1024x132k on v5e).  Gradient
    intermediates lose only bf16 rounding; the loss VALUE is bit-identical
    to the autodiff path.
    """
    loss, _ = _dense_ce_fwd_impl(h2, head, shift_labels)
    return loss


def _dense_ce_fwd_impl(h2, head, shift_labels):
    logits = (h2 @ head).astype(jnp.float32)  # (M, V)
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    m = jnp.max(logits, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
    lab = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    count = jnp.maximum(jnp.sum(valid), 1)
    loss = jnp.sum(jnp.where(valid, lse - lab, 0.0)) / count
    # the (M, V) residual rides to the backward as CENTERED bf16 logits
    # (logits - lse): at 4x1024x132k that halves a 2.2 GB f32 buffer.
    # Centering puts bf16's precision where the probability mass is —
    # entries near 0 (high prob) carry ~2^-9 absolute error, far-negative
    # entries only mis-round vanishing probs — so the backward's
    # probs = exp(centered) match f32 to ~0.2% where it matters, and
    # dlogits are cast to bf16 downstream anyway.  Loss VALUE stays
    # f32-exact.
    centered = (logits - lse[:, None]).astype(jnp.bfloat16)
    return loss, (h2, head, centered, safe, valid, count)


def _dense_ce_fwd(h2, head, shift_labels):
    return _dense_ce_fwd_impl(h2, head, shift_labels)


def _dense_ce_bwd(res, gbar):
    h2, head, centered, safe, valid, count = res
    v = centered.shape[1]
    probs = jnp.exp(centered.astype(jnp.float32))
    onehot = (
        jnp.arange(v, dtype=safe.dtype)[None, :] == safe[:, None]
    ).astype(jnp.float32)
    coeff = jnp.where(valid, gbar / count.astype(jnp.float32), 0.0)
    dlogits = ((probs - onehot) * coeff[:, None]).astype(h2.dtype)
    dh2 = dlogits @ head.T
    dhead = h2.T @ dlogits  # DCE'd when the head is frozen (PEFT)
    return dh2, dhead, np.zeros(safe.shape, jax.dtypes.float0)


_dense_ce.defvjp(_dense_ce_fwd, _dense_ce_bwd)


def lm_loss_from_hidden(
    params: Params,
    config: TransformerConfig,
    hidden: jax.Array,
    labels: jax.Array,
) -> jax.Array:
    """Dense HF CausalLM loss from pre-final-norm hidden states.

    Same value as ``causal_lm_loss(_unembed(hidden), labels)`` with the
    fused bf16 backward of :func:`_dense_ce` (final-norm grads still flow
    through regular autodiff)."""
    c = config
    hn = _norm(hidden, params["final_norm"], params.get("final_norm_bias"), c)
    head = params["embed"].T if c.tie_word_embeddings else params["lm_head"]
    b, s, d = hn.shape
    h2 = hn[:, :-1].reshape(-1, d)
    shift_labels = labels[:, 1:].reshape(-1)
    return _dense_ce(h2, head, shift_labels)


def chunked_lm_loss(
    params: Params,
    config: TransformerConfig,
    hidden: jax.Array,
    labels: jax.Array,
    chunk: int = 8192,
    mesh=None,
) -> jax.Array:
    """Cross-entropy without materializing the (B, S, V) logits.

    The unembed of a 132k-token vocabulary dominates training memory: at
    batch 8 x 1024 the f32 logits plus their softmax intermediates are
    >8 GB.  This computes the same loss from the final hidden states by
    scanning vocab tiles — per tile one (B*S, D) @ (D, chunk) matmul, a
    running online logsumexp, and the label logit picked by an in-range
    mask — so peak memory is O(B*S*chunk).  Numerically identical to
    ``causal_lm_loss(_unembed(h), labels)`` up to f32 logsumexp rounding
    (parity-tested).

    ``hidden``: (B, S, D) pre-final-norm hidden states (as ``forward``
    produces before ``_unembed``).
    """
    c = config
    hn = _norm(hidden, params["final_norm"], params.get("final_norm_bias"), c)
    head = params["embed"].T if c.tie_word_embeddings else params["lm_head"]
    v = head.shape[1]
    n_chunks = -(-v // chunk)
    v_pad = n_chunks * chunk
    head = jnp.pad(head, ((0, 0), (0, v_pad - v)))

    b, s, d = hn.shape
    h2 = hn[:, :-1].reshape(-1, d)  # (M, D) shifted hidden rows
    shift_labels = labels[:, 1:].reshape(-1)
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)

    head_tiles = head.reshape(d, n_chunks, chunk).transpose(1, 0, 2)
    if mesh is not None and "tp" in mesh.shape:
        # shard each vocab tile's columns over tp (instead of letting GSPMD
        # all-gather the reshaped head): the per-tile matmul then runs on
        # V/tp-wide shards and the running max/sum row reductions become
        # small cross-tp collectives
        from jax.sharding import NamedSharding, PartitionSpec as P

        head_tiles = jax.lax.with_sharding_constraint(
            head_tiles, NamedSharding(mesh, P(None, None, "tp"))
        )

    def tile_step(carry, head_tile):
        m_run, l_run, lab_run, idx = carry
        logits = (h2 @ head_tile).astype(jnp.float32)  # (M, chunk)
        # mask vocab padding in the final tile
        col = idx * chunk + jnp.arange(chunk)[None, :]
        logits = jnp.where(col < v, logits, -jnp.inf)
        m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1))
        l_run = l_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        # label logit if it falls inside this tile
        local = safe - idx * chunk
        in_tile = (local >= 0) & (local < chunk)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local, 0, chunk - 1)[:, None], axis=-1
        )[:, 0]
        lab_run = jnp.where(in_tile, picked, lab_run)
        return (m_new, l_run, lab_run, idx + 1), None

    m0 = jnp.full((h2.shape[0],), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((h2.shape[0],), jnp.float32)
    lab0 = jnp.zeros((h2.shape[0],), jnp.float32)
    (m_fin, l_fin, lab_fin, _), _ = jax.lax.scan(
        jax.checkpoint(tile_step), (m0, l0, lab0, jnp.int32(0)), head_tiles
    )
    logz = m_fin + jnp.log(l_fin)
    nll = logz - lab_fin
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count


# ---------------------------------------------------------------------------
# KV-cache decode


def init_kv_cache(
    config: TransformerConfig, batch: int, max_len: int, dtype=None
) -> Params:
    """KV cache tree: ``{"k", "v"}`` of (L, B, S_max, KH, D).

    ``dtype=jnp.int8`` builds the QUANTIZED serving cache (beyond the
    reference's bf16 HF cache): K/V rows are stored int8 with a
    per-(position, kv-head) bf16 scale quantized at append time and
    folded back around the decode-attention dots, so only int8 KV bytes
    stream from HBM per decoded token (ops/attention.decode_attention).
    Prefill attention still reads the fresh bf16 prompt K/V — only the
    cache copy is quantized.  Opt-in via ``greedy_generate(int8_kv=...)``.
    """
    dt = dtype or _dtype(config)
    shape = (config.num_layers, batch, max_len, config.num_kv_heads, config.head_dim)
    cache = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    if dt == jnp.int8:
        # init scales to 1 (not 0): unfilled slots are masked in the
        # attention, but a 0-scale would still make 0 * -inf NaNs if a
        # backend reorders the mask-add
        cache["k_scale"] = jnp.ones(shape[:-1], jnp.bfloat16)
        cache["v_scale"] = jnp.ones(shape[:-1], jnp.bfloat16)
    return cache


def _cache_write(cache: jax.Array, new: jax.Array, idx) -> jax.Array:
    """Write (B, s, KH, D) at position idx along axis 1 of the cache."""
    return jax.lax.dynamic_update_slice(
        cache, new.astype(cache.dtype), (0, idx, 0, 0)
    )


def _quant_kv_rows(new: jax.Array):
    """(B, s, KH, D) -> (int8 rows, (B, s, KH) bf16 scales).

    Per-row symmetric absmax over D — each cached position/head keeps its
    own dynamic range, so the int8 error stays ~0.4% of that row's
    amplitude regardless of cross-position magnitude drift."""
    f = new.astype(jnp.float32)
    amax = jnp.max(jnp.abs(f), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(f / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.bfloat16)


def _scale_write(scales: jax.Array, new: jax.Array, idx) -> jax.Array:
    """Write (B, s, KH) scales at position idx along axis 1."""
    return jax.lax.dynamic_update_slice(
        scales, new.astype(scales.dtype), (0, idx, 0)
    )


def _append_kv(caches: Params, k: jax.Array, v: jax.Array, idx) -> Params:
    """Append fresh (B, s, KH, D) K/V rows at ``idx``, quantizing when the
    cache is the int8 serving layout."""
    out = dict(caches)
    if caches["k"].dtype == jnp.int8:
        kq, ks = _quant_kv_rows(k)
        vq, vs = _quant_kv_rows(v)
        out["k"] = _cache_write(caches["k"], kq, idx)
        out["v"] = _cache_write(caches["v"], vq, idx)
        out["k_scale"] = _scale_write(caches["k_scale"], ks, idx)
        out["v_scale"] = _scale_write(caches["v_scale"], vs, idx)
    else:
        out["k"] = _cache_write(caches["k"], k, idx)
        out["v"] = _cache_write(caches["v"], v, idx)
    return out


def prefill(
    params: Params,
    config: TransformerConfig,
    input_ids: Optional[jax.Array],
    attn_mask: jax.Array,
    cache: Params,
    *,
    lora: Optional[Params] = None,
    inputs_embeds: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
):
    """Run the prompt, filling cache slots [0, S).

    Returns (last-position logits (B, V), cache, next_positions (B,)).
    """
    c = config
    if position_ids is None:
        position_ids = make_position_ids(attn_mask)
    h = _inputs_to_hidden(params, c, input_ids, position_ids, inputs_embeds)
    rope = (
        None if c.learned_pos_embeddings
        else _rope_tables(position_ids, c, c.head_dim)
    )

    def step(h, layer_p, lora_p, caches):
        def attn_fn(q, k, v):
            # attention reads the fresh bf16 prompt K/V; only the cache
            # copy is (possibly int8-) quantized by _append_kv
            new_caches = _append_kv(caches, k, v, 0)
            out, _ = causal_attention(q, k, v, attn_mask)
            return out, new_caches

        return _block(c, h, layer_p, lora_p, rope, attn_fn)

    h, new_cache = _scan_layers(c, h, params, lora, step, extra_xs=cache)
    logits = _unembed(params, c, h[:, -1:])[:, 0]
    next_pos = jnp.max(make_position_ids(attn_mask), axis=-1) + 1
    return logits, new_cache, next_pos


def _fused_decode_attn_wanted(config: TransformerConfig, cache) -> bool:
    """Dispatch gate for the fused decode-attention kernel
    (ops/attention_decode.py): TPU platform, bf16 cache, lane-aligned cache
    shapes, ``ECG_BYTE_FUSED_DECODE_ATTN`` not set to "0".

    bf16-cache only by default: measured end-to-end on v5e (flagship
    Llama-3.2-1B decode, bench.py, 2026-08-19 same-session A/B) the fused
    kernel WINS for the bf16 cache — 286.6 vs 281.0 tok/s, fixed
    per-token cost 0.211 -> 0.155 ms — but LOSES for the int8 cache
    (504.6 vs 527.3 tok/s): the (S, H) f32 scale multiplies + in-kernel
    int8 conversion cost more than the ~70 kernel launches they replace
    (isolated 16-layer chain: 0.790 fused vs 0.691 ms XLA,
    scripts/hw_parity.py).  The int8 path keeps XLA; ``=force`` overrides.

    Single-device only by default: the sharded decode path
    (tensor-parallel params via GSPMD, __graft_entry__._dryrun_sharded_decode)
    goes through plain jit where an opaque pallas_call has no partitioning
    rule — GSPMD would replicate the full KV cache onto every chip.  Multi-
    chip serving keeps the XLA path; set ``ECG_BYTE_FUSED_DECODE_ATTN=force``
    to override (e.g. under an explicit shard_map)."""
    flag = os.environ.get("ECG_BYTE_FUSED_DECODE_ATTN", "1")
    if flag == "0":
        return False
    try:
        from ecg_byte_tpu.ops.attention_decode import supported
    except ImportError:
        return False
    if cache.get("k_scale") is not None and flag != "force":
        return False  # int8 cache: XLA path measured faster (see above)
    k = cache["k"]
    if not supported(None, k.shape[1], k.shape[3]):
        return False
    try:
        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
        return flag == "force" or jax.device_count() == 1
    except RuntimeError:
        return False


def decode_step(
    params: Params,
    config: TransformerConfig,
    token: jax.Array,  # (B,) int32
    positions: jax.Array,  # (B,) rope/absolute position of this token
    write_idx,  # int32 scalar: cache slot to write
    cache: Params,
    cache_mask: jax.Array,  # (B, S_max) valid cache slots incl. this one
    *,
    lora: Optional[Params] = None,
):
    """One decode step.  Returns (logits (B, V), new_cache)."""
    c = config
    pos2d = positions[:, None]
    h = _embed(params, c, token[:, None], pos2d)
    rope = (
        None if c.learned_pos_embeddings
        else _rope_tables(pos2d, c, c.head_dim)
    )

    use_fused = _fused_decode_attn_wanted(c, cache)

    def step(h, layer_p, lora_p, caches):
        def attn_fn(q, k, v):
            if use_fused:
                from ecg_byte_tpu.ops.attention_decode import (
                    decode_attention_fused,
                )

                # feed the kernel the STALE cache + this token's row; the
                # HBM append (dynamic-update-slice) then feeds only the
                # decode loop carry, never the kernel — the DUS->kernel
                # data edge measured ~80 us/layer of copy traffic on
                # GPT-2-XL shapes (scripts/gpt2_ablate.py).
                if caches["k"].dtype == jnp.int8:
                    kq, ks_row = _quant_kv_rows(k)
                    vq, vs_row = _quant_kv_rows(v)
                    new_caches = dict(caches)
                    new_caches["k"] = _cache_write(caches["k"], kq, write_idx)
                    new_caches["v"] = _cache_write(caches["v"], vq, write_idx)
                    new_caches["k_scale"] = _scale_write(
                        caches["k_scale"], ks_row, write_idx
                    )
                    new_caches["v_scale"] = _scale_write(
                        caches["v_scale"], vs_row, write_idx
                    )
                    out = decode_attention_fused(
                        q, caches["k"], caches["v"], cache_mask,
                        caches["k_scale"], caches["v_scale"],
                        fresh_k=kq, fresh_v=vq,
                        fresh_ks=ks_row, fresh_vs=vs_row,
                        write_idx=write_idx,
                    )
                else:
                    new_caches = _append_kv(caches, k, v, write_idx)
                    out = decode_attention_fused(
                        q, caches["k"], caches["v"], cache_mask,
                        fresh_k=k.astype(caches["k"].dtype),
                        fresh_v=v.astype(caches["v"].dtype),
                        write_idx=write_idx,
                    )
            else:
                new_caches = _append_kv(caches, k, v, write_idx)
                out = decode_attention(
                    q, new_caches["k"], new_caches["v"], cache_mask,
                    k_scale=new_caches.get("k_scale"),
                    v_scale=new_caches.get("v_scale"),
                )
            return out, new_caches

        return _block(c, h, layer_p, lora_p, rope, attn_fn)

    h, new_cache = _scan_layers(c, h, params, lora, step, extra_xs=cache)
    logits = _unembed(params, c, h)[:, 0]
    return logits, new_cache
