"""Attention ops: causal (left-pad aware) self-attention for train/interpret,
single-step decode attention over a KV cache.

Two execution paths mirror the reference's sdpa/eager split
(transformers modeling_llama.py:538-541 via SURVEY.md):

  - the fused path (default) never materializes probabilities: a Pallas
    flash-attention kernel on TPU when applicable, else an XLA softmax
    fusion;
  - the eager path returns per-head probabilities for interpret mode
    (runners/interpret.py:53 consumes layer-averaged attention maps).

Masking semantics match HF causal LMs with left padding: pad key positions
are excluded via the (B, S) validity mask, queries attend causally.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Grouped causal core with a hand-written backward.
#
# XLA's autodiff of the attention core keeps every (S, S) intermediate in
# f32 (recomputed probs, dP, dlogits), which makes the backward pass
# HBM-bound at ~2x the necessary traffic: measured 76.7 ms for 16 layers at
# (4, 1024, 32h/8kv, 64) on v5e vs 64.6 ms for this manual VJP that keeps
# dP/dS in bf16 with f32 row-reductions.  The forward math is IDENTICAL to
# the autodiff path (f32 softmax); only gradient intermediates change
# precision — the same trade flash-attention backward kernels make when
# they write bf16 dQ/dK/dV from f32 register accumulators.


def _grouped_logits(q, k, pad_mask):
    """Masked f32 attention logits (B, KH, G, S, S)."""
    d = q.shape[-1]
    s = q.shape[1]
    logits = jnp.einsum(
        "bqkgd,bskd->bkgqs", q, k, precision=jax.lax.Precision.DEFAULT
    ) * (d**-0.5)
    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
    bias = jnp.where(causal[None, None, None], 0.0, _NEG_INF)
    if pad_mask is not None:
        key_ok = pad_mask[:, None, None, None, :].astype(jnp.bool_)
        bias = bias + jnp.where(key_ok, 0.0, _NEG_INF)
    return logits.astype(jnp.float32) + bias


def _grouped_probs(q, k, pad_mask):
    """(B, S, KH, G, D) query groups x (B, S, KH, D) keys -> f32->bf16
    softmax probabilities (B, KH, G, S, S); causal + pad-key masking."""
    logits = _grouped_logits(q, k, pad_mask)
    return jax.nn.softmax(logits, axis=-1).astype(q.dtype)


@jax.custom_vjp
def _grouped_attention(qg, k, v, pad_mask):
    probs = _grouped_probs(qg, k, pad_mask)
    return jnp.einsum("bkgqs,bskd->bqkgd", probs, v)


def _grouped_attention_fwd(qg, k, v, pad_mask):
    probs = _grouped_probs(qg, k, pad_mask)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v)
    # probs ride as a bf16 residual.  Under full remat ("full") the replay
    # recomputes them per layer (transient); under remat=False they are
    # the ONLY quadratic tensor kept per layer — bf16, vs the f32
    # logits+probs XLA autodiff would save, which is what made
    # remat=False OOM before this VJP existed.
    return out, (probs, qg, k, v)


def _grouped_attention_bwd(res, g):
    p, qg, k, v = res
    d = qg.shape[-1]
    dv = jnp.einsum("bkgqs,bqkgd->bskd", p, g)
    dp = jnp.einsum("bqkgd,bskd->bkgqs", g, v)  # bf16 (S, S)
    # softmax VJP: dS = P * (dP - rowsum(P * dP)); row sums in f32
    row = jnp.einsum(
        "bkgqs,bkgqs->bkgq", p.astype(jnp.float32), dp.astype(jnp.float32)
    )
    ds = (p * (dp - row[..., None].astype(p.dtype))) * (d**-0.5)
    dq = jnp.einsum("bkgqs,bskd->bqkgd", ds, k)
    dk = jnp.einsum("bkgqs,bqkgd->bskd", ds, qg)
    return dq, dk, dv, None


_grouped_attention.defvjp(_grouped_attention_fwd, _grouped_attention_bwd)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(B, S, KH, D) -> (B, S, KH * n_rep, D) by head repetition (GQA)."""
    if n_rep == 1:
        return x
    b, s, kh, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, kh, n_rep, d)).reshape(
        b, s, kh * n_rep, d
    )


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array] = None,
    *,
    return_probs: bool = False,
    use_flash: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Causal multi-head attention with optional left-pad key masking.

    Args:
      q: (B, S, H, D); k, v: (B, S, KH, D) with H % KH == 0.
      pad_mask: optional (B, S) with 1 for valid tokens, 0 for padding.
      return_probs: eager path; also return (B, H, S, S) probabilities.
      use_flash: force/disable the Pallas kernel; default auto (TPU and not
        returning probabilities).

    Returns:
      (out (B, S, H, D), probs or None)
    """
    n_rep = q.shape[2] // k.shape[2]
    # an EXPLICIT use_flash=False is a caller opt-out of all Pallas
    # kernels; the auto-computed value below only steers the long-context
    # flash kernel and must not disable the resident-kernel dispatch
    pallas_opt_out = use_flash is False
    if use_flash is None:
        # Measured on v5e (uncontended, 256k tokens per shape): XLA's own
        # fused attention is FASTER than the Pallas kernel at every size
        # (e.g. S=8192/B1/H32/D64: 18 ms vs 39 ms after subtracting
        # dispatch).  What XLA cannot do is bound memory: it materializes
        # the (B, H, S, S) probability tensor (4.3 GB at S=8192/B1/H32
        # bf16), which OOMs long-context training.  Auto-enable flash only
        # where that materialization becomes the constraint.
        use_flash = (
            (not return_probs) and q.shape[1] >= 4096 and _flash_available()
        )
    if use_flash and not return_probs:
        out = _flash_attention(q, k, v, pad_mask)
        if out is not None:
            return out, None

    b, s, h, d = q.shape
    kh = k.shape[2]
    # Grouped-query form: keep KV at KH heads and batch the QK^T/PV dots
    # over (B, KH) instead of materializing the n_rep-repeated cache
    # (_repeat_kv copies 4x the KV bytes on Llama-3.2; measured +11%
    # decode throughput on v5e).  Head order matches HF repeat_kv:
    # query head hq uses kv head hq // n_rep, i.e. H splits as (KH, G).
    qg = q.reshape(b, s, kh, n_rep, d)
    if not return_probs:
        # `use_flash=False` is an explicit opt-out of ALL Pallas kernels
        # (callers forcing the XLA path for debugging/parity, or platforms
        # where a kernel misbehaves) — honor it for the resident kernel
        # too, not just the long-context flash kernel above.
        if not pallas_opt_out and _resident_supported(qg.shape, q.dtype):
            # resident Pallas kernel: the whole (S, S) softmax lives and
            # dies in VMEM — no HBM-bound probability traffic in fwd or bwd
            from ecg_byte_tpu.ops import attention_resident

            env_mesh = _active_mesh()
            if env_mesh is None:
                out = attention_resident.resident_attention(qg, k, v, pad_mask)
            else:
                # a pallas_call is opaque to GSPMD: under an active mesh,
                # shard cells explicitly (batch x kv-heads, no collectives)
                out = attention_resident.resident_attention_sharded(
                    qg, k, v, pad_mask, mesh=env_mesh
                )
            return out.reshape(b, s, h, d), None
        # manual-VJP core: identical forward, bf16 gradient intermediates
        out = _grouped_attention(qg, k, v, pad_mask)
        return out.reshape(b, s, h, d), None
    probs = _grouped_probs(qg, k, pad_mask)
    out = jnp.einsum("bkgqs,bskd->bqkgd", probs, v).reshape(b, s, h, d)
    return out, probs.reshape(b, kh * n_rep, s, s)


def _active_mesh():
    """Concrete device mesh of the enclosing context, or None.

    Checks the modern context (``jax.sharding.set_mesh``/``use_mesh``)
    first, then the legacy ``with mesh:`` thread resources via their
    non-deprecated ``jax._src.mesh`` home (``jax.interpreters.pxla`` is a
    DeprecationWarning-emitting alias slated for removal).  Both probes
    are guarded so API drift degrades to the unsharded dispatch rather
    than breaking the forward pass.
    """
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.get_concrete_mesh()
        if m is not None and not m.empty:
            return m
        m = mesh_lib.thread_resources.env.physical_mesh
        if not m.empty:
            return m
    except Exception:
        pass
    return None


def _resident_supported(qg_shape, dtype) -> bool:
    """Dispatch gate for the resident-sequence training kernel."""
    if not _flash_available():  # same platform gate: TPU with Pallas
        return False
    try:
        from ecg_byte_tpu.ops import attention_resident

        return attention_resident.supported(qg_shape, dtype)
    except ImportError:
        return False


@functools.lru_cache(maxsize=1)
def _flash_available() -> bool:
    try:
        devs = jax.devices()
    except RuntimeError:
        return False
    if not devs or devs[0].platform not in ("tpu", "axon"):
        return False
    try:
        from ecg_byte_tpu.ops import flash_attention  # noqa: F401

        return True
    except ImportError:
        return False


def _flash_attention(q, k, v, pad_mask):
    """Dispatch to the Pallas flash kernel; None if shapes unsupported."""
    try:
        from ecg_byte_tpu.ops import flash_attention as fa

        return fa.flash_attention(q, k, v, pad_mask)
    except (ImportError, NotImplementedError):
        return None


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array] = None,
    *,
    return_probs: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Bidirectional (encoder) attention: like :func:`causal_attention`
    without the causal mask.  Used by the ViT/CLIP/attention-pool encoders."""
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (d**-0.5)
    if pad_mask is not None:
        key_ok = pad_mask[:, None, None, :].astype(jnp.bool_)
        logits = logits + jnp.where(key_ok, 0.0, _NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out, (probs if return_probs else None)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    valid_mask: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Single-position attention over a KV cache for autoregressive decode.

    Args:
      q: (B, 1, H, D) query for the current position.
      k_cache, v_cache: (B, S_max, KH, D) with filled prefix.  May be the
        int8 serving cache (models/transformer.init_kv_cache dtype=int8),
        in which case ``k_scale``/``v_scale`` carry the per-row dequant.
      valid_mask: (B, S_max) — 1 for cache positions that may be attended
        (filled and non-pad).
      k_scale, v_scale: optional (B, S_max, KH) bf16 per-row scales for the
        int8 cache.  The K-scale is applied to the LOGITS after the QK dot
        and the V-scale is folded into the probabilities BEFORE the PV dot
        — both dots then read raw int8 from HBM (XLA fuses the int8->bf16
        convert into the dot's operand read), which is the point: decode
        is byte-bound and this halves the per-token KV traffic.

    Returns: (B, 1, h, d).
    """
    b, _, h, d = q.shape
    kh = k_cache.shape[2]
    n_rep = h // kh
    # Grouped form (see causal_attention): never materialize the repeated
    # cache — at decode time that copy is ~4x the KV bytes per step.
    qg = q.reshape(b, kh, n_rep, d)
    logits = jnp.einsum(
        "bkgd,bskd->bkgs", qg, k_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5)
    if k_scale is not None:
        # logit[b,k,g,s] = (q . k_int8[s]) * k_scale[s]: exact row dequant
        logits = logits * jnp.swapaxes(k_scale, 1, 2)[:, :, None, :].astype(
            jnp.float32
        )
    logits = logits + jnp.where(
        valid_mask[:, None, None, :].astype(jnp.bool_), 0.0, _NEG_INF
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        # sum_s p[s] * (v_int8[s] * v_scale[s]) == sum_s (p[s]*v_scale[s])
        # * v_int8[s]: fold the scale into the probs so the PV dot streams
        # int8.  Probs stay f32 through the fold to keep the product exact.
        probs = probs * jnp.swapaxes(v_scale, 1, 2)[:, :, None, :].astype(
            jnp.float32
        )
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bkgs,bskd->bkgd", probs, v_cache.astype(q.dtype))
    return out.reshape(b, 1, h, d)
