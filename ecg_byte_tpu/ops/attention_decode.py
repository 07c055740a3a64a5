"""Fused single-position decode attention over the KV cache (Pallas).

Attack on the measured decode fixed cost (BENCH_r04: 0.234 ms/tok of the
3.58 ms/tok bf16 budget is NOT weight streaming).  The XLA path
(ops/attention.decode_attention) lowers to ~4 kernels per layer (QK dot,
mask+softmax, scale folds, PV dot) with (B, KH, G, S) f32 logits bounced
through HBM between them; across 16 layers that is ~60-70 extra kernel
launches and HBM round-trips per token.  Here one kernel per layer
computes QK -> mask -> softmax -> PV for the whole cache row in VMEM.

The cache is consumed IN ITS NATIVE (B, S, KH*D) LAYOUT — a contiguous
reshape, so no transposed copy of the multi-MB cache is ever
materialized; the only HBM traffic is the int8/bf16 K/V stream itself
(what the roofline requires) plus the (H, D) query/output.

The grouped-query structure is handled WITHOUT per-head loops or
sub-lane slicing (both measured slow on v5e — an earlier per-head-loop
variant of this kernel ran 1.28 ms vs XLA's 0.93 ms for a 16-layer
chain; see BASELINE.md):

* QK: the query is expanded host-side into a block-diagonal
  (H, KH*D) matrix (head h occupies the d-slice of its KV head), so ALL
  heads' logits are ONE (S, KH*D) x (KH*D, H) MXU dot against the native
  cache block.  The 8x redundant FLOPs are ~0.2 us on the MXU —
  irrelevant next to the HBM stream.
* PV (grouped-query, g > 1): one (H, S) x (S, KH*D) dot produces every
  (query-head, kv-head) combination; the correct diagonal blocks are
  gathered with KH lane-rotations (``pltpu.roll`` keeps layouts
  canonical) + masked sum.
* PV (multi-head, g == 1, e.g. GPT-2): the roll-gather is skipped
  entirely — the per-layer ablation (scripts/gpt2_ablate.py, v5e
  2026-08-19) measured decode attention at ~98 us/layer for GPT-2-XL
  (kh=25, 1600 unaligned lanes, 25 roll+mask passes), MORE than the
  61.5 MB weight stream it rides next to, while llama's 8 rolls over
  512 aligned lanes cost ~us.  For g == 1 the probabilities are instead
  expanded across each head's D lanes with a ones-block-diagonal dot
  ((S, KH) x (KH, KH*D), one MXU pass), multiplied elementwise with V
  and summed over the cache rows — the (1, KH*D) result IS the native
  output layout, no gather at all.  Measured end-to-end: GPT-2-XL
  8.61 -> 4.37 ms/tok (116 -> 229 tok/s, scripts/gpt2_decode_diag.py).

Semantics match decode_attention exactly (same grouped-query fold, same
f32 logit/softmax precision, same int8 per-row scale application: K-scale
on the logits after the QK dot, V-scale folded into the probabilities
before the PV dot).  The (S, KH) scale columns are expanded to (S, H)
per query head OUTSIDE the kernel (an XLA repeat over a ~37 KB array):
an earlier in-kernel one-hot-dot expansion needed Precision.HIGHEST to
keep the f32 scales exact and its 6-pass f32 dots cost ~0.1 ms across a
16-layer token step (measured v5e, scripts/hw_parity.py round 5).
Inference-only: no VJP.

Measured (v5e, 2026-08-19, flagship Llama-3.2-1B end-to-end decode,
same-session bench.py A/B):

* bf16 cache: 286.6 tok/s fused vs 281.0 XLA (+2.0%); the fixed
  (non-weight-streaming) per-token cost drops 0.211 -> 0.155 ms and
  vs-attainable rises 0.955 -> 0.970.  Default ON (transformer.py
  dispatch gate).
* int8 cache: 504.6 tok/s fused vs 527.3 XLA (-4.3%) — the (S, H) f32
  scale multiplies and in-kernel int8 conversion cost more than the
  launches they save (isolated 16-layer chain 0.790 vs 0.691 ms,
  scripts/hw_parity.py).  Default OFF for int8; a measured negative,
  kept behind ``ECG_BYTE_FUSED_DECODE_ATTN=force``.
* Hardware (non-interpret) parity: max |delta| vs the XLA path 2.4e-4
  bf16 / 0.0 int8 (scripts/hw_parity.py on TPU v5 lite).
* Fresh-row substitution (the ``fresh_k``/``write_idx`` path, which
  feeds the kernel the stale pre-append cache + this token's row so the
  HBM append feeds only the loop carry): same-process interleaved A/B
  (v5e, 2026-08-19) bf16 284.5/294.9 tok/s fused+fresh vs 284.1/272.4
  XLA — mean +4%, within this tunnel session's noise band, parity
  exact; int8 under ``=force`` 490.9/495.6 vs 506.7/503.5 XLA (-2.5%,
  the int8 negative stands and the default-OFF gate is unchanged).

Role replaced: torch sdpa single-step path inside the reference's HF
generate loop (ecg_byte/models/llm.py:26-37 budget).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(mask_ref, row_ref, qbd_ref, k_ref, v_ref, ks_ref, vs_ref,
            fk_ref, fv_ref, fks_ref, fvs_ref, o_ref, *,
            scale, int8_scales, kh, g, d, fresh):
    h = kh * g
    kv = k_ref[0]  # (S, KH*D); int8 converts in-register
    vv = v_ref[0]
    ks = ks_ref[0] if int8_scales else None
    vs = vs_ref[0] if int8_scales else None
    if fresh:
        # substitute this token's K/V row into the (stale) VMEM block —
        # the HBM cache update (a dynamic-update-slice) then feeds ONLY
        # the decode loop carry, never this kernel: the per-layer
        # ablation (scripts/gpt2_ablate.py) measured that data edge at
        # ~80 us/layer of copy traffic on GPT-2-XL shapes while each
        # half alone is free.  Numerics are identical: the substituted
        # row holds exactly the bytes _append_kv writes (int8 rows are
        # pre-quantized by the caller).
        sel = row_ref[0, 0][:, None] > 0  # (S, 1): row == write_idx
        kv = jnp.where(sel, fk_ref[0], kv)
        vv = jnp.where(sel, fv_ref[0], vv)
        if int8_scales:
            ks = jnp.where(sel, fks_ref[0], ks)
            vs = jnp.where(sel, fvs_ref[0], vs)
    s_log = jax.lax.dot_general(
        kv.astype(qbd_ref.dtype), qbd_ref[0],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (S, H)
    if int8_scales:
        s_log = s_log * ks  # (S, H) f32, pre-expanded per q head
    ok = mask_ref[0, 0][:, None] > 0  # (S, 1)
    s_log = jnp.where(ok, s_log, _NEG_INF)
    m = jnp.max(s_log, axis=0, keepdims=True)
    p = jnp.exp(s_log - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    if int8_scales:
        p = p * vs  # (S, H) f32
    if g == 1:
        # MHA flat path: expand head probabilities across their D lanes
        # (ones-block-diagonal dot), multiply with V, reduce over cache
        # rows.  out[h*D+j] = sum_s p[s,h] * v[s,h*D+j] — already the
        # native (1, KH*D) output layout, no per-head gather.
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (kh, kh * d), 1) // d
        head_id = jax.lax.broadcasted_iota(jnp.int32, (kh, kh * d), 0)
        expand = (lane_head == head_id).astype(jnp.float32)
        p_exp = jax.lax.dot_general(  # (S, KH*D)
            p.astype(qbd_ref.dtype).astype(jnp.float32), expand,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out = jnp.sum(p_exp * vv.astype(jnp.float32), axis=0,
                      keepdims=True)  # (1, KH*D)
        o_ref[0] = out.astype(o_ref.dtype)
        return
    full = jax.lax.dot_general(  # (H, KH*D): every (q-head, kv-head) pair
        p.astype(qbd_ref.dtype), vv.astype(qbd_ref.dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    # gather the diagonal blocks: rotate kv-head block ki down to lanes
    # [0, D) and keep only the rows belonging to that kv head
    row_head = jax.lax.broadcasted_iota(jnp.int32, (h, kh * d), 0) // g
    out = jnp.zeros((h, kh * d), jnp.float32)
    for ki in range(kh):
        rolled = pltpu.roll(full, (kh - ki) * d % (kh * d), 1) if ki else full
        out = out + jnp.where(row_head == ki, rolled, 0.0)
    # lanes >= D hold rotation remnants; the caller slices them off
    o_ref[0] = out.astype(o_ref.dtype)


def _block_diag_q(q: jax.Array, kh: int) -> jax.Array:
    """(B, 1, H, D) query -> (B, H, KH*D) block-diagonal expansion."""
    b, _, h, d = q.shape
    g = h // kh
    row_head = jnp.arange(h, dtype=jnp.int32) // g  # kv head of each q head
    col_head = jnp.arange(kh * d, dtype=jnp.int32) // d
    keep = (row_head[:, None] == col_head[None, :]).astype(q.dtype)
    tiled = jnp.tile(q.reshape(b, h, d), (1, 1, kh))  # (B, H, KH*D)
    return tiled * keep[None]


def decode_attention_fused(
    q: jax.Array,        # (B, 1, H, D)
    k_cache: jax.Array,  # (B, S, KH, D) bf16 or int8 — native cache layout
    v_cache: jax.Array,  # (B, S, KH, D)
    valid_mask: jax.Array,  # (B, S)
    k_scale: jax.Array | None = None,  # (B, S, KH) (int8 cache)
    v_scale: jax.Array | None = None,
    *,
    fresh_k: jax.Array | None = None,  # (B, 1, KH, D), cache dtype
    fresh_v: jax.Array | None = None,
    fresh_ks: jax.Array | None = None,  # (B, 1, KH) f32 (int8 cache)
    fresh_vs: jax.Array | None = None,
    write_idx: jax.Array | None = None,  # int32 scalar: this token's slot
    interpret: bool = False,
) -> jax.Array:
    """One-kernel-per-layer decode attention; returns (B, 1, H, D).

    With ``fresh_k/fresh_v`` (+ ``write_idx``) the caller passes this
    token's K/V row directly and the STALE pre-append cache: the kernel
    substitutes the row in VMEM, so the HBM dynamic-update-slice that
    appends it feeds only the decode loop carry, never this kernel (see
    module docstring for the measured data-edge cost).  For int8 caches
    the fresh rows must be pre-quantized with their (B, 1, KH) scales.
    """
    b, _, h, d = q.shape
    s, kh = k_cache.shape[1], k_cache.shape[2]
    g = h // kh
    int8_scales = k_scale is not None
    fresh = fresh_k is not None
    if fresh and write_idx is None:
        raise ValueError("fresh_k requires write_idx")

    qbd = _block_diag_q(q, kh)  # (B, H, KH*D), ~KB-scale
    k2 = k_cache.reshape(b, s, kh * d)  # contiguous reshape, no copy
    v2 = v_cache.reshape(b, s, kh * d)
    mask = valid_mask.astype(jnp.int32).reshape(b, 1, s)
    if int8_scales:
        # pre-expand (B, S, KH) -> (B, S, H) so kernel columns line up
        # with the query heads (head h <- kv head h // g); exact f32
        ksf = jnp.repeat(k_scale.astype(jnp.float32), g, axis=2)
        vsf = jnp.repeat(v_scale.astype(jnp.float32), g, axis=2)
        scale_w = h
    else:  # static placeholders keep the kernel signature uniform
        ksf = jnp.ones((b, s, 8), jnp.bfloat16)
        vsf = ksf
        scale_w = 8

    if fresh:
        row = (
            jnp.arange(s, dtype=jnp.int32)[None, None, :]
            == jnp.asarray(write_idx, jnp.int32)
        ).astype(jnp.int32)
        row = jnp.broadcast_to(row, (b, 1, s))
        fk = fresh_k.reshape(b, 1, kh * d)
        fv = fresh_v.reshape(b, 1, kh * d)
        if int8_scales:
            fks = jnp.repeat(fresh_ks.astype(jnp.float32), g, axis=2)
            fvs = jnp.repeat(fresh_vs.astype(jnp.float32), g, axis=2)
        else:
            fks = jnp.ones((b, 1, scale_w), jnp.bfloat16)
            fvs = fks
    else:  # placeholders; kernel never reads them (fresh is static)
        row = mask
        fk = jnp.zeros((b, 1, 8), k_cache.dtype)
        fv = fk
        fks = jnp.ones((b, 1, 8), jnp.bfloat16)
        fvs = fks
    fw = fk.shape[2]
    fsw = fks.shape[2]

    out_rows = 1 if g == 1 else h  # MHA flat path emits one packed row
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=d**-0.5, int8_scales=int8_scales, kh=kh, g=g,
            d=d, fresh=fresh,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, h, kh * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, s, kh * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, s, kh * d), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, s, scale_w), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, s, scale_w), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, fw), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, fw), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, fsw), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, fsw), lambda bi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_rows, kh * d), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_rows, kh * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(mask, row, qbd, k2, v2, ksf, vsf, fk, fv, fks, fvs)
    if g == 1:
        # the packed (1, KH*D) row is the (H, D) output, contiguously
        return out.reshape(b, 1, h, d)
    return out[:, :, :d].reshape(b, 1, h, d)


def supported(q_shape, s: int, d: int) -> bool:
    """Dispatch gate: lane-aligned head dim, cache length tileable."""
    return d % 64 == 0 and s % 128 == 0 and s <= 8192
