"""Resident-sequence Pallas attention for training shapes (S <= ~2048).

At the reference training shape (B 4, S 1024, 32q/8kv heads, D 64 —
train_model.sh:5-17 semantics) the ENTIRE key/value sequence of one
(batch, kv-head) cell fits in VMEM, so attention needs no online-softmax
k-loop at all: one kernel instance computes exact softmax over the full
row.  This removes the backward pass's HBM-bound (S, S) intermediates —
the XLA path streams ~2.5 GB/layer of probs/dP/dS through HBM
(TRAINPERF.md stage budget: 104 ms of a 287 ms step); here every (M, S)
tensor lives and dies in VMEM and the backward recomputes softmax
in-kernel from q/k/v, so HBM sees only the O(S*D) inputs and outputs.

Design notes (TPU kernel playbook):
  - GQA q-heads are FOLDED INTO THE M DIMENSION: the kernel sees
    (G*S, D) query rows against one shared (S, D) K/V — 4x larger
    matmuls than per-head blocking and 4x fewer K/V DMAs.  The causal
    mask is ``(row mod S) >= col``.
  - grid (B*KH, m_blocks): K/V/mask block indices ignore the m axis, so
    Mosaic keeps them resident across m-iterations (no re-DMA).
  - backward needs NO saved statistics: it recomputes max/sum/probs
    bitwise-identically to the forward inside the kernel, and the
    softmax-VJP row term ``delta = rowsum(dO * O)`` comes from the saved
    output block.  dK/dV accumulate in f32 VMEM scratch across m-blocks.
  - logits/softmax in f32, probabilities cast to bf16 for the PV and
    gradient matmuls (same trade as the XLA manual-VJP path in
    ops/attention.py).

Role replaced: torch sdpa inside HF LlamaAttention (the reference's
vendored transformers fork, modeling_llama.py sdpa path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# Per-(M,S)-block f32 transient budget: block_m chosen so the backward's
# resident set (s, p, dp, ds + inputs, ~48 MB at 4096x1024) stays under
# VMEM.  Swept on v5e at the flagship shape: 4096 beats 2048 by ~10%
# (fwd16 10.7 -> 9.5 ms, grad16 28.7 -> 25.4 ms).
DEFAULT_BLOCK_M = 4096
MAX_SEQ = 2048  # above this, fall back (ops/flash_attention handles long S)


def _masked_probs(q, k, mask_row, *, scale, seq, block_m, mi):
    """f32 softmax probabilities for one (block_m, S) strip; exact (no
    online rescaling) because the full key axis is resident."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BM, S)
    # rows are q-head-major: global row r = mi*block_m + i maps to query
    # position (r mod S); the fold keeps S a multiple of block_m or vice
    # versa so a block never straddles misaligned head boundaries.
    row = mi * block_m + jax.lax.broadcasted_iota(
        jnp.int32, (block_m, seq), 0
    )
    q_pos = jax.lax.rem(row, seq)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_m, seq), 1)
    ok = (q_pos >= k_pos) & (mask_row > 0)
    s = jnp.where(ok, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)  # >= 1 (the max entry)
    return p / l


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *,
                scale, seq, block_m):
    mi = pl.program_id(1)
    p = _masked_probs(
        q_ref[0], k_ref[0], mask_ref[0, 0:1, :] > 0,
        scale=scale, seq=seq, block_m=block_m, mi=mi,
    )
    o_ref[0] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                scale, seq, block_m, n_m):
    mi = pl.program_id(1)

    @pl.when(mi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    # recomputed bitwise-identically to the forward — no saved stats
    p = _masked_probs(
        q, k, mask_ref[0, 0:1, :] > 0,
        scale=scale, seq=seq, block_m=block_m, mi=mi,
    )
    p_bf = p.astype(q.dtype)
    dv_scr[:] += jax.lax.dot_general(
        p_bf, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BM, S)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=1, keepdims=True,
    )  # (BM, 1) — softmax-VJP row term
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)

    @pl.when(mi == n_m - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _layouts(qg, k, v, pad_mask):
    """(B,S,KH,G,D) q-groups + (B,S,KH,D) k/v -> kernel layouts."""
    b, s, kh, g, d = qg.shape
    qf = jnp.transpose(qg, (0, 2, 3, 1, 4)).reshape(b * kh, g * s, d)
    kf = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * kh, s, d)
    vf = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * kh, s, d)
    if pad_mask is None:
        mask = jnp.ones((b, 8, s), jnp.int32)
    else:
        mask = jnp.broadcast_to(
            pad_mask.astype(jnp.int32)[:, None, :], (b, 8, s)
        )
    return qf, kf, vf, mask


def _grid_specs(b, s, kh, g, d, block_m):
    m = g * s
    n_m = m // block_m
    grid = (b * kh, n_m)
    in_specs = [
        pl.BlockSpec((1, 8, s), lambda c, mi, kh=kh: (c // kh, 0, 0)),
        pl.BlockSpec((1, block_m, d), lambda c, mi: (c, mi, 0)),
        pl.BlockSpec((1, s, d), lambda c, mi: (c, 0, 0)),
        pl.BlockSpec((1, s, d), lambda c, mi: (c, 0, 0)),
    ]
    return grid, n_m, in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def resident_attention(qg, k, v, pad_mask, block_m=DEFAULT_BLOCK_M,
                       interpret=False):
    out, _ = _resident_fwd(qg, k, v, pad_mask, block_m, interpret)
    return out


def _resident_impl(qg, k, v, pad_mask, block_m, interpret):
    b, s, kh, g, d = qg.shape
    block_m = min(block_m, g * s)
    qf, kf, vf, mask = _layouts(qg, k, v, pad_mask)
    grid, n_m, in_specs = _grid_specs(b, s, kh, g, d, block_m)
    scale = d**-0.5
    of = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq=s, block_m=block_m),
        out_shape=jax.ShapeDtypeStruct((b * kh, g * s, d), qg.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_m, d), lambda c, mi: (c, mi, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask, qf, kf, vf)
    out = jnp.transpose(
        of.reshape(b, kh, g, s, d), (0, 3, 1, 2, 4)
    )  # (B, S, KH, G, D)
    return out, of


def _resident_fwd(qg, k, v, pad_mask, block_m, interpret=False):
    out, of = _resident_impl(qg, k, v, pad_mask, block_m, interpret)
    # Save `out` (the value already flowing forward) rather than its flat
    # source `of`: keeping both doubles the O(B*S*H*D) saved activations
    # per layer under remat=False, the mode this kernel exists to enable.
    # The backward re-derives the flat layout with one cheap transpose —
    # the same relayout it already performs on the incoming gradient.
    del of
    # Name the RESIDUAL so remat policies can elect to save it: a
    # pallas_call is not a dot_general, so under remat="dots" an unnamed
    # `out` is rematerialized by replaying the whole forward kernel in
    # the backward (measured 6.5 ms/step at the flagship 4x1024; the
    # tensor itself is 16.8 MB/layer bf16).  Tagging a copy outside the
    # custom_vjp does NOT help — the vjp demands this exact residual.
    out = checkpoint_name(out, "ecg_attn")
    return out, (qg, k, v, pad_mask, out)


def _resident_bwd(block_m, interpret, res, grad):
    qg, k, v, pad_mask, out = res
    b, s, kh, g, d = qg.shape
    block_m = min(block_m, g * s)
    qf, kf, vf, mask = _layouts(qg, k, v, pad_mask)
    of = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b * kh, g * s, d)
    gf = jnp.transpose(grad, (0, 2, 3, 1, 4)).reshape(b * kh, g * s, d)
    grid, n_m, in_specs = _grid_specs(b, s, kh, g, d, block_m)
    scale = d**-0.5
    dqf, dkf, dvf = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, seq=s, block_m=block_m, n_m=n_m
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * kh, g * s, d), qg.dtype),
            jax.ShapeDtypeStruct((b * kh, s, d), k.dtype),
            jax.ShapeDtypeStruct((b * kh, s, d), v.dtype),
        ),
        grid=grid,
        in_specs=in_specs + [
            pl.BlockSpec((1, block_m, d), lambda c, mi: (c, mi, 0)),
            pl.BlockSpec((1, block_m, d), lambda c, mi: (c, mi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_m, d), lambda c, mi: (c, mi, 0)),
            pl.BlockSpec((1, s, d), lambda c, mi: (c, 0, 0)),
            pl.BlockSpec((1, s, d), lambda c, mi: (c, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((s, d), jnp.float32),
            pltpu.VMEM((s, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mask, qf, kf, vf, of, gf)
    dqg = jnp.transpose(dqf.reshape(b, kh, g, s, d), (0, 3, 1, 2, 4))
    dk = jnp.transpose(dkf.reshape(b, kh, s, d), (0, 2, 1, 3))
    dv = jnp.transpose(dvf.reshape(b, kh, s, d), (0, 2, 1, 3))
    return dqg, dk, dv, None


resident_attention.defvjp(_resident_fwd, _resident_bwd)


def resident_attention_sharded(
    qg, k, v, pad_mask, *, mesh,
    batch_axes=("dp", "fsdp"), head_axis: str = "tp",
    block_m: int = DEFAULT_BLOCK_M, interpret: bool = False,
):
    """Resident attention under a device mesh via ``shard_map``.

    Cells are independent per (batch row, kv head), so the kernel shards
    embarrassingly: batch over the data axes, KV HEADS over the tensor
    axis (each shard keeps whole q-head groups, mirroring
    parallel/sharding.py's head partitioning and flash_attention_sharded).
    Fills the gap GSPMD cannot: a ``pallas_call`` is opaque to the
    partitioner, so without this wrapper the kernel would be replicated
    (or rejected) under a mesh.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    present = [a for a in batch_axes if a in mesh.axis_names]
    batch_spec = tuple(present) if present else None
    head = head_axis if head_axis in mesh.axis_names else None
    qg_spec = P(batch_spec, None, head, None, None)
    kv_spec = P(batch_spec, None, head, None)
    mask_spec = P(batch_spec, None)

    def local(qs, ks, vs, ms):
        if supported(qs.shape, qs.dtype):
            return resident_attention(qs, ks, vs, ms, block_m, interpret)
        # local shard shape the kernel cannot host: XLA grouped fallback
        from ecg_byte_tpu.ops import attention

        return attention._grouped_attention(qs, ks, vs, ms)

    mask = (
        pad_mask
        if pad_mask is not None
        else jnp.ones(qg.shape[:2], jnp.int32)
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(qg_spec, kv_spec, kv_spec, mask_spec),
        out_specs=qg_spec,
        check_vma=False,
    )(qg, k, v, mask)


def supported(qg_shape, dtype) -> bool:
    """Whether the resident kernel hosts this training shape."""
    b, s, kh, g, d = qg_shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    m = g * s
    return (
        s <= MAX_SEQ
        and s % 128 == 0
        and d % 8 == 0
        and (m % DEFAULT_BLOCK_M == 0 or m <= DEFAULT_BLOCK_M)
        # a block must not straddle a head boundary mid-sequence
        and (DEFAULT_BLOCK_M % s == 0 or s % DEFAULT_BLOCK_M == 0)
    )
