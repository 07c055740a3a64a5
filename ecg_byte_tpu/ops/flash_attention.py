"""Pallas flash attention (causal, left-pad aware) for TPU.

Replaces the O(S^2)-memory attention materialization in the train path with
an online-softmax tiled kernel (forward + recompute-based backward via
``jax.custom_vjp``), the role the reference delegates to torch sdpa
(modeling_llama.py sdpa path).  Design per the TPU kernel playbook:

  - grid (batch*heads, q_blocks, k_blocks) with VMEM scratch carrying the
    running row-max / row-sum / output accumulator across the k dimension;
  - GQA handled by the kv BlockSpec index map (no repeated KV in HBM);
  - causal block pruning with ``pl.when`` plus in-block iota masking;
  - key-validity (left-pad) mask folded into the logits;
  - logits/softmax in f32 on the MXU, probabilities cast to bf16 for p @ v.

The backward pass recomputes probabilities per tile from the saved
logsumexp, accumulating dq over k-blocks and dk/dv over q-blocks in
separate kernels (the standard FA2 split).

Under a multi-device mesh use :func:`flash_attention_sharded` — a
``shard_map`` wrapper partitioning batch over the data axes and query
heads over ``tp`` (attention needs no collectives), since a raw
``pallas_call`` is opaque to the GSPMD partitioner.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, block_q, block_k, n_k):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # causal: a k-block participates iff its first key <= last query
    @pl.when(ki * block_k <= qi * block_q + block_q - 1)
    def _compute():
        q = q_ref[0]  # (BQ, D)
        k = k_ref[0]  # (BK, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)

        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        causal_ok = q_pos >= k_pos
        key_ok = mask_ref[0, 0:1, :] > 0  # (1, BK)
        s = jnp.where(causal_ok & key_ok, s, _NEG_INF)

        m_prev = m_scr[:]  # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # (BQ, BK) f32
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = m_new

    @pl.when(ki == n_k - 1)
    def _finalize():
        l = l_scr[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)  # fully-masked rows (pad queries)
        o_ref[0] = (acc_scr[:] / safe_l).astype(o_ref.dtype)
        lse_row = (m_scr[:] + jnp.log(safe_l)).reshape(1, block_q)
        lse_ref[0] = jnp.broadcast_to(lse_row, (8, block_q))


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr, *, scale, block_q, block_k, n_k):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(ki * block_k <= qi * block_q + block_q - 1)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        ok = (q_pos >= k_pos) & (mask_ref[0, 0:1, :] > 0)
        s = jnp.where(ok, s, _NEG_INF)
        lse_col = jnp.transpose(lse_ref[0, 0:1, :])  # (BQ, 1)
        p = jnp.exp(s - lse_col)  # (BQ, BK)
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta_col = jnp.transpose(delta_ref[0, 0:1, :])
        ds = p * (dp - delta_col) * scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == n_k - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, block_q, block_k, n_q):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(qi * block_q + block_q - 1 >= ki * block_k)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        ok = (q_pos >= k_pos) & (mask_ref[0, 0:1, :] > 0)
        s = jnp.where(ok, s, _NEG_INF)
        lse_col = jnp.transpose(lse_ref[0, 0:1, :])  # (BQ, 1)
        p = jnp.exp(s - lse_col)  # (BQ, BK)
        # dv += p.T @ do
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta_col = jnp.transpose(delta_ref[0, 0:1, :])
        ds = p * (dp - delta_col) * scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == n_q - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _prep(q, k, v, pad_mask, block_q, block_k):
    """Flatten heads, repeat-map GQA rows, pad sequence to block multiples."""
    b, s, h, d = q.shape
    kh = k.shape[2]
    rep = h // kh
    s_pad = int(np.ceil(s / max(block_q, block_k)) * max(block_q, block_k))

    def pad_seq(x):
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))

    qf = pad_seq(q).transpose(0, 2, 1, 3).reshape(b * h, s_pad, d)
    kf = pad_seq(k).transpose(0, 2, 1, 3).reshape(b * kh, s_pad, d)
    vf = pad_seq(v).transpose(0, 2, 1, 3).reshape(b * kh, s_pad, d)
    if pad_mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    else:
        mask = pad_mask.astype(jnp.int32)
    mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)))
    # TPU block tiling needs the 2nd-to-last dim % 8 == 0: carry per-row
    # vectors as 8 broadcast rows
    mask8 = jnp.broadcast_to(mask[:, None, :], (b, 8, s_pad))
    return qf, kf, vf, mask8, (b, s, h, kh, d, rep, s_pad)


def _flash_fwd(q, k, v, pad_mask, block_q, block_k, interpret=False):
    qf, kf, vf, mask, meta = _prep(q, k, v, pad_mask, block_q, block_k)
    b, s, h, kh, d, rep, s_pad = meta
    n_q = s_pad // block_q
    n_k = s_pad // block_k
    scale = d**-0.5

    grid = (b * h, n_q, n_k)

    def kv_row(bh, qi, ki):
        return (bh // h) * kh + (bh % h) // rep

    out_shape = (
        jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        jax.ShapeDtypeStruct((b * h, 8, s_pad), jnp.float32),
    )
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k, n_k=n_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, block_k), lambda bh, qi, ki: (bh // h, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (kv_row(bh, qi, ki), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, qi, ki: (kv_row(bh, qi, ki), ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi, ki: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(mask, qf, kf, vf)
    out = o.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
    return out, (qf, kf, vf, mask, o, lse, meta, block_q, block_k)  # lse: (BH, 8, S)


def _flash_bwd(res, g, interpret=False):
    qf, kf, vf, mask, o, lse, meta, block_q, block_k = res
    b, s, h, kh, d, rep, s_pad = meta
    n_q = s_pad // block_q
    n_k = s_pad // block_k
    scale = d**-0.5

    dof = jnp.pad(g, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    dof = dof.transpose(0, 2, 1, 3).reshape(b * h, s_pad, d)
    delta = jnp.sum(dof.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, None, :], (b * h, 8, s_pad))

    def kv_row(bh):
        return (bh // h) * kh + (bh % h) // rep

    # dq: grid over (bh, qi, ki)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, block_q=block_q, block_k=block_k, n_k=n_k
        ),
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, 8, block_k), lambda bh, qi, ki: (bh // h, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (kv_row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (kv_row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi, ki: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, qi, ki: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(mask, qf, kf, vf, dof, lse, delta)

    # dk/dv: grid over (bh, ki, qi); per-(bh) accumulation then head-sum for GQA
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, block_q=block_q, block_k=block_k, n_q=n_q
        ),
        grid=(b * h, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, 8, block_k), lambda bh, ki, qi: (bh // h, 0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (kv_row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (kv_row(bh), ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda bh, ki, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, ki, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, block_q), lambda bh, ki, qi: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, ki, qi: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, s_pad, d), kf.dtype),
            jax.ShapeDtypeStruct((b * h, s_pad, d), vf.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(mask, qf, kf, vf, dof, lse, delta)

    def unflatten_q(x):
        return x.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]

    dq_out = unflatten_q(dq)
    # GQA: sum gradients over the query heads sharing each kv head
    dk_g = dk.reshape(b, kh, rep, s_pad, d).sum(axis=2)
    dv_g = dv.reshape(b, kh, rep, s_pad, d).sum(axis=2)
    dk_out = dk_g.transpose(0, 2, 1, 3)[:, :s]
    dv_out = dv_g.transpose(0, 2, 1, 3)[:, :s]
    return dq_out, dk_out.astype(dq_out.dtype), dv_out.astype(dq_out.dtype), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, pad_mask, block_q, block_k, interpret):
    out, _ = _flash_fwd(q, k, v, pad_mask, block_q, block_k, interpret)
    return out


def _flash_vjp_fwd(q, k, v, pad_mask, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, pad_mask, block_q, block_k, interpret)


def _flash_vjp_bwd(block_q, block_k, interpret, res, g):
    return _flash_bwd(res, g, interpret)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array] = None,
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Causal flash attention; shapes as ops.attention.causal_attention.

    Raises NotImplementedError for configurations the kernel does not cover
    (the caller falls back to the XLA path).
    """
    b, s, h, d = q.shape
    if d % 8 != 0 or d > 256:
        raise NotImplementedError(f"head_dim {d} unsupported")
    if h % k.shape[2] != 0:
        raise NotImplementedError("num_heads must be divisible by kv heads")
    if s < 16:
        raise NotImplementedError("sequence too short for the tiled kernel")
    bq = min(block_q, int(np.ceil(s / 8) * 8))
    bk = min(block_k, bq)
    return _flash(q, k, v, pad_mask, bq, bk, interpret)


def flash_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array] = None,
    *,
    mesh,
    batch_axes=("dp", "fsdp"),
    head_axis: str = "tp",
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention under a device mesh via ``shard_map``.

    Attention is independent per (batch row, query-head group), so the
    kernel shards embarrassingly: batch over the data axes, heads over the
    tensor axis, sequence and head_dim local — no collectives.  GQA
    requires the kv heads to divide the ``tp`` axis size (each shard keeps
    whole kv groups, mirroring parallel/sharding.py's head partitioning).

    Fills the gap GSPMD cannot: a ``pallas_call`` is opaque to the
    partitioner, so without this wrapper the kernel would be replicated
    (or rejected) under a mesh (sdpa-path role, modeling_llama.py:538-541).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    present = [a for a in batch_axes if a in mesh.axis_names]
    batch_spec = tuple(present) if present else None
    head = head_axis if head_axis in mesh.axis_names else None
    q_spec = P(batch_spec, None, head, None)
    mask_spec = P(batch_spec, None)

    def local(qs, ks, vs, ms):
        return flash_attention(
            qs, ks, vs, ms, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, q_spec, q_spec, mask_spec),
        out_specs=q_spec,
        check_vma=False,
    )(q, k, v, pad_mask if pad_mask is not None else jnp.ones(q.shape[:2], jnp.int32))
