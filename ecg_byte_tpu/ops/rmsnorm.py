"""Fused RMSNorm Pallas kernel (forward + analytic backward).

Role replaced: the reference's torch ``LlamaRMSNorm`` (HF modeling_llama
RMSNorm, fp32 upcast semantics) — here the training-path norms cost a
measured 13.8 ms/step at the flagship 4x1024 shape under XLA
(TRAINPERF.md round 4b: ``_norm`` stubbed to identity moves 219.0 ->
205.2 ms/step), dominated by fusion-boundary materialization of the f32
intermediates around the remat tag, not by the arithmetic.  This kernel
reads the bf16 input once, keeps every f32 intermediate in VMEM, and
writes only the bf16 output; the backward recomputes the row statistics
in-kernel (nothing saved but the inputs) and emits dx in one pass plus a
grid-accumulated dw.

Math (row x, weight w, eps):
    r  = rsqrt(mean(x^2) + eps)
    y  = x * r * w
    dx = r * (g*w - x * r^2 * mean(g*w*x))        [per row]
    dw = sum_rows(g * x * r)

Numerics follow transformer._norm: statistics and products in f32, output
cast to the input dtype.  The f32 cast of x happens in-register inside the
kernel — bitwise-identical to XLA's ``convert(f32)`` on the same values —
and mean/rsqrt are the same lax ops, so forward parity with the XLA norm
is exact at f32 resolution (tests assert allclose at 1e-6 on f32 inputs
and bitwise-equal bf16 outputs where XLA produces them).

Measured (v5e, flagship 4x1024 LoRA step, scripts/norm_ab.py, two
independent round-5 sessions): under the "slim" remat policy the kernel
wins consistently — 189.1 -> 181.5 and 189.5 -> 182.3 ms/step (~7 ms,
half the 13.8 ms stubbed-norm cost; the rest is the norms XLA already
fuses well plus the final-norm/unembed pair this kernel also covers).
Under "dots" it is neutral-to-worse (181.5 -> 188.1, 187.9 -> 185.2 —
the dots policy recomputes norms in the backward where the kernel's
saved-input residuals add traffic).  Because the win is
remat-policy-dependent, the kernel is NOT a static default: bench_train
autotunes (remat x norm) per session and `ECG_BYTE_PALLAS_NORM=1` opts
interactive paths in.  The backward's scoped-VMEM footprint caps its row
block at 256 (36.5 MB demanded at bm=1024, d=2048 vs the 16 MB scoped
limit — first A/B session compile-OOM, fixed by DEFAULT_BWD_BLOCK_ROWS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM budget (16 MB on v5e) sets the block caps: the backward
# holds ~5 f32 row-block temps (xf, gf, gw, dx, dot products), so
# bm*d*4*5 must stay well under the limit — at d=2048, bm=1024 demanded
# 36.5 MB and the flagship train step failed to compile (norm_ab round 5).
DEFAULT_BLOCK_ROWS = 512
DEFAULT_BWD_BLOCK_ROWS = 256


def _fwd_kernel(x_ref, w_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    y = xf * r * w_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    wf = w_ref[...].astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=1, keepdims=True) + eps)
    gw = gf * wf
    dot = jnp.mean(gw * xf, axis=1, keepdims=True)
    dx_ref[...] = (r * (gw - xf * (r * r * dot))).astype(dx_ref.dtype)
    part = jnp.sum(gf * xf * r, axis=0, keepdims=True)  # (1, D) f32
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
    dw_ref[...] += part


def _row_view(x):
    return x.reshape(-1, x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def rmsnorm(x: jax.Array, w: jax.Array, eps: float,
            block_rows: int = DEFAULT_BLOCK_ROWS,
            interpret: bool = False) -> jax.Array:
    """Fused ``(x * rsqrt(mean(x^2)+eps)) * w`` over the last axis.

    ``x``: (..., D) with D a multiple of 128 and total rows a multiple of
    ``block_rows`` or smaller than it; ``w``: (D,).  Differentiable in
    both x and w (dw is grid-accumulated in the backward kernel).
    """
    return _rmsnorm_fwd(x, w, eps, block_rows, interpret)[0]


def _pick_block(n_rows: int, block_rows: int) -> int:
    if n_rows <= block_rows:
        return n_rows
    while n_rows % block_rows:
        block_rows //= 2
    return max(block_rows, 8)


def _rmsnorm_fwd(x, w, eps, block_rows, interpret=False):
    rows = _row_view(x)
    n, d = rows.shape
    bm = _pick_block(n, block_rows)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        interpret=interpret,
    )(rows, w.reshape(1, d))
    return y.reshape(x.shape), (x, w)


def _rmsnorm_bwd(eps, block_rows, interpret, res, g):
    x, w = res
    rows = _row_view(x)
    n, d = rows.shape
    bm = _pick_block(n, min(block_rows, DEFAULT_BWD_BLOCK_ROWS))
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(n // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(rows, w.reshape(1, d), _row_view(g))
    return dx.reshape(x.shape), dw.reshape(w.shape).astype(w.dtype)


rmsnorm.defvjp(_rmsnorm_fwd, _rmsnorm_bwd)


def supported(x: jax.Array, d: int) -> bool:
    """Shape gate: lane-aligned feature dim, row count tileable."""
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return d % 128 == 0 and (n % 8 == 0 or n < 8)
