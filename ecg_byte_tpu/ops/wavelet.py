"""Daubechies wavelet transforms as batched XLA convolutions.

The reference denoises each lead with pywt ``wavedec``/``waverec`` (db6,
level 4, symmetric padding) plus a soft threshold derived from the coarsest
detail band (preprocess_utils.py:43-62).  pywt loops leads in Python on the
host; here the whole transform is strided convolutions ``vmap``-able over
leads and batch, so a full batch of 12-lead records denoises in one XLA
program.

Filter construction is self-contained: Daubechies scaling coefficients come
from spectral factorization of the binomial polynomial (the classic
construction, matching pywt's tables to ~1e-10).  Conventions follow pywt:

  - ``dec_lo = rev(h)``, ``dec_hi = rev(qmf(h))``, ``rec_lo = h``,
    ``rec_hi = qmf(h)`` with ``qmf(h)[k] = (-1)^k h[L-1-k]``;
  - signal extension is half-sample symmetric;
  - DWT band length is ``floor((n + L - 1) / 2)`` and decimation keeps the
    odd phase of the full convolution.
"""

from __future__ import annotations

import functools
from math import comb
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class WaveletFilters(NamedTuple):
    dec_lo: np.ndarray
    dec_hi: np.ndarray
    rec_lo: np.ndarray
    rec_hi: np.ndarray

    @property
    def dec_len(self) -> int:
        return len(self.dec_lo)


@functools.lru_cache(maxsize=None)
def daubechies(p: int) -> WaveletFilters:
    """Construct the db``p`` filter bank (length 2p) by spectral factorization."""
    if p == 1:
        h = np.array([1.0, 1.0]) / np.sqrt(2.0)
    else:
        # P(y) = sum_{k=0}^{p-1} C(p-1+k, k) y^k (highest degree first)
        P = np.array([comb(p - 1 + k, k) for k in range(p - 1, -1, -1)], float)
        z_roots = []
        for y in np.roots(P):
            # y = (2 - z - 1/z) / 4  =>  z^2 + (4y - 2) z + 1 = 0
            r = np.roots(np.array([1.0, 4.0 * y - 2.0, 1.0]))
            z_roots.append(r[np.argmin(np.abs(r))])  # root inside unit circle
        poly = np.array([1.0 + 0.0j])
        for _ in range(p):
            poly = np.convolve(poly, [1.0, 1.0])  # (1 + z)^p
        for z in z_roots:
            poly = np.convolve(poly, [1.0, -z])
        h = np.real(poly)
        h *= np.sqrt(2.0) / h.sum()

    L = len(h)
    qmf = np.array([(-1) ** k * h[L - 1 - k] for k in range(L)])
    return WaveletFilters(
        dec_lo=h[::-1].copy(), dec_hi=qmf[::-1].copy(), rec_lo=h, rec_hi=qmf
    )


def _symmetric_extend(x: jax.Array, pad: int) -> jax.Array:
    """Half-sample symmetric extension on the last axis (pywt 'symmetric')."""
    if pad == 0:
        return x
    n = x.shape[-1]
    if pad <= n:
        # flip+concat (plain copies) instead of a constant-index gather —
        # TPU lowers gathers an order of magnitude slower than slices
        left = jnp.flip(x[..., :pad], -1)
        right = jnp.flip(x[..., n - pad :], -1)
        return jnp.concatenate([left, x, right], -1)
    idx = np.arange(-pad, n + pad)
    idx = np.mod(idx, 2 * n)
    idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
    return x[..., idx]


def _conv1d(x: jax.Array, kernels: jax.Array, stride: int) -> jax.Array:
    """Valid-mode correlation along the last axis for a stack of kernels.

    x: (..., n); kernels: (num_filters, L) -> (..., num_filters, out).
    """
    batch_shape = x.shape[:-1]
    flat = x.reshape((-1, 1, x.shape[-1]))
    out = jax.lax.conv_general_dilated(
        flat,
        kernels[:, None, :],
        window_strides=(stride,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGH,  # bf16_3x: ~2^-21 rel, no bf16 downcast
    )
    return out.reshape(batch_shape + out.shape[1:])


def dwt(x: jax.Array, filters: WaveletFilters) -> Tuple[jax.Array, jax.Array]:
    """Single-level DWT -> (approx, detail), pywt 'symmetric' mode."""
    L = filters.dec_len
    n = x.shape[-1]
    out_len = (n + L - 1) // 2
    ext = _symmetric_extend(x, L - 1)
    # Convolution == correlation with the flipped filter; pywt keeps the odd
    # phase of the full convolution, i.e. stride-2 starting at ext[1:].
    kernels = jnp.stack(
        [
            jnp.asarray(filters.dec_lo[::-1].copy(), x.dtype),
            jnp.asarray(filters.dec_hi[::-1].copy(), x.dtype),
        ]
    )
    dec = _conv1d(ext[..., 1:], kernels, stride=2)[..., :out_len]
    return dec[..., 0, :], dec[..., 1, :]


def idwt(
    ca: jax.Array, cd: jax.Array, filters: WaveletFilters, out_len: int
) -> jax.Array:
    """Single-level inverse DWT (pywt semantics), truncated to ``out_len``."""
    L = filters.dec_len

    def up(c):
        # zero-interleave via stack+reshape: a pure relayout, not the
        # strided scatter ``.at[::2].set`` lowers to (gather-class on TPU)
        z = jnp.zeros_like(c)
        return jnp.stack([c, z], axis=-1).reshape(
            c.shape[:-1] + (c.shape[-1] * 2,)
        )

    ua, ud = up(ca), up(cd)
    pad = jnp.zeros(ua.shape[:-1] + (L - 1,), ua.dtype)
    ua = jnp.concatenate([pad, ua, pad], -1)
    ud = jnp.concatenate([pad, ud, pad], -1)
    ka = jnp.asarray(filters.rec_lo[::-1].copy(), ca.dtype)[None]
    kd = jnp.asarray(filters.rec_hi[::-1].copy(), ca.dtype)[None]
    rec = _conv1d(ua, ka, 1)[..., 0, :] + _conv1d(ud, kd, 1)[..., 0, :]
    return rec[..., L - 2 : L - 2 + out_len]


def wavedec(x: jax.Array, filters: WaveletFilters, level: int) -> List[jax.Array]:
    """Multilevel DWT; returns ``[cA_level, cD_level, ..., cD_1]`` like pywt."""
    coeffs = []
    a = x
    for _ in range(level):
        a, d = dwt(a, filters)
        coeffs.append(d)
    coeffs.append(a)
    return coeffs[::-1]


def dec_lengths(n: int, dec_len: int, level: int) -> List[int]:
    """Approximation lengths per level during decomposition, innermost first.

    ``lengths[i]`` is the reconstruction target when applying detail
    ``coeffs[i + 1]`` in :func:`waverec`.
    """
    lengths = [n]
    m = n
    for _ in range(level - 1):
        m = (m + dec_len - 1) // 2
        lengths.append(m)
    return lengths[::-1]


def waverec(
    coeffs: Sequence[jax.Array], filters: WaveletFilters, lengths: Sequence[int]
) -> jax.Array:
    """Inverse of :func:`wavedec` given per-level target lengths."""
    a = coeffs[0]
    for i, d in enumerate(coeffs[1:]):
        a = idwt(a, d, filters, lengths[i])
    return a


def soft_threshold(c: jax.Array, threshold) -> jax.Array:
    """pywt.threshold(..., mode='soft'): sign(x) * max(|x| - t, 0)."""
    return jnp.sign(c) * jnp.maximum(jnp.abs(c) - threshold, 0.0)


@functools.lru_cache(maxsize=4)
def wavelet_operators(n: int, level: int = 4, p: int = 6):
    """Precomputed (analysis, synthesis) matrices for the fixed-length DWT.

    ``wavedec``/``waverec`` are LINEAR — for the fixed record lengths of
    this pipeline they collapse into two matmuls: ``coeffs = x @ W_dec^T``
    and ``rec = coeffs @ W_rec^T`` with only the (data-dependent) soft
    threshold between.  The conv-chain formulation costs ~15-25 ms per
    256x30k batch on v5e in small-channel convolutions and interleave
    relayouts; the operator form is two MXU matmuls (~5 ms) — the same
    trade ops/dsp.py makes for filtfilt and the cubic resample.

    Built by pushing identity matrices through the conv implementation on
    the host CPU backend (so the operator IS the conv path, bit-for-bit
    up to f32 summation order), disk-cached next to the dsp operators.

    Returns ``(w_dec (total, n), w_rec (n, total), seg_lens)``.
    """
    from ecg_byte_tpu.ops.dsp import _disk_cached

    filters = daubechies(p)

    def build():
        # escape any enclosing jit trace: the identity push must run
        # eagerly (host CPU backend) even when the operator is first
        # requested inside a traced pipeline
        cpu = jax.devices("cpu")[0]
        with jax.ensure_compile_time_eval(), jax.default_device(cpu):
            eye = jnp.eye(n, dtype=jnp.float32)
            coeffs = wavedec(eye, filters, level)  # [(n, len_i)...]
            seg = [int(c.shape[-1]) for c in coeffs]
            w_dec = np.concatenate(
                [np.asarray(c) for c in coeffs], axis=-1
            ).T  # (total, n)
            total = sum(seg)
            eye_c = jnp.eye(total, dtype=jnp.float32)
            parts = jnp.split(eye_c, np.cumsum(seg)[:-1].tolist(), axis=-1)
            lengths = dec_lengths(n, filters.dec_len, level)
            w_rec = np.asarray(
                waverec(list(parts), filters, lengths)
            ).T  # (n, total)
        # pack both into one cacheable array: [w_dec | w_rec^T] rows
        return np.concatenate([w_dec, w_rec.T], axis=0).astype(np.float32)

    packed = _disk_cached("wavelet", (n, level, p), build)
    # segment lengths are a pure function of (n, level, p)
    seg_lens = []
    m = n
    for _ in range(level):
        m = (m + filters.dec_len - 1) // 2
        seg_lens.append(m)
    seg_lens = [seg_lens[-1]] + seg_lens[::-1]  # [cA_L, cD_L, ..., cD_1]
    total = sum(seg_lens)
    # eager device arrays: concrete buffers are safe to reuse across jit
    # traces (a jnp constant created inside a trace is trace-bound) AND
    # lower as captured parameters instead of 100-MB HLO literals (which
    # overflow the remote-compile request limit)
    from ecg_byte_tpu.ops.dsp import as_device_constant

    w_dec = as_device_constant(packed[:total])
    w_rec = as_device_constant(np.ascontiguousarray(packed[total:].T))
    return w_dec, w_rec, tuple(seg_lens)


def wavelet_denoise_fused(
    x: jax.Array, level: int = 4, p: int = 6, epsilon: float = 1e-10
) -> jax.Array:
    """Operator-form :func:`wavelet_denoise`: matmul -> threshold -> matmul.

    Same math and threshold semantics; the two transforms run on the MXU
    via :func:`wavelet_operators`."""
    from ecg_byte_tpu.ops.dsp import apply_operator

    w_dec, w_rec, seg = wavelet_operators(x.shape[-1], level, p)
    c = apply_operator(x, w_dec)  # (..., total)
    ca_len = seg[0]
    details = c[..., ca_len:]
    cd_level = c[..., ca_len : ca_len + seg[1]]
    median_abs = jnp.median(jnp.abs(cd_level), axis=-1, keepdims=True)
    threshold = jnp.where(median_abs == 0, 0.0, median_abs / 0.6745)
    th = soft_threshold(details, threshold)
    keep = jnp.isfinite(th) & (jnp.abs(details) > epsilon)
    c = jnp.concatenate(
        [c[..., :ca_len], jnp.where(keep, th, 0.0)], axis=-1
    )
    rec = apply_operator(c, w_rec)  # w_rec is (out, in) already
    return jnp.nan_to_num(rec, nan=0.0, posinf=0.0, neginf=0.0)


def wavelet_denoise(
    x: jax.Array, level: int = 4, p: int = 6, epsilon: float = 1e-10
) -> jax.Array:
    """Reference ``wavelet_denoise`` (preprocess_utils.py:43-62) on device.

    x: (..., n) with any leading batch/lead dims.  db6 level-4 decomposition;
    threshold = median(|cD_level|) / 0.6745 (0 if the median is 0); soft
    threshold on every detail band with the reference's finite/epsilon
    masking; approximation band kept unchanged.
    """
    filters = daubechies(p)
    lengths = dec_lengths(x.shape[-1], filters.dec_len, level)

    coeffs = wavedec(x, filters, level)
    ca, details = coeffs[0], coeffs[1:]  # [cD_level, ..., cD_1]

    median_abs = jnp.median(jnp.abs(details[0]), axis=-1, keepdims=True)
    threshold = jnp.where(median_abs == 0, 0.0, median_abs / 0.6745)

    def safe(c):
        th = soft_threshold(c, threshold)
        keep = jnp.isfinite(th) & (jnp.abs(c) > epsilon)
        return jnp.where(keep, th, 0.0)

    rec = waverec([ca] + [safe(d) for d in details], filters, lengths)
    return jnp.nan_to_num(rec, nan=0.0, posinf=0.0, neginf=0.0)
