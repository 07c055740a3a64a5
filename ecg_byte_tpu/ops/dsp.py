"""ECG DSP chain as precompiled linear operators + batched XLA ops.

Reference chain (preprocess_utils.py:64-98,115-162): per record, scipy
``filtfilt`` with two notch biquads (50/60 Hz, Q=30), a Butterworth band-pass
(0.5-100 Hz, order 4) and a 0.05 Hz high-pass, then db6 wavelet denoising,
then cubic-spline resampling 500->250 Hz.  The reference runs this per lead
per record in Python/scipy on the host across process pools.

TPU-first observation: for fixed-length records every *filtering* stage is a
linear map of the input samples — ``filtfilt`` (odd padding, ``lfilter_zi``
edge handling and all) and cubic-spline interpolation are both linear.  So we
build the exact scipy operators ONCE on the host by pushing an identity
matrix through scipy itself (float64), and apply them on device as single
MXU matmuls over whole batches:

    y = x @ F.T        # the entire 4-pass filtfilt chain, one matmul
    z = wavelet_denoise(y)   # the only nonlinear stage (median threshold)
    r = z @ R.T        # cubic resample 5000 -> 2500, one matmul

This is bit-faithful to scipy up to float32 matmul rounding — no hand-rolled
IIR recursions to validate — and turns the host-bound preprocess stage into
two matmuls plus a wavelet transform per batch.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.ops.wavelet import wavelet_denoise


def _disk_cached(name: str, key: tuple, build):
    """Memoize an operator matrix on disk — scipy pushes a full identity
    through filtfilt/interp1d to build it (minutes of one-core time for
    n=5000), while the matrix itself is a pure function of the key."""
    import hashlib
    import os
    import tempfile

    cache_dir = os.environ.get(
        "ECG_BYTE_TPU_OP_CACHE",
        os.path.join(tempfile.gettempdir(), "ecg_byte_tpu_op_cache"),
    )
    digest = hashlib.sha1(repr((name,) + key).encode()).hexdigest()[:16]
    path = os.path.join(cache_dir, f"{name}_{digest}.npy")
    if os.path.exists(path):
        try:
            return np.load(path)
        except Exception:
            pass
    op = build()
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # np.save APPENDS .npy when the target lacks it — name the temp
        # with the suffix up front so the atomic rename source exists
        tmp = f"{path}.tmp{os.getpid()}.npy"
        with open(tmp, "wb") as f:
            np.save(f, op)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort
    return op


def as_device_constant(op) -> jax.Array:
    """Eagerly commit an operator matrix to the default device.

    A numpy operand closed over by a jitted function is inlined into the
    HLO as a literal — at 100 MB per operator the pipeline's compile
    payload blows past the remote-compile request limit (HTTP 413 on the
    axon tunnel).  A concrete jax.Array instead lowers as a captured
    PARAMETER.  ``ensure_compile_time_eval`` makes the upload eager even
    when the operator is first requested inside a trace, so the cached
    array is a real buffer, never a trace-bound constant.
    """
    with jax.ensure_compile_time_eval():
        return jnp.asarray(op)


@functools.lru_cache(maxsize=8)
def filtfilt_operator(
    n: int,
    fs: float = 500.0,
    notch_freqs: Tuple[float, ...] = (50.0, 60.0),
    highcut: float = 100.0,
    lowcut: float = 0.5,
    baseline_cutoff: float = 0.05,
    order: int = 4,
) -> np.ndarray:
    """[n, n] float32 operator equal to the reference ``advanced_ecg_filter``.

    Built by running scipy's own filtfilt chain (preprocess_utils.py:64-86
    parameters) over an identity matrix in float64, so padding/initial-state
    semantics are exactly scipy's.
    """
    def build():
        from scipy import signal as sps

        T = np.eye(n, dtype=np.float64)
        for f0 in notch_freqs:
            b, a = sps.iirnotch(f0, 30.0, fs)
            T = sps.filtfilt(b, a, T, axis=0)
        nyq = 0.5 * fs
        b, a = sps.butter(order, [lowcut / nyq, highcut / nyq], btype="band")
        T = sps.filtfilt(b, a, T, axis=0)
        b, a = sps.butter(order, baseline_cutoff / nyq, btype="high")
        T = sps.filtfilt(b, a, T, axis=0)
        return np.ascontiguousarray(T, dtype=np.float32)

    key = (n, fs, notch_freqs, highcut, lowcut, baseline_cutoff, order)
    return as_device_constant(_disk_cached("filtfilt", key, build))


@functools.lru_cache(maxsize=8)
def resample_operator(n: int, orig_fs: float, target_fs: float) -> np.ndarray:
    """[m, n] float32 cubic-interpolation operator (reference ``nsample_ecg``,
    preprocess_utils.py:88-98: scipy ``interp1d(kind='cubic')`` on matched
    endpoint-inclusive grids)."""
    def build():
        from scipy import interpolate

        duration = n / orig_fs
        t_orig = np.linspace(0, duration, n, endpoint=True)
        m = int(n * target_fs / orig_fs)
        t_target = np.linspace(0, duration, m, endpoint=True)
        f = interpolate.interp1d(
            t_orig,
            np.eye(n, dtype=np.float64),
            kind="cubic",
            axis=0,
            bounds_error=False,
            fill_value="extrapolate",
        )
        return np.ascontiguousarray(f(t_target), dtype=np.float32)

    return as_device_constant(
        _disk_cached("resample", (n, orig_fs, target_fs), build)
    )


def apply_operator(x: jax.Array, op, precision=jax.lax.Precision.HIGH) -> jax.Array:
    """Apply a precompiled [m, n] linear operator along the last (time) axis.

    Default precision is bf16_3x (measured ~4e-5 relative on v5e): the
    filter chain's parity contract is loose (passband-ripple RMS), so it
    takes the ~2.5x-cheaper passes; the cubic resample keeps full f32
    (HIGHEST) for its tight 2e-5 scipy bound.
    """
    return jnp.einsum(
        "...n,mn->...m",
        x,
        jnp.asarray(op),
        precision=precision,
    )


def advanced_ecg_filter(
    x: jax.Array,
    fs: float = 500.0,
    notch_freqs: Sequence[float] = (50.0, 60.0),
    highcut: float = 100.0,
) -> jax.Array:
    """Device equivalent of the reference filter chain on (..., time) arrays."""
    op = filtfilt_operator(x.shape[-1], fs, tuple(notch_freqs), highcut)
    return apply_operator(x, op)


def nsample_ecg(x: jax.Array, orig_fs: float, target_fs: float) -> jax.Array:
    """Device cubic resample along the last (time) axis."""
    op = resample_operator(x.shape[-1], orig_fs, target_fs)
    return apply_operator(x, op, precision=jax.lax.Precision.HIGHEST)


def check_nan_inf(x: jax.Array) -> jax.Array:
    """NaN/inf scrub (preprocess_utils.py:27-34): replace with zeros."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


# MIMIC lead reorder (preprocess_utils.py:36-41): aVR/aVF/aVL -> aVL/aVR/aVF.
_MIMIC_REORDER = np.array([0, 1, 2, 5, 3, 4, 6, 7, 8, 9, 10, 11])


def reorder_leads(x: jax.Array, lead_axis: int = -2) -> jax.Array:
    """Reorder MIMIC lead channels to the desired aVL/aVR/aVF order."""
    return jnp.take(x, jnp.asarray(_MIMIC_REORDER), axis=lead_axis)


def segment_ecg(x: jax.Array, seg_len: int) -> jax.Array:
    """(..., leads, time) -> (..., num_segments, leads, seg_len).

    Mirrors ``segment_ecg`` (preprocess_utils.py:100-113): consecutive
    non-overlapping windows; the tail shorter than seg_len is dropped.
    """
    num_segments = x.shape[-1] // seg_len
    trimmed = x[..., : num_segments * seg_len]
    parts = trimmed.reshape(x.shape[:-1] + (num_segments, seg_len))
    # (..., leads, num_segments, seg_len) -> (..., num_segments, leads, seg_len)
    return jnp.moveaxis(parts, -2, -3)


@functools.lru_cache(maxsize=4)
def preprocess_operators(
    n: int, fs: float, target_fs: float, level: int = 4, p: int = 6
):
    """Fold the pipeline's linear stages into TWO operators.

    Everything around the wavelet soft-threshold is linear:
    ``combined_dec = W_dec @ F`` (filtfilt chain then wavelet analysis,
    (total, n)) and ``combined_rec = R @ W_rec`` (wavelet synthesis then
    cubic resample, (m, total)).  The whole preprocess is then
    matmul -> threshold -> matmul — fewer passes over the batch AND a
    smaller compile payload (~150 MB of operator constants vs ~350 MB
    with four separate matrices, which overflowed the axon
    remote-compile request limit).

    Combination happens on the host in float64 over the f32 stage
    operators, so each stage keeps its scipy-exact build.
    """
    from ecg_byte_tpu.ops.wavelet import wavelet_operators

    f_op = np.asarray(filtfilt_operator(n, fs))  # (n, n)
    w_dec, w_rec, seg = wavelet_operators(n, level, p)
    w_dec = np.asarray(w_dec).astype(np.float64)
    w_rec = np.asarray(w_rec).astype(np.float64)
    dec = (w_dec @ f_op.astype(np.float64)).astype(np.float32)
    if target_fs != fs:
        r_op = np.asarray(resample_operator(n, fs, target_fs))  # (m, n)
        rec = (r_op.astype(np.float64) @ w_rec).astype(np.float32)
    else:
        rec = w_rec.astype(np.float32)
    return as_device_constant(dec), as_device_constant(rec), seg


@functools.partial(jax.jit, static_argnames=("fs", "target_fs", "do_reorder"))
def preprocess_records(
    signals: jax.Array,
    fs: float = 500.0,
    target_fs: float = 250.0,
    do_reorder: bool = False,
) -> jax.Array:
    """Full per-record preprocess: filter -> wavelet denoise -> resample.

    Mirrors ``process_instance`` (preprocess_utils.py:115-162) minus
    segmentation, for a whole batch at once.

    Args:
      signals: float [..., leads, time] (time-last; the reference stores
        (time, leads) — transpose before calling).
    Returns:
      float32 [..., leads, time * target_fs / fs].
    """
    from ecg_byte_tpu.ops.wavelet import soft_threshold

    x = check_nan_inf(jnp.asarray(signals, jnp.float32))
    if do_reorder:
        x = reorder_leads(x)
    # the whole linear pipeline folds into two operators around the
    # wavelet soft-threshold (see preprocess_operators); threshold
    # semantics identical to wavelet_denoise_fused/wavelet_denoise
    dec_op, rec_op, seg = preprocess_operators(x.shape[-1], fs, target_fs)
    c = apply_operator(x, dec_op)
    ca_len = seg[0]
    details = c[..., ca_len:]
    cd_level = c[..., ca_len : ca_len + seg[1]]
    median_abs = jnp.median(jnp.abs(cd_level), axis=-1, keepdims=True)
    threshold = jnp.where(median_abs == 0, 0.0, median_abs / 0.6745)
    th = soft_threshold(details, threshold)
    keep = jnp.isfinite(th) & (jnp.abs(details) > 1e-10)
    c = jnp.concatenate([c[..., :ca_len], jnp.where(keep, th, 0.0)], axis=-1)
    x = apply_operator(c, rec_op, precision=jax.lax.Precision.HIGHEST)
    return check_nan_inf(x)
