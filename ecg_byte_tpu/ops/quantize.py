"""Percentile min-max symbol quantizer, as fused jittable JAX ops.

Reference semantics (willxxy/ECG-Byte):
  - ``ecg_byte/utils/tokenizer_utils.py:14-19`` (``normalize_all``): shift by
    ``percentile_1 - 0.5``, scale by ``(percentile_99 + 0.5) - (percentile_1 - 0.5) + 1e-6``,
    clip to [0, 1], then ``min(floor(x * 26), 25)`` into a 26-letter alphabet.
  - ``ecg_byte/utils/tokenizer_utils.py:22-28`` (``reverse_normalize_all``):
    symbol index / 25 rescaled back to the percentile range.

The reference implements the symbol map with ``np.vectorize`` (a pure-Python
per-element loop); here the whole quantizer is one elementwise XLA fusion that
``vmap``s over leads and batch, producing uint8 symbol indices 0..25.  Strings
only materialize host-side (``quantized_to_string``) for interop with the BPE
pickle/corpus formats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

ALPHABET = "abcdefghijklmnopqrstuvwxyz"
NUM_SYMBOLS = len(ALPHABET)  # 26
_ALPHABET_BYTES = np.frombuffer(ALPHABET.encode(), dtype=np.uint8)  # 97..122
_BYTE_A = int(_ALPHABET_BYTES[0])  # ord('a') == 97


@functools.partial(jax.jit, static_argnames=())
def normalize_quantize(signal, p1, p99):
    """Quantize a signal into 26 symbol bins using global 1st/99th percentiles.

    Args:
      signal: float array, any shape (typically ``(..., 12, seg_len)``).
      p1: scalar, global 1st percentile of the training corpus.
      p99: scalar, global 99th percentile.

    Returns:
      ``(clipped_normalized, quantized)`` where ``clipped_normalized`` is the
      float signal mapped into [0, 1] and ``quantized`` is uint8 in [0, 25].
      Mirrors ``normalize_all`` (tokenizer_utils.py:14-19) except symbols are
      returned as integer bins, not letters.
    """
    signal = jnp.asarray(signal)
    lo = p1 - 0.5
    hi = p99 + 0.5
    normalized = (signal - lo) / (hi - lo + 1e-6)
    clipped = jnp.clip(normalized, 0.0, 1.0)
    quantized = jnp.minimum(
        jnp.floor(clipped * NUM_SYMBOLS), NUM_SYMBOLS - 1
    ).astype(jnp.uint8)
    return clipped, quantized


@jax.jit
def reverse_normalize(quantized, p1, p99):
    """Inverse of :func:`normalize_quantize` on symbol bins.

    Mirrors ``reverse_normalize_all`` (tokenizer_utils.py:22-28): bins are
    mapped back via ``bin / 25`` (NOT ``bin / 26``) into the percentile range.
    """
    lo = p1 - 0.5
    hi = p99 + 0.5
    clipped = jnp.asarray(quantized, jnp.float32) / (NUM_SYMBOLS - 1)
    return clipped * (hi - lo) + lo


def quantized_to_string(quantized) -> str:
    """Render uint8 symbol bins (0..25) as the reference's a-z string.

    Equivalent to ``''.join(symbol_signal.flatten())`` over the output of
    ``normalize_all`` (tokenizer_utils.py:18, data_loader.py:75).  Row-major
    flattening means a ``(12, L)`` ECG becomes 12 concatenated lead strings.
    """
    q = np.asarray(quantized, dtype=np.uint8).reshape(-1)
    return (q + _BYTE_A).tobytes().decode("ascii")


def string_to_quantized(text: str, shape=None) -> np.ndarray:
    """Inverse of :func:`quantized_to_string` (host-side)."""
    q = np.frombuffer(text.encode("ascii"), dtype=np.uint8) - _BYTE_A
    if shape is not None:
        q = q.reshape(shape)
    return q


def quantized_to_bytes(quantized) -> np.ndarray:
    """uint8 symbol bins 0..25 -> raw byte values 97..122 ('a'..'z')."""
    return np.asarray(quantized, dtype=np.uint8) + _BYTE_A


def bytes_to_quantized(b) -> np.ndarray:
    """Raw byte values 97..122 -> uint8 symbol bins 0..25."""
    return np.asarray(b, dtype=np.uint8) - _BYTE_A
