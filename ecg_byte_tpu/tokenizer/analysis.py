"""Token-level analysis: usage distributions and encoding span tracking.

Counterparts of tokenizer_utils.py:30-54 (``analyze_token_distribution``)
and :95-134 (``track_encoding``).  The reference's ``track_encoding`` replays
merges pairwise and silently no-ops on rust-format merge lists (the tuple ==
list comparison is always False, SURVEY.md quirks); here spans come directly
from the greedy longest-match encoding — each token covers
``len(vocab[id])`` symbols — which is exact for the trie encoder.
"""

from __future__ import annotations

from collections import Counter
from concurrent.futures import ThreadPoolExecutor
from typing import List, Sequence, Tuple

import numpy as np

from ecg_byte_tpu.ops.quantize import quantized_to_string
from ecg_byte_tpu.tokenizer.bpe import build_vocab
from ecg_byte_tpu.tokenizer import native


def quantize_file(path: str, percentiles) -> str:
    signal = np.load(path)
    lo = percentiles["percentile_1"] - 0.5
    hi = percentiles["percentile_99"] + 0.5
    clipped = np.clip((signal - lo) / (hi - lo + 1e-6), 0.0, 1.0)
    q = np.minimum(np.floor(clipped * 26), 25).astype(np.uint8)
    return quantized_to_string(q)


def analyze_token_distribution(
    paths: Sequence[str], merges, percentiles, num_workers: int = 4
) -> Tuple[Counter, List[int]]:
    """Per-ECG token histograms + encoded lengths (tokenizer_utils.py:30-45)."""
    encoder = native.NativeEncoder(merges)

    def one(path):
        ids = encoder.encode(quantize_file(path, percentiles).encode("ascii"))
        return Counter(ids.tolist()), len(ids)

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as ex:
        results = list(ex.map(one, paths))
    token_counts: Counter = Counter()
    token_lengths: List[int] = []
    for count, length in results:
        token_counts.update(count)
        token_lengths.append(length)
    return token_counts, token_lengths


def track_encoding(text: str, merges) -> Tuple[List[int], List[Tuple[int, int]]]:
    """Encode + per-token (start, end) symbol spans.

    Returns the same ``(ids, segment_map)`` contract as the reference
    (tokenizer_utils.py:95-134) but derived from the actual greedy encoding.
    """
    encoder = native.NativeEncoder(merges)
    vocab = build_vocab(merges)
    ids = encoder.encode(text.encode("utf-8")).tolist()
    segment_map: List[Tuple[int, int]] = []
    pos = 0
    for token_id in ids:
        length = len(vocab[int(token_id)])
        segment_map.append((pos, pos + length))
        pos += length
    return ids, segment_map
