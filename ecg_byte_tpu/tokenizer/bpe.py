"""BPE training / encoding public API, pickle-compatible with the reference.

The reference exposes ``rust_bpe.byte_pair_encoding(text, num_merges,
num_threads)`` and ``rust_bpe.encode_text(text, merges)`` (rust_bpe
lib.rs:58-63, 149-150) and pickles ``(vocab, merges)``
(tokenizer_utils.py:62-69).  This module keeps those call signatures and
artifact formats, backed by the native C++ core (csrc/ecgbpe.cpp), with a
pure-Python reference implementation retained as a parity oracle and fallback.

Determinism note: the reference's merge-selection argmax over a Rust HashMap
breaks count ties in unspecified iteration order (lib.rs:92-94).  Every
implementation here uses the documented total order (count desc, then smaller
(left, right) pair), so training is reproducible run-to-run.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Sequence, Tuple

from ecg_byte_tpu.tokenizer import native

Merges = List[Tuple[List[int], int]]


def byte_to_string(b: int) -> str:
    """Base-vocab rendering: ASCII char for b <= 127 else ``<b>`` (lib.rs:50-56)."""
    return chr(b) if b <= 127 else f"<{b}>"


def build_vocab(merges: Sequence[Tuple[Sequence[int], int]]) -> Dict[int, str]:
    """Reconstruct the id -> string vocab from merge base-byte sequences.

    Matches the incremental concatenation in the reference trainer
    (lib.rs:101-104): each merge token's string is the concatenation of its
    base bytes' renderings.
    """
    vocab = {i: byte_to_string(i) for i in range(256)}
    for seq, new_id in merges:
        vocab[int(new_id)] = "".join(byte_to_string(int(b)) for b in seq)
    return vocab


def _to_bytes(text) -> bytes:
    if isinstance(text, bytes):
        return text
    return text.encode("utf-8")


def byte_pair_encoding(
    text,
    num_merges: int,
    num_threads: int = 1,  # kept for signature parity; native core is serial+incremental
    verbose: bool = False,
):
    """Train BPE merges over ``text``; returns ``(ids, vocab, merges)``.

    Drop-in for ``rust_bpe.byte_pair_encoding`` (lib.rs:58-125).
    """
    del num_threads
    data = _to_bytes(text)
    if native.native_available():
        ids, merges = native.train(data, num_merges, verbose=verbose)
        ids = ids.tolist()
    else:
        ids, merges = bpe_train_reference(data, num_merges)
    vocab = build_vocab(merges)
    return ids, vocab, merges


class _EncoderCache:
    """Cache one native encoder per merges object identity."""

    def __init__(self):
        self._key = None
        self._encoder = None

    def get(self, merges) -> native.NativeEncoder:
        key = id(merges)
        if self._key != key or self._encoder is None:
            self._encoder = native.NativeEncoder(merges)
            self._key = key
        return self._encoder


_encoder_cache = _EncoderCache()


def encode_text(text, merges) -> List[int]:
    """Greedy longest-match encode; drop-in for ``rust_bpe.encode_text``."""
    data = _to_bytes(text)
    if native.native_available():
        return _encoder_cache.get(merges).encode(data).tolist()
    return encode_reference(data, merges)


def decode_text(encoded_ids, vocab) -> str:
    """Id sequence -> string via the vocab (tokenizer_utils.py:75-77)."""
    return "".join(vocab[int(i)] for i in encoded_ids)


def save_vocab_and_merges(vocab, merges, filename: str) -> None:
    with open(filename, "wb") as f:
        pickle.dump((vocab, merges), f)


def load_vocab_and_merges(filename: str):
    with open(filename, "rb") as f:
        vocab, merges = pickle.load(f)
    return vocab, merges


class BpeTokenizer:
    """Convenience object bundling (vocab, merges) with encode/decode."""

    def __init__(self, vocab: Dict[int, str], merges: Merges):
        self.vocab = vocab
        self.merges = merges
        self._encoder = (
            native.NativeEncoder(merges) if native.native_available() else None
        )

    @classmethod
    def train(cls, text, num_merges: int, verbose: bool = False) -> "BpeTokenizer":
        _, vocab, merges = byte_pair_encoding(text, num_merges, verbose=verbose)
        return cls(vocab, merges)

    @classmethod
    def load(cls, filename: str) -> "BpeTokenizer":
        vocab, merges = load_vocab_and_merges(filename)
        return cls(vocab, merges)

    def save(self, filename: str) -> None:
        save_vocab_and_merges(self.vocab, self.merges, filename)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text) -> List[int]:
        data = _to_bytes(text)
        if self._encoder is not None:
            return self._encoder.encode(data).tolist()
        return encode_reference(data, self.merges)

    def decode(self, ids) -> str:
        return decode_text(ids, self.vocab)


# ---------------------------------------------------------------------------
# Pure-Python reference implementations (parity oracles / fallback).


def bpe_train_reference(data: bytes, num_merges: int):
    """O(merges * corpus) rescan trainer mirroring rust lib.rs:85-117 exactly,
    with the documented deterministic tie-break."""
    ids = list(data)
    expansions: Dict[int, List[int]] = {}
    merges: Merges = []
    for m in range(num_merges):
        counts: Dict[Tuple[int, int], int] = {}
        for pair in zip(ids, ids[1:]):
            counts[pair] = counts.get(pair, 0) + 1
        if not counts:
            break
        # max count; ties -> smallest (a, b)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_id = 256 + m
        out = []
        i = 0
        while i < len(ids):
            if i + 1 < len(ids) and (ids[i], ids[i + 1]) == best:
                out.append(new_id)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        ids = out
        seq = []
        for part in best:
            seq.extend(expansions.get(part, [part]))
        expansions[new_id] = seq
        merges.append((seq, new_id))
    return ids, merges


def encode_reference(data: bytes, merges) -> List[int]:
    """Greedy longest-match trie encode mirroring rust lib.rs:149-193."""
    # Trie: node = {byte: child_node}, terminal token id stored under 'id'.
    root: dict = {}

    def insert(seq, token_id):
        node = root
        for b in seq:
            node = node.setdefault(int(b), {})
        node["id"] = int(token_id)

    for b in range(256):
        insert([b], b)
    for seq, token_id in merges:
        insert(seq, token_id)

    out: List[int] = []
    i = 0
    n = len(data)
    while i < n:
        node = root
        match_len = 0
        match_id = -1
        j = i
        while j < n:
            child = node.get(data[j])
            if child is None:
                break
            node = child
            if "id" in node:
                match_len = j - i + 1
                match_id = node["id"]
            j += 1
        if match_id >= 0:
            out.append(match_id)
            i += match_len
        else:
            out.append(data[i])
            i += 1
    return out
