"""Native SentencePiece ``.spm`` reader + segmenter (no sentencepiece pip).

The reference's translation step tokenizes German reports with
``MarianTokenizer``, which loads ``source.spm``/``target.spm`` through the
sentencepiece C++ library (/root/reference/ecg_byte/utils/
preprocess_utils.py:664-713 via transformers).  That library is not in
this environment and the package must stay torch/transformers-free, so
this module parses the ``.spm`` protobuf directly (a ModelProto is plain
varint-delimited proto2: repeated SentencePiece{piece=1, score=2, type=3}
in field 1, TrainerSpec in field 2, NormalizerSpec in field 3) and
implements both segmentation algorithms sentencepiece ships:

  - **unigram** (model_type=1, the opus-mt default): Viterbi best-path
    over piece log-probs, unknown characters at ``min_score - 10``
    (sentencepiece's kUnkPenalty);
  - **BPE** (model_type=2): iterative best-scored adjacent pair merge.

Normalization approximates ``nmt_nfkc`` with NFKC + whitespace collapse —
exact for the ASCII/Latin medical-report text this pipeline feeds.  A
``write_spm`` helper emits valid minimal models so tests can build
fixtures without the sentencepiece library.
"""

from __future__ import annotations

import json
import os
import struct
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

SPACE = "▁"

_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = 1, 2, 3, 4, 5, 6


# ---------------------------------------------------------------------------
# Minimal proto2 wire-format codec (varint + length-delimited only)


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _scan_fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a proto2 message body."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            val, i = buf[i : i + 8], i + 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            val, i = buf[i : i + ln], i + ln
        elif wt == 5:  # 32-bit
            val, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(no: int, wt: int, payload: bytes) -> bytes:
    return _varint((no << 3) | wt) + payload


def write_spm(path: str, pieces: Sequence[Tuple[str, float]],
              model_type: int = 1, unk_piece: str = "<unk>") -> None:
    """Write a minimal valid ModelProto (test fixtures / exports)."""
    body = bytearray()
    for piece, score in pieces:
        typ = _UNKNOWN if piece == unk_piece else _NORMAL
        sub = (
            _field(1, 2, _varint(len(piece.encode())) + piece.encode())
            + _field(2, 5, struct.pack("<f", score))
            + _field(3, 0, _varint(typ))
        )
        body += _field(1, 2, _varint(len(sub)) + sub)
    trainer = _field(3, 0, _varint(model_type))
    body += _field(2, 2, _varint(len(trainer)) + trainer)
    norm = _field(3, 0, _varint(1))  # add_dummy_prefix = true
    body += _field(3, 2, _varint(len(norm)) + norm)
    with open(path, "wb") as f:
        f.write(bytes(body))


class SentencePieceModel:
    """Parsed ``.spm``: pieces, scores, model type, segmentation."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            buf = f.read()
        self.pieces: List[str] = []
        self.scores: List[float] = []
        self.types: List[int] = []
        self.model_type = 1
        self.add_dummy_prefix = True
        self.remove_extra_whitespaces = True
        for field, _wt, val in _scan_fields(buf):
            if field == 1:  # SentencePiece
                piece, score, typ = "", 0.0, _NORMAL
                for f2, _w2, v2 in _scan_fields(val):
                    if f2 == 1:
                        piece = v2.decode("utf-8")
                    elif f2 == 2:
                        score = struct.unpack("<f", v2)[0]
                    elif f2 == 3:
                        typ = v2
                self.pieces.append(piece)
                self.scores.append(score)
                self.types.append(typ)
            elif field == 2:  # TrainerSpec
                for f2, _w2, v2 in _scan_fields(val):
                    if f2 == 3:  # model_type
                        self.model_type = v2
            elif field == 3:  # NormalizerSpec
                for f2, _w2, v2 in _scan_fields(val):
                    if f2 == 3:
                        self.add_dummy_prefix = bool(v2)
                    elif f2 == 4:
                        self.remove_extra_whitespaces = bool(v2)
        self.piece_to_id = {p: i for i, p in enumerate(self.pieces)}
        scorable = [
            s for s, t in zip(self.scores, self.types) if t == _NORMAL
        ]
        self._min_score = min(scorable) if scorable else 0.0
        self._max_piece_len = max((len(p) for p in self.pieces), default=1)
        self.unk_piece = next(
            (p for p, t in zip(self.pieces, self.types) if t == _UNKNOWN),
            "<unk>",
        )
        if self.model_type not in (1, 2):
            raise NotImplementedError(
                f"sentencepiece model_type {self.model_type} "
                "(only unigram=1 / bpe=2)"
            )

    # -- normalization (nmt_nfkc approximation) ------------------------------

    def normalize(self, text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        if self.remove_extra_whitespaces:
            text = " ".join(text.split())
        text = text.replace(" ", SPACE)
        if self.add_dummy_prefix and text:
            text = SPACE + text
        return text

    # -- segmentation ---------------------------------------------------------

    def encode_pieces(self, text: str) -> List[str]:
        s = self.normalize(text)
        if not s:
            return []
        if self.model_type == 2:
            return self._bpe_segment(s)
        return self._viterbi_segment(s)

    def _viterbi_segment(self, s: str) -> List[str]:
        n = len(s)
        unk_score = self._min_score - 10.0
        best = np.full(n + 1, -np.inf)
        best[0] = 0.0
        back: List[Optional[Tuple[int, str]]] = [None] * (n + 1)
        p2i = self.piece_to_id
        scores = self.scores
        types = self.types
        for i in range(n):
            if best[i] == -np.inf:
                continue
            # unknown single char is always available
            cand = best[i] + unk_score
            if cand > best[i + 1]:
                best[i + 1] = cand
                back[i + 1] = (i, s[i])
            for j in range(i + 1, min(n, i + self._max_piece_len) + 1):
                pid = p2i.get(s[i:j])
                if pid is None or types[pid] in (_CONTROL, _UNUSED):
                    continue
                cand = best[i] + scores[pid]
                if cand > best[j]:
                    best[j] = cand
                    back[j] = (i, s[i:j])
        out: List[str] = []
        i = n
        while i > 0:
            prev, piece = back[i]
            out.append(piece)
            i = prev
        return out[::-1]

    def _bpe_segment(self, s: str) -> List[str]:
        parts = list(s)
        p2i = self.piece_to_id
        scores = self.scores
        while len(parts) > 1:
            best_score, best_i = None, -1
            for i in range(len(parts) - 1):
                pid = p2i.get(parts[i] + parts[i + 1])
                if pid is None:
                    continue
                sc = scores[pid]
                if best_score is None or sc > best_score:
                    best_score, best_i = sc, i
            if best_score is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return parts


class MarianSpTokenizer:
    """MarianTokenizer equivalent: source.spm segmentation + vocab.json ids.

    Surface limited to what translate_reports consumes: ``__call__`` with
    padding/truncation -> numpy ids/mask (eos appended, right padding),
    ``batch_decode(skip_special_tokens=True)``.
    """

    def __init__(self, model_dir: str):
        self.sp = SentencePieceModel(os.path.join(model_dir, "source.spm"))
        with open(os.path.join(model_dir, "vocab.json"), encoding="utf-8") as f:
            self.vocab: Dict[str, int] = json.load(f)
        self.rev = {v: k for k, v in self.vocab.items()}
        self.pad_token, self.eos_token, self.unk_token = "<pad>", "</s>", "<unk>"
        self.pad_token_id = self.vocab[self.pad_token]
        self.eos_token_id = self.vocab[self.eos_token]
        self.unk_token_id = self.vocab.get(self.unk_token, 0)

    def encode(self, text: str, max_length: Optional[int] = None) -> List[int]:
        ids = [
            self.vocab.get(p, self.unk_token_id)
            for p in self.sp.encode_pieces(text)
        ]
        if max_length is not None:
            ids = ids[: max_length - 1]
        return ids + [self.eos_token_id]

    def __call__(self, texts, max_length: Optional[int] = 512,
                 truncation: bool = True, padding: bool = True):
        if isinstance(texts, str):
            texts = [texts]
        seqs = [self.encode(t, max_length if truncation else None)
                for t in texts]
        width = max((len(s) for s in seqs), default=0)
        ids = np.full((len(seqs), width), self.pad_token_id, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return {"input_ids": ids, "attention_mask": mask}

    def batch_decode(self, batch, skip_special_tokens: bool = True) -> List[str]:
        out = []
        specials = {self.pad_token_id, self.eos_token_id}
        for row in np.asarray(batch):
            pieces = []
            for tid in row:
                tid = int(tid)
                if skip_special_tokens and tid in specials:
                    continue
                pieces.append(self.rev.get(tid, self.unk_token))
            text = "".join(pieces).replace(SPACE, " ").strip()
            out.append(text)
        return out
