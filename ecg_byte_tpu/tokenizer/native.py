"""ctypes bindings for the native BPE core (csrc/ecgbpe.cpp).

The shared library is built on demand with ``make`` (g++) the first time it is
needed.  All heavy lifting (merge learning over gigabyte corpora, trie
longest-match encoding) happens in C++; Python only moves numpy buffers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence, Tuple

import numpy as np

_CSRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC_DIR, "libecgbpe.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> None:
    subprocess.run(
        ["make", "-C", _CSRC_DIR],
        check=True,
        capture_output=True,
    )


def load_library() -> ctypes.CDLL:
    """Load (building if necessary) the native BPE library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(os.path.join(_CSRC_DIR, "ecgbpe.cpp"))
            and os.path.getmtime(os.path.join(_CSRC_DIR, "ecgbpe.cpp"))
            > os.path.getmtime(_LIB_PATH)
        ):
            _build_library()
        lib = ctypes.CDLL(_LIB_PATH)

        lib.ecgbpe_train.restype = ctypes.c_void_p
        lib.ecgbpe_train.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.ecgbpe_train_rescan.restype = ctypes.c_void_p
        lib.ecgbpe_train_rescan.argtypes = lib.ecgbpe_train.argtypes
        lib.ecgbpe_train_num_merges.restype = ctypes.c_int32
        lib.ecgbpe_train_num_merges.argtypes = [ctypes.c_void_p]
        lib.ecgbpe_train_ids_len.restype = ctypes.c_int64
        lib.ecgbpe_train_ids_len.argtypes = [ctypes.c_void_p]
        lib.ecgbpe_train_get_ids.restype = None
        lib.ecgbpe_train_get_ids.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ecgbpe_train_seq_total.restype = ctypes.c_int64
        lib.ecgbpe_train_seq_total.argtypes = [ctypes.c_void_p]
        lib.ecgbpe_train_get_merges.restype = None
        lib.ecgbpe_train_get_merges.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.ecgbpe_train_free.restype = None
        lib.ecgbpe_train_free.argtypes = [ctypes.c_void_p]

        lib.ecgbpe_encoder_new.restype = ctypes.c_void_p
        lib.ecgbpe_encoder_new.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.ecgbpe_encoder_max_token_len.restype = ctypes.c_int32
        lib.ecgbpe_encoder_max_token_len.argtypes = [ctypes.c_void_p]
        lib.ecgbpe_encode.restype = ctypes.c_int64
        lib.ecgbpe_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.ecgbpe_encoder_free.restype = None
        lib.ecgbpe_encoder_free.argtypes = [ctypes.c_void_p]

        _lib = lib
        return _lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def train(
    corpus: bytes, num_merges: int, verbose: bool = False,
    algorithm: str = "incremental",
) -> Tuple[np.ndarray, List[Tuple[List[int], int]]]:
    """Run native BPE merge learning.

    Returns ``(ids, merges)``: the merged corpus token ids and the
    reference-format merge list ``[(base_byte_seq, new_id), ...]``.

    ``algorithm="rescan"`` selects the reference algorithm (full corpus
    rescan per merge, rust_bpe/src/lib.rs:85-117) compiled in the same
    translation unit — used by the merge-learning benchmark and the
    algorithm-identity oracle test; both algorithms share the deterministic
    tie-break, so their outputs must be identical.
    """
    lib = load_library()
    entry = (lib.ecgbpe_train_rescan if algorithm == "rescan"
             else lib.ecgbpe_train)
    handle = entry(corpus, len(corpus), num_merges, int(verbose))
    try:
        n_merges = lib.ecgbpe_train_num_merges(handle)
        ids = np.empty(lib.ecgbpe_train_ids_len(handle), dtype=np.uint32)
        if ids.size:
            lib.ecgbpe_train_get_ids(handle, ids.ctypes.data)
        flat = np.empty(lib.ecgbpe_train_seq_total(handle), dtype=np.uint32)
        offsets = np.empty(n_merges + 1, dtype=np.int64)
        new_ids = np.empty(n_merges, dtype=np.uint32)
        if n_merges:
            lib.ecgbpe_train_get_merges(
                handle, flat.ctypes.data, offsets.ctypes.data, new_ids.ctypes.data
            )
        else:
            offsets[0] = 0
        merges = [
            (flat[offsets[i] : offsets[i + 1]].tolist(), int(new_ids[i]))
            for i in range(n_merges)
        ]
        return ids, merges
    finally:
        lib.ecgbpe_train_free(handle)


class NativeEncoder:
    """Trie longest-match encoder backed by the C++ core."""

    def __init__(self, merges: Sequence[Tuple[Sequence[int], int]]):
        self._lib = load_library()
        flat = np.asarray(
            [b for seq, _ in merges for b in seq], dtype=np.uint32
        )
        offsets = np.zeros(len(merges) + 1, dtype=np.int64)
        np.cumsum([len(seq) for seq, _ in merges], out=offsets[1:])
        ids = np.asarray([tid for _, tid in merges], dtype=np.uint32)
        # keep buffers alive for the encoder lifetime
        self._flat, self._offsets, self._ids = flat, offsets, ids
        self._handle = self._lib.ecgbpe_encoder_new(
            flat.ctypes.data if flat.size else None,
            offsets.ctypes.data,
            ids.ctypes.data if ids.size else None,
            len(merges),
        )
        self.max_token_len = self._lib.ecgbpe_encoder_max_token_len(self._handle)

    def encode(self, text: bytes) -> np.ndarray:
        out = np.empty(len(text), dtype=np.uint32)
        n = self._lib.ecgbpe_encode(self._handle, text, len(text), out.ctypes.data)
        return out[:n].copy()

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.ecgbpe_encoder_free(handle)
            self._handle = None
