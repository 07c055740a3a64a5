"""ECG BPE tokenizer: native C++ core + TPU-parallel encode.

Artifacts are pickle-compatible with the reference: ``(vocab, merges)`` where
``vocab`` maps token id -> rendered string and ``merges`` is a list of
``(base_byte_sequence, new_id)`` tuples (rust_bpe lib.rs:106-110 format).
"""

from ecg_byte_tpu.tokenizer.bpe import (  # noqa: F401
    BpeTokenizer,
    byte_pair_encoding,
    encode_text,
    decode_text,
    build_vocab,
    save_vocab_and_merges,
    load_vocab_and_merges,
)
from ecg_byte_tpu.tokenizer.wordpiece import WordPieceTokenizer  # noqa: F401
