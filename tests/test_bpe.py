"""BPE core tests: native C++ trainer/encoder vs pure-Python oracle,
round-trips, pickle format parity."""

import os
import pickle

import numpy as np
import pytest

from ecg_byte_tpu.tokenizer import (
    BpeTokenizer,
    byte_pair_encoding,
    build_vocab,
    decode_text,
    encode_text,
    load_vocab_and_merges,
    save_vocab_and_merges,
)
from ecg_byte_tpu.tokenizer import native
from ecg_byte_tpu.tokenizer.bpe import bpe_train_reference, encode_reference


def _random_ecg_like_text(rng, n=4000, alphabet=6):
    # Low-entropy a..z strings resembling quantized ECG: runs + noise
    steps = rng.integers(-1, 2, size=n).cumsum()
    vals = np.clip(steps % 26, 0, min(25, alphabet * 4))
    return bytes((vals + ord("a")).astype(np.uint8))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(42)
    return _random_ecg_like_text(rng, n=6000)


def test_native_builds():
    assert native.native_available()


def test_train_matches_python_oracle(corpus):
    ids_n, merges_n = native.train(corpus, 50)
    ids_p, merges_p = bpe_train_reference(corpus, 50)
    assert [tuple(m) for m in merges_n] == [tuple(m) for m in merges_p]
    assert ids_n.tolist() == ids_p


def test_train_new_ids_are_256_plus_index(corpus):
    _, merges = native.train(corpus, 20)
    for i, (_, new_id) in enumerate(merges):
        assert new_id == 256 + i


def test_merges_store_full_base_sequences(corpus):
    _, merges = native.train(corpus, 30)
    vocab = build_vocab(merges)
    for seq, new_id in merges:
        # base sequence rendered == vocab string (all bytes here are ascii)
        assert "".join(chr(b) for b in seq) == vocab[new_id]


def test_encode_native_matches_python(corpus):
    _, merges = native.train(corpus, 60)
    enc = native.NativeEncoder(merges)
    text = _random_ecg_like_text(np.random.default_rng(7), n=3000)
    np.testing.assert_array_equal(
        enc.encode(text), np.asarray(encode_reference(text, merges))
    )


def test_encode_roundtrip_decodes_exactly(corpus):
    ids_, vocab, merges = byte_pair_encoding(corpus, 80)
    text = _random_ecg_like_text(np.random.default_rng(9), n=2000)
    ids = encode_text(text, merges)
    assert decode_text(ids, vocab) == text.decode("ascii")


def test_training_corpus_ids_roundtrip(corpus):
    ids, vocab, merges = byte_pair_encoding(corpus, 80)
    # merged corpus ids decode to the original corpus
    assert decode_text(ids, vocab) == corpus.decode("ascii")
    # compression actually happened
    assert len(ids) < len(corpus)


def test_greedy_longest_match_not_merge_replay():
    """Greedy longest-match can differ from merge-order replay; we must match
    the trie algorithm (SURVEY.md §2.1)."""
    # token 'ab' then 'abc' exists via later merges: greedy picks 'abc'
    merges = [([97, 98], 256), ([97, 98, 99], 257)]
    ids = encode_text(b"abc", merges)
    assert ids == [257]


def test_overlapping_merge_left_to_right():
    # "aaaa" with pair (a,a): reference merges left-to-right -> [Z, Z]
    ids_p, merges = bpe_train_reference(b"aaaa", 1)
    assert merges[0] == ([97, 97], 256)
    assert ids_p == [256, 256]
    ids_n, merges_n = native.train(b"aaaa", 1)
    assert ids_n.tolist() == ids_p
    assert [tuple(m) for m in merges_n] == [tuple(m) for m in merges]


def test_pickle_format_parity(tmp_path, corpus):
    _, vocab, merges = byte_pair_encoding(corpus, 40)
    path = os.path.join(tmp_path, "tokenizer_40.pkl")
    save_vocab_and_merges(vocab, merges, path)
    v2, m2 = load_vocab_and_merges(path)
    assert v2 == vocab and m2 == merges
    # raw pickle structure matches reference (vocab, merges) tuple
    with open(path, "rb") as f:
        obj = pickle.load(f)
    assert isinstance(obj, tuple) and len(obj) == 2


def test_vocab_base_rendering():
    vocab = build_vocab([])
    assert vocab[97] == "a"
    assert vocab[200] == "<200>"
    assert len(vocab) == 256


def test_tokenizer_object(tmp_path, corpus):
    tok = BpeTokenizer.train(corpus, 64)
    assert tok.vocab_size == 256 + 64
    ids = tok.encode("abcabc")
    assert tok.decode(ids) == "abcabc"
    p = os.path.join(tmp_path, "tok.pkl")
    tok.save(p)
    tok2 = BpeTokenizer.load(p)
    assert tok2.encode("abcabc") == ids


def test_rescan_algorithm_identical_to_incremental(corpus):
    """The reference-algorithm trainer (full rescan per merge,
    rust_bpe/src/lib.rs:85-117, compiled in csrc for the merge-learning
    benchmark) must produce exactly the merges and corpus encoding the
    incremental trainer produces — both share the deterministic tie-break,
    so any divergence is a bug in one of them."""
    ids_i, merges_i = native.train(corpus, 80)
    ids_r, merges_r = native.train(corpus, 80, algorithm="rescan")
    assert [tuple(m) for m in merges_i] == [tuple(m) for m in merges_r]
    assert ids_i.tolist() == ids_r.tolist()


def test_rescan_algorithm_identical_on_degenerate_corpora():
    for corpus in (b"", b"a", b"aaaa" * 50, b"abab" * 40, bytes(range(256))):
        ids_i, merges_i = native.train(corpus, 20)
        ids_r, merges_r = native.train(corpus, 20, algorithm="rescan")
        assert [tuple(m) for m in merges_i] == [tuple(m) for m in merges_r]
        assert ids_i.tolist() == ids_r.tolist()
