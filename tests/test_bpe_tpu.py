"""Token-exact parity of the TPU-parallel encoder vs the native trie encoder."""

import numpy as np
import pytest

from ecg_byte_tpu.ops import bpe_encode
from ecg_byte_tpu.ops.quantize import bytes_to_quantized, normalize_quantize
from ecg_byte_tpu.tokenizer import native


def _ecg_like_symbols(rng, n):
    steps = rng.integers(-1, 2, size=n).cumsum()
    return np.clip(steps % 26, 0, 25).astype(np.uint8)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(0)
    corpus = bytes((_ecg_like_symbols(rng, 20000) + ord("a")))
    _, merges = native.train(corpus, 200)
    return merges, native.NativeEncoder(merges)


def test_device_encode_matches_native(trained):
    merges, enc = trained
    automaton = bpe_encode.build_automaton(merges)
    rng = np.random.default_rng(3)
    for n in [1, 7, 500, 6000]:
        q = _ecg_like_symbols(rng, n)
        ids, count = bpe_encode.encode(q, automaton)
        got = np.asarray(ids)[: int(count)]
        want = enc.encode(bytes(q + ord("a")))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")
        # padding after count
        assert np.all(np.asarray(ids)[int(count):] == bpe_encode.PAD_TOKEN)


def test_device_encode_batched(trained):
    merges, enc = trained
    automaton = bpe_encode.build_automaton(merges)
    rng = np.random.default_rng(4)
    q = np.stack([_ecg_like_symbols(rng, 1200) for _ in range(5)])
    ids, counts = bpe_encode.encode(q, automaton)
    for b in range(5):
        want = enc.encode(bytes(q[b] + ord("a")))
        np.testing.assert_array_equal(np.asarray(ids[b])[: int(counts[b])], want)


def test_device_encode_uniform_symbols(trained):
    """Degenerate runs exercise overlap + longest-match heavily."""
    merges, enc = trained
    automaton = bpe_encode.build_automaton(merges)
    q = np.zeros(777, dtype=np.uint8)  # "aaaa..."
    ids, count = bpe_encode.encode(q, automaton)
    want = enc.encode(b"a" * 777)
    np.testing.assert_array_equal(np.asarray(ids)[: int(count)], want)


def test_quantize_and_encode_fused(trained):
    merges, enc = trained
    automaton = bpe_encode.build_automaton(merges)
    rng = np.random.default_rng(5)
    signal = rng.normal(size=(3, 12, 500)).astype(np.float32)
    p1, p99 = np.percentile(signal, 1), np.percentile(signal, 99)
    ids, counts = bpe_encode.quantize_and_encode(signal, p1, p99, automaton)
    assert ids.shape == (3, 6000)
    # parity with the two-step host path
    _, q = normalize_quantize(signal, p1, p99)
    q = np.asarray(q).reshape(3, -1)
    for b in range(3):
        want = enc.encode(bytes(q[b] + ord("a")))
        np.testing.assert_array_equal(np.asarray(ids[b])[: int(counts[b])], want)


def test_automaton_structure(trained):
    merges, _ = trained
    automaton = bpe_encode.build_automaton(merges)
    assert automaton.trans.shape[1] == 27
    # dead state absorbs; root has all 26 single-symbol children terminal
    assert np.all(np.asarray(automaton.trans)[0] == 0)
    root_children = np.asarray(automaton.trans)[1, :26]
    assert np.all(root_children > 0)
    toks = np.asarray(automaton.token)[root_children]
    np.testing.assert_array_equal(toks, np.arange(26) + ord("a"))


def test_conv_matcher_matches_native(trained):
    merges, enc = trained
    matcher = bpe_encode.build_matcher(merges)
    rng = np.random.default_rng(11)
    for n in [1, 7, 500, 6000]:
        q = _ecg_like_symbols(rng, n)
        ids, count = bpe_encode.encode(q, matcher)
        got = np.asarray(ids)[: int(count)]
        want = enc.encode(bytes(q + ord("a")))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")
        assert np.all(np.asarray(ids)[int(count):] == bpe_encode.PAD_TOKEN)


def test_conv_matcher_batched_and_uniform(trained):
    merges, enc = trained
    matcher = bpe_encode.build_matcher(merges)
    rng = np.random.default_rng(12)
    q = np.stack([_ecg_like_symbols(rng, 1200) for _ in range(5)])
    q[0] = 0  # "aaaa..." degenerate run
    ids, counts = bpe_encode.encode(q, matcher)
    for b in range(5):
        want = enc.encode(bytes(q[b] + ord("a")))
        np.testing.assert_array_equal(np.asarray(ids[b])[: int(counts[b])], want)


def test_conv_matcher_duplicate_sequences_last_wins():
    # two merges expanding to the same base sequence: trie keeps the later id
    merges = [([97, 98], 256), ([97, 98, 99], 257), ([97, 98, 99], 258)]
    matcher = bpe_encode.build_matcher(merges)
    ids, count = bpe_encode.encode(np.array([0, 1, 2], np.uint8), matcher)
    assert np.asarray(ids)[: int(count)].tolist() == [258]


def test_compact_variants_identical():
    """packed-sort (default), pair-sort, and scan+gather compaction agree
    bit-for-bit (BASELINE.md records their measured comparison)."""
    import numpy as np
    from ecg_byte_tpu.ops import bpe_encode as BE

    rng = np.random.default_rng(0)
    for b, n in ((4, 3000), (3, 257)):
        tok = rng.integers(97, 8191, (b, n)).astype(np.int32)
        vis = rng.random((b, n)) < 0.3
        vis[0, :5] = [True, False, True, True, False]
        ids0, c0 = BE._compact(tok, vis)
        ids1, c1 = BE._compact_sort_kv(tok, vis)
        ids2, c2 = BE._compact_scan_gather(tok, vis)
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids1))
        np.testing.assert_array_equal(np.asarray(ids0), np.asarray(ids2))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c2))
        # reference semantics: survivors left-aligned in original order
        want = [tok[i][vis[i]] for i in range(b)]
        for i in range(b):
            got = np.asarray(ids0[i][: c0[i]])
            np.testing.assert_array_equal(got, want[i])
