"""Pallas BPE encode path: exactness vs the conv matcher and native trie."""

import numpy as np
import pytest

from ecg_byte_tpu.ops import bpe_encode, bpe_match
from ecg_byte_tpu.ops.quantize import quantized_to_string
from ecg_byte_tpu.tokenizer import native


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(0)
    # random-walk symbols give realistic repeated motifs
    walk = np.cumsum(rng.integers(-2, 3, size=4000))
    corpus_q = (np.abs(walk) % 26).astype(np.uint8)
    corpus = quantized_to_string(corpus_q).encode()
    _, merges = native.train(corpus, 80)
    q = (np.abs(np.cumsum(rng.integers(-2, 3, size=(3, 240)), axis=1)) % 26
         ).astype(np.uint8)
    return merges, q


def test_pallas_encode_matches_conv_and_native(toy):
    merges, q = toy
    pm = bpe_match.build_pallas_matcher(merges)
    cm = bpe_encode.build_matcher(merges)
    ids_p, cnt_p = bpe_match.encode(q, pm, tile_n=128, interpret=True)
    ids_c, cnt_c = bpe_encode.encode(q, cm)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_c))
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_c))
    # oracle: native trie encoder row by row
    enc = native.NativeEncoder(merges)
    for i, row in enumerate(np.asarray(q)):
        want = [int(t) for t in enc.encode(quantized_to_string(row).encode())]
        got = [int(t) for t in np.asarray(ids_p)[i][: int(cnt_p[i])]]
        assert got == want


def test_pallas_single_stream(toy):
    merges, q = toy
    pm = bpe_match.build_pallas_matcher(merges)
    ids, cnt = bpe_match.encode(q[0], pm, tile_n=128, interpret=True)
    enc = native.NativeEncoder(merges)
    want = [int(t) for t in enc.encode(quantized_to_string(q[0]).encode())]
    assert [int(t) for t in np.asarray(ids)[: int(cnt)]] == want


def test_longest_match_matches_conv(toy):
    merges, q = toy
    pm = bpe_match.build_pallas_matcher(merges)
    cm = bpe_encode.build_matcher(merges)
    import jax

    mt_p, ml_p = jax.jit(
        lambda x: bpe_match.longest_match(x, pm, tile_n=128, interpret=True)
    )(q)
    mt_c, ml_c = jax.jit(
        lambda x: bpe_encode._longest_match_conv(x.astype(np.int32), cm)
    )(q)
    np.testing.assert_array_equal(np.asarray(ml_p), np.asarray(ml_c))
    np.testing.assert_array_equal(np.asarray(mt_p), np.asarray(mt_c))


def test_long_tokens_fail_loudly():
    # The chain kernel's rolling window is _WINDOW rows: a vocabulary with a
    # longer token must be rejected at build time (callers then fall back to
    # the conv matcher) rather than silently producing wrong streams.
    long_tok = tuple(ord("a") + (i % 26) for i in range(bpe_match._WINDOW + 1))
    merges = [((ord("a"), ord("b")), 256), (long_tok, 257)]
    with pytest.raises(ValueError, match="exceeds the kernel window"):
        bpe_match.build_pallas_matcher(merges)
    with pytest.raises(ValueError, match="exceeds the chain-kernel window"):
        bpe_match.build_pallas_matcher(merges, max_width=32)


def test_boundary_vocabulary_exact():
    """Kernel-table boundary cases: a token of exactly _WINDOW symbols
    (max cadd digits), id at the 8191 packing limit, and an all-'a'
    token (cadd == 0 — the hit constant must still distinguish it from
    padded table columns)."""
    w = bpe_match._WINDOW
    a = ord("a")
    merges = [
        (tuple(a + (i % 26) for i in range(w)), 300),  # length == _WINDOW
        ((a, a), 8191),  # id at the packing limit; cadd == 0
        ((a + 1, a + 2, a + 1), 270),
    ]
    pm = bpe_match.build_pallas_matcher(merges)
    assert pm.max_len == w
    enc = native.NativeEncoder(merges)
    rng = np.random.default_rng(5)
    q = (rng.integers(0, 3, size=(2, 4 * w))).astype(np.uint8)  # a/b/c heavy
    q[0, :w] = [(i % 26) for i in range(w)]  # plant the long token
    ids, cnt = bpe_match.encode(q, pm, tile_n=128, interpret=True)
    for i, row in enumerate(np.asarray(q)):
        want = [int(t) for t in enc.encode(quantized_to_string(row).encode())]
        got = [int(t) for t in np.asarray(ids)[i][: int(cnt[i])]]
        assert got == want
    with pytest.raises(ValueError, match="packing limit"):
        bpe_match.build_pallas_matcher([((a, a), 8192)])


def test_chain_matches_scan(toy):
    merges, q = toy
    cm = bpe_encode.build_matcher(merges)
    import jax

    mt, ml = jax.jit(
        lambda x: bpe_encode._longest_match_conv(x, cm)
    )(q.astype(np.int32))
    vis_scan = bpe_encode._greedy_chain_scan(ml, cm.max_len)
    vis_pl = bpe_match.greedy_chain(ml, tile_rows=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(vis_scan), np.asarray(vis_pl))


def test_val_and_iddot_epilogues_identical(toy):
    """The round-4 packed-value-max epilogue and the id-dot epilogue are
    output-identical (the val kernel serves ids < 4096; id-dot remains
    the wide-id fallback)."""
    import numpy as np
    from ecg_byte_tpu.ops import bpe_match

    merges, recs = toy
    m = bpe_match.build_pallas_matcher(merges)
    assert m.use_val  # toy ids are < 4096
    m_old = m._replace(use_val=False)
    q = np.asarray(recs, np.uint8).reshape(len(recs), -1)
    tv, lv = bpe_match.longest_match(q, m, interpret=True, bits=False)
    to, lo = bpe_match.longest_match(q, m_old, interpret=True)
    np.testing.assert_array_equal(np.asarray(tv), np.asarray(to))
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(lo))


def test_bits_and_inker_kernels_identical(toy):
    """The round-4d packed-pair bit-plane kernel (two positions per
    output column, mismatch-bit-count identity) is output-identical to
    the single-position arithmetic-identity kernel."""
    merges, recs = toy
    m = bpe_match.build_pallas_matcher(merges)
    assert m.use_bits  # toy vocab: ids < 4096 and max_len <= 12
    q = np.asarray(recs, np.uint8).reshape(len(recs), -1)
    tb, lb = bpe_match.longest_match(q, m, tile_n=256, interpret=True,
                                     bits=True)
    ti, li = bpe_match.longest_match(q, m, tile_n=256, interpret=True,
                                     bits=False)
    np.testing.assert_array_equal(np.asarray(tb), np.asarray(ti))
    np.testing.assert_array_equal(np.asarray(lb), np.asarray(li))


def test_bits_encode_exact(toy):
    """End-to-end encode through the bits kernel (tile_n % 256 == 0
    auto-engages it) is byte-exact vs the native trie."""
    merges, q = toy
    pm = bpe_match.build_pallas_matcher(merges)
    assert pm.use_bits
    ids, cnt = bpe_match.encode(q, pm, tile_n=256, interpret=True)
    enc = native.NativeEncoder(merges)
    for i, row in enumerate(np.asarray(q)):
        want = [int(t) for t in enc.encode(quantized_to_string(row).encode())]
        got = [int(t) for t in np.asarray(ids)[i][: int(cnt[i])]]
        assert got == want


def test_bits_boundary_vocabulary():
    """Bits-kernel boundary cases: a token at the _BITS_MAX_LEN = 12
    packing bound (mismatch field c <= 60 < 64), a max-set-bits symbol
    (25 = 0b11001), an all-'a' token (badd == 0, must still differ from
    padded all-zero table columns via pcol), and a length-13 vocabulary
    that must fall back to the arithmetic-identity kernel."""
    a = ord("a")
    w = bpe_match._BITS_MAX_LEN
    merges = [
        (tuple(a + ((i * 7) % 26) for i in range(w)), 300),  # len == 12
        ((a, a), 4095),  # badd == 0, id at the val packing limit
        ((a + 25, a + 25, a + 25), 270),  # symbol 25: most set bits
    ]
    pm = bpe_match.build_pallas_matcher(merges)
    assert pm.use_bits and pm.bwidth == w
    enc = native.NativeEncoder(merges)
    rng = np.random.default_rng(7)
    q = (rng.integers(0, 26, size=(2, 4 * w)) % 26).astype(np.uint8)
    q[0, :w] = [(i * 7) % 26 for i in range(w)]  # plant the long token
    q[1, :3] = 25  # plant the max-bits token
    ids, cnt = bpe_match.encode(q, pm, tile_n=256, interpret=True)
    for i, row in enumerate(np.asarray(q)):
        want = [int(t) for t in enc.encode(quantized_to_string(row).encode())]
        got = [int(t) for t in np.asarray(ids)[i][: int(cnt[i])]]
        assert got == want

    merges13 = [(tuple(a + (i % 26) for i in range(w + 1)), 300),
                ((a, a), 257)]
    pm13 = bpe_match.build_pallas_matcher(merges13)
    assert pm13.use_val and not pm13.use_bits  # inker fallback
    q13 = np.zeros((1, 4 * w), np.uint8)
    q13[0, :w + 1] = [(i % 26) for i in range(w + 1)]
    enc13 = native.NativeEncoder(merges13)
    ids13, cnt13 = bpe_match.encode(q13, pm13, tile_n=256, interpret=True)
    want = [int(t) for t in
            enc13.encode(quantized_to_string(q13[0]).encode())]
    assert [int(t) for t in np.asarray(ids13)[0][: int(cnt13[0])]] == want
    with pytest.raises(ValueError, match="bits kernel requires"):
        bpe_match.longest_match(q13.astype(np.int32), pm13, tile_n=256,
                                interpret=True, bits=True)
