"""Native sentencepiece reader: proto round-trip, Viterbi/BPE segmentation.

No sentencepiece library exists in this environment, so correctness is
established structurally: write_spm -> SentencePieceModel round-trips
pieces/scores/types, and the segmenters are checked against hand-computed
optima (Viterbi max-score path, BPE best-pair order).
"""

import numpy as np

from ecg_byte_tpu.tokenizer.sp_model import (
    SPACE, MarianSpTokenizer, SentencePieceModel, write_spm,
)


def test_spm_roundtrip(tmp_path):
    pieces = [("<unk>", 0.0), ("▁the", -1.5), ("▁", -2.0), ("t", -3.0),
              ("h", -3.25), ("e", -3.5)]
    path = tmp_path / "m.spm"
    write_spm(str(path), pieces)
    m = SentencePieceModel(str(path))
    assert m.pieces == [p for p, _ in pieces]
    np.testing.assert_allclose(m.scores, [s for _, s in pieces], atol=1e-6)
    assert m.model_type == 1
    assert m.unk_piece == "<unk>"
    assert m.add_dummy_prefix


def test_viterbi_prefers_high_score_path(tmp_path):
    # "the" can be [▁the] (score -1.5) or [▁, t, h, e] (-11.75): Viterbi
    # must take the single piece; "ta" forces the char path + unk for 'a'
    pieces = [("<unk>", 0.0), ("▁the", -1.5), ("▁", -2.0), ("t", -3.0),
              ("h", -3.25), ("e", -3.5)]
    path = tmp_path / "m.spm"
    write_spm(str(path), pieces)
    m = SentencePieceModel(str(path))
    assert m.encode_pieces("the") == ["▁the"]
    assert m.encode_pieces("te") == ["▁", "t", "e"]
    # unknown char 'a' comes out as a single-char piece (unk at lookup)
    assert m.encode_pieces("ta") == ["▁", "t", "a"]
    # whitespace collapse + dummy prefix
    assert m.encode_pieces("  the   the ") == ["▁the", "▁the"]


def test_bpe_segmentation_merges_by_score(tmp_path):
    # BPE type: 'abc' with pieces ab(-1), bc(-0.5), abc absent ->
    # best-scored pair 'bc' merges first -> ['a', 'bc']
    pieces = [("<unk>", 0.0), ("a", -3.0), ("b", -3.0), ("c", -3.0),
              ("ab", -1.0), ("bc", -0.5), ("▁", -2.0)]
    path = tmp_path / "m.spm"
    write_spm(str(path), pieces, model_type=2)
    m = SentencePieceModel(str(path))
    assert m.model_type == 2
    assert m.encode_pieces("abc") == ["▁", "a", "bc"]


def test_marian_sp_tokenizer_surface(tmp_path):
    import json

    pieces = [("<unk>", 0.0), ("▁der", -1.0), ("▁herz", -1.0), ("▁", -2.0)]
    pieces += [(c, -3.0) for c in "derhz"]
    write_spm(str(tmp_path / "source.spm"), pieces)
    vocab = {"<pad>": 10, "</s>": 0, "<unk>": 1, "▁der": 2, "▁herz": 3,
             "▁": 4, "d": 5, "e": 6, "r": 7, "h": 8, "z": 9}
    json.dump(vocab, open(tmp_path / "vocab.json", "w"))
    tok = MarianSpTokenizer(str(tmp_path))
    enc = tok(["der herz", "der"])
    ids, mask = enc["input_ids"], enc["attention_mask"]
    assert ids.shape == mask.shape
    # eos closes each row; pads after
    row0 = ids[0][mask[0] == 1]
    assert row0[-1] == tok.eos_token_id
    assert list(row0[:-1]) == [2, 3]
    assert ids[1][mask[1] == 1][-1] == tok.eos_token_id
    assert (ids[1][mask[1] == 0] == tok.pad_token_id).all()
    # decode round-trip drops specials and restores spaces
    assert tok.batch_decode(ids) == ["der herz", "der"]


def test_charsmap_blob_roundtrip_and_longest_match():
    """DartsCharsMap.build emits the real blob layout (uint32 trie size +
    darts units + \\0-separated replacements) and the decoder applies
    longest-match rewrite semantics (sentencepiece normalizer.cc)."""
    from ecg_byte_tpu.tokenizer.sp_model import DartsCharsMap

    rules = {
        "ﬁ": "fi",        # LATIN SMALL LIGATURE FI (nmt_nfkc rule)
        "ℌ": "H",          # BLACK-LETTER CAPITAL H (NFKC compat)
        "：": ":",          # FULLWIDTH COLON
        " ": " ",          # NO-BREAK SPACE -> space (nmt rule)
        "ab": "X",              # multi-char key
        "abc": "Y",             # longer key must win (longest match)
    }
    cm = DartsCharsMap(DartsCharsMap.build(rules))
    assert cm.normalize("efﬁzient") == "effizient"
    assert cm.normalize("ℌerz： gut") == "Herz: gut"
    # longest match: "abc" -> Y, not "ab"+"c"
    assert cm.normalize("abc ab a") == "Y X a"
    # unmatched multi-byte characters copy through whole
    assert cm.normalize("müde 💙") == "müde 💙"


def test_charsmap_used_by_normalizer(tmp_path):
    """A model carrying a precompiled_charsmap normalizes with it (exact),
    overriding the NFKC approximation; segmentation sees the rewritten
    text."""
    from ecg_byte_tpu.tokenizer.sp_model import SentencePieceModel, write_spm

    path = str(tmp_path / "m.spm")
    pieces = [("<unk>", 0.0), ("▁", -1.0), ("▁fix", -0.5),
              ("f", -2.0), ("i", -2.0), ("x", -2.0)]
    write_spm(path, pieces, charsmap_rules={"ﬁ": "fi"})
    m = SentencePieceModel(path)
    assert m.charsmap is not None
    assert m.normalize("ﬁx") == "▁fix"
    assert m.encode_pieces("ﬁx") == ["▁fix"]
    # without the charsmap the same file falls back to NFKC (same result
    # for this rule — NFKC also folds the ligature; the difference is the
    # code path, asserted via the charsmap attribute above)
    write_spm(str(tmp_path / "n.spm"), pieces)
    m2 = SentencePieceModel(str(tmp_path / "n.spm"))
    assert m2.charsmap is None
    assert m2.encode_pieces("ﬁx") == ["▁fix"]


def test_charsmap_rejects_garbage():
    from ecg_byte_tpu.tokenizer.sp_model import DartsCharsMap
    import pytest

    with pytest.raises(ValueError):
        DartsCharsMap(b"\x01")
    with pytest.raises(ValueError):
        DartsCharsMap(b"\xff\xff\xff\xff123")  # trie size > blob
