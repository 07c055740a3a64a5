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
