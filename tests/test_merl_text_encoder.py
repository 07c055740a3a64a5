"""MERL text tower runs transformers-free from a local BERT checkpoint:
``load_frozen_text_encoder`` tokenizes with the in-repo WordPiece
(tokenizer/wordpiece.py) from the checkpoint's vocab.txt — closing the
reference's MedCPT dependency (merl.py:197-201) without AutoTokenizer.
"""

import json

import numpy as np
import pytest

from ecg_byte_tpu.models import encoders as enc
from ecg_byte_tpu.tokenizer.wordpiece import WordPieceTokenizer

WORDS = ["heart", "rate", "rhythm", "normal", "sinus", "atrial"]
PIECES = ["##s", "##ing", "##ia", "fib", "##rillation"]


@pytest.fixture(scope="module")
def bert_ckpt(tmp_path_factory):
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("medcpt_ckpt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += list("abcdefghijklmnopqrstuvwxyz0123456789.,!?-")
    vocab += WORDS + PIECES
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    V, H, L, I = len(vocab), 32, 2, 64
    json.dump(
        {"vocab_size": V, "hidden_size": H, "num_hidden_layers": L,
         "num_attention_heads": 4, "intermediate_size": I,
         "max_position_embeddings": 64, "type_vocab_size": 2,
         "layer_norm_eps": 1e-12},
        open(d / "config.json", "w"),
    )
    rng = np.random.default_rng(0)
    t = {
        "embeddings.word_embeddings.weight": rng.normal(size=(V, H)),
        "embeddings.position_embeddings.weight": rng.normal(size=(64, H)),
        "embeddings.token_type_embeddings.weight": rng.normal(size=(2, H)),
        "embeddings.LayerNorm.weight": np.ones(H),
        "embeddings.LayerNorm.bias": np.zeros(H),
        "pooler.dense.weight": rng.normal(size=(H, H)),
        "pooler.dense.bias": np.zeros(H),
    }
    for i in range(L):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = rng.normal(size=(H, H))
            t[p + f"attention.self.{nm}.bias"] = np.zeros(H)
        t[p + "attention.output.dense.weight"] = rng.normal(size=(H, H))
        t[p + "attention.output.dense.bias"] = np.zeros(H)
        t[p + "attention.output.LayerNorm.weight"] = np.ones(H)
        t[p + "attention.output.LayerNorm.bias"] = np.zeros(H)
        t[p + "intermediate.dense.weight"] = rng.normal(size=(I, H))
        t[p + "intermediate.dense.bias"] = np.zeros(I)
        t[p + "output.dense.weight"] = rng.normal(size=(H, I))
        t[p + "output.dense.bias"] = np.zeros(H)
        t[p + "output.LayerNorm.weight"] = np.ones(H)
        t[p + "output.LayerNorm.bias"] = np.zeros(H)
    t = {k: (np.asarray(v) * 0.05).astype(np.float32) for k, v in t.items()}
    save_file(t, str(d / "model.safetensors"))
    return d


def test_frozen_encoder_uses_inrepo_wordpiece(bert_ckpt):
    encoder = enc.load_frozen_text_encoder(str(bert_ckpt))
    assert not isinstance(encoder, enc.HashTextEncoder)
    assert isinstance(encoder.tokenizer, WordPieceTokenizer)
    out = encoder.tokenizer(
        ["normal sinus rhythm", "atrial fibrillation!"],
        return_tensors="np", padding="max_length", max_length=16,
        truncation=True,
    )
    assert out.input_ids.shape == (2, 16)
    # [CLS] first, [SEP] closes the valid span, [PAD] after
    cls_id, sep_id, pad_id = (encoder.tokenizer.cls_id,
                              encoder.tokenizer.sep_id,
                              encoder.tokenizer.pad_id)
    for row, mask in zip(out.input_ids, out.attention_mask):
        n = int(mask.sum())
        assert row[0] == cls_id and row[n - 1] == sep_id
        assert all(row[n:] == pad_id)
    emb = encoder(out.input_ids, out.attention_mask)
    assert emb.shape == (2, 32) and np.all(np.isfinite(emb))


def test_wordpiece_call_matches_bert_tokenizer(bert_ckpt):
    """Oracle: the __call__ surface vs transformers.BertTokenizer with the
    same padding/truncation arguments."""
    transformers = pytest.importorskip("transformers")
    ours = WordPieceTokenizer(str(bert_ckpt / "vocab.txt"))
    hf = transformers.BertTokenizer(str(bert_ckpt / "vocab.txt"),
                                    do_lower_case=True)
    texts = ["Normal Sinus rhythm", "atrial fibrillation, heart rate 72!",
             "unknownword xyzzy", ""]
    got = ours(texts, return_tensors="np", padding="max_length",
               max_length=20, truncation=True)
    want = hf(texts, return_tensors="np", padding="max_length",
              max_length=20, truncation=True)
    np.testing.assert_array_equal(got.input_ids, want["input_ids"])
    np.testing.assert_array_equal(got.attention_mask, want["attention_mask"])


def test_broken_checkpoint_raises_without_optin(tmp_path):
    """A named-but-broken checkpoint must raise, not silently degrade the
    MERL baseline to hash embeddings (VERDICT r4 weak #6)."""
    d = tmp_path / "corrupt_ckpt"
    d.mkdir()
    (d / "config.json").write_text("{not json")
    with pytest.raises(RuntimeError, match="allow_hash_fallback"):
        enc.load_frozen_text_encoder(str(d))
    # explicit opt-in restores the old degrade-with-a-print behavior
    encoder = enc.load_frozen_text_encoder(str(d), allow_hash_fallback=True)
    assert isinstance(encoder, enc.HashTextEncoder)
    # no checkpoint named at all -> hash encoder, no error (unchanged)
    assert isinstance(enc.load_frozen_text_encoder(None), enc.HashTextEncoder)


def test_pretrain_dataset_resnet_uses_bert_template(bert_ckpt, tmp_path):
    from ecg_byte_tpu.data.two_stage import ECGCLIPPretrain, TwoStageConfig

    sig = tmp_path / "ecg_0_0.npy"
    txt = tmp_path / "text_0_0.json"
    np.save(sig, np.random.default_rng(0).normal(size=(12, 250)).astype(np.float32))
    json.dump("normal sinus rhythm", open(txt, "w"))
    tok = WordPieceTokenizer(str(bert_ckpt / "vocab.txt"))
    cfg = TwoStageConfig(dataset="mimic_500", model="resnet", percentiles=None,
                         num_patches=4, image_size=32, seed=0)
    ds = ECGCLIPPretrain([str(sig)], [str(txt)], tokenizer=tok, args=cfg)
    item = ds[0]
    ids = item["resnet_input_ids"]
    n = int(item["resnet_att_mask"].sum())
    assert ids[0] == tok.cls_id and ids[n - 1] == tok.sep_id
