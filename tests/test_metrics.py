"""Eval metrics + offline fallback labeling.

The reference (model_utils.py:29-92) silently assumes wordnet/BERTScore are
available; offline, our fallbacks must be LABELED in the outputs so reported
numbers are never mistaken for the real metric.
"""

import numpy as np

from ecg_byte_tpu.utils.metrics import (
    bertscore_with_mode,
    calculate_bleu,
    calculate_rouge,
    early_stopping,
    evaluate_strings,
    meteor_with_mode,
    run_statistical_analysis,
)

REFS = ["the quick brown fox jumps", "normal sinus rhythm"]
HYPS = ["the quick brown fox jumps", "sinus rhythm normal"]


def test_bleu_perfect_and_partial():
    assert calculate_bleu(["a b c d"], ["a b c d"]) > 0.99
    assert 0.0 < calculate_bleu(REFS, HYPS) < 1.0


def test_rouge_keys():
    r = calculate_rouge(REFS, HYPS)
    assert set(r) == {"rouge-1", "rouge-2", "rouge-l"}
    assert r["rouge-1"] > 0.9  # same unigrams in both pairs


def test_meteor_mode_labeled():
    score, mode = meteor_with_mode(REFS, HYPS)
    assert mode in ("wordnet", "exact")
    assert 0.0 < score <= 1.0
    # identical strings score higher than shuffled ones either way
    perfect, _ = meteor_with_mode(REFS, REFS)
    assert perfect >= score


def test_bertscore_mode_labeled():
    scores, mode = bertscore_with_mode(REFS, HYPS)
    assert mode in ("hf", "zero-fill")
    assert set(scores) == {"hf-prec", "hf-rec", "hf-f1"}
    if mode == "zero-fill":
        assert scores["hf-f1"] == [0.0, 0.0]


def test_evaluate_strings_carries_modes():
    out = evaluate_strings(REFS, HYPS)
    assert set(out["MODES"]) == {"meteor", "bertscore"}
    assert out["MODES"]["meteor"] in ("wordnet", "exact")


def test_tester_reports_metric_modes():
    from ecg_byte_tpu.infer.evaluate import tester

    class Loader:
        def __iter__(self):
            yield {"answer": ["the ecg shows normal sinus rhythm"],
                   "question": ["what rhythm?"]}

    res = tester(lambda batch: "the ecg shows normal sinus rhythm", Loader())
    assert set(res["metric_modes"]) == {"meteor", "bertscore"}
    assert res["metrics"]["BLEU"] > 0.99
    assert "MODES" not in res["metrics"]


def test_early_stopping_reference_semantics():
    assert not early_stopping([3, 2, 1], patience=5)
    assert early_stopping([5, 4, 3, 2, 1, 1, 1, 1, 1, 3.5], patience=5, delta=0.01)
    assert not early_stopping([5, 4, 3, 2, 1, 0.9, 0.8, 0.7, 0.6, 0.5], patience=5)


def test_statistical_analysis_tci():
    seeds = [{"metrics": {"BLEU": v}} for v in (0.50, 0.52, 0.48, 0.51, 0.49)]
    out = run_statistical_analysis(seeds)
    np.testing.assert_allclose(out["BLEU"]["mean"], 50.0)
    lo, hi = out["BLEU"]["conf_interval"]
    assert lo < 50.0 < hi
    assert len(out["BLEU"]["raw_values"]) == 5


# ---------------------------------------------------------------------------
# Offline BERTScore (utils/bertscore.py) + WordPiece tokenizer


import json
import os

import pytest


WORDS = ["the", "quick", "brown", "fox", "jumps", "normal", "sinus",
         "rhythm", "atrial", "fibrillation", "shows", "ecg"]
PIECES = ["un", "##aff", "##able", "##ly", "##ing", "##s", "wait", "run"]


@pytest.fixture(scope="module")
def bert_ckpt(tmp_path_factory):
    """Tiny random BERT checkpoint directory with a real vocab.txt."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("bert_ckpt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    vocab += list("abcdefghijklmnopqrstuvwxyz0123456789.,!?-")
    vocab += WORDS + PIECES
    (d / "vocab.txt").write_text("\n".join(vocab) + "\n")
    V, H, L, I = len(vocab), 32, 2, 64
    json.dump({"vocab_size": V, "hidden_size": H, "num_hidden_layers": L,
               "num_attention_heads": 4, "intermediate_size": I,
               "max_position_embeddings": 64, "type_vocab_size": 2,
               "layer_norm_eps": 1e-12}, open(d / "config.json", "w"))
    rng = np.random.default_rng(7)
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


def test_wordpiece_matches_hf_tokenizer(bert_ckpt):
    """Oracle: our WordPiece pipeline vs transformers.BertTokenizer on the
    same vocab (cleanup, lower-casing, punctuation, ## continuation, UNK)."""
    from transformers import BertTokenizer

    from ecg_byte_tpu.tokenizer.wordpiece import WordPieceTokenizer

    ours = WordPieceTokenizer(str(bert_ckpt / "vocab.txt"))
    hf = BertTokenizer(str(bert_ckpt / "vocab.txt"), do_lower_case=True)
    texts = [
        "The quick brown fox jumps!",
        "Normal sinus rhythm, no atrial fibrillation.",
        "unaffably waiting... RUNS running?",
        "weird\tspacing\n and  Café accents",
        "un-tokenizable Zzz 123 .,!?",
        "",
    ]
    for text in texts:
        assert ours.tokenize(text) == hf.tokenize(text), text
        want = hf.encode(text, add_special_tokens=True)
        assert ours.encode(text) == want, text


def test_local_bertscore_properties(bert_ckpt):
    from ecg_byte_tpu.utils.bertscore import LocalBertScorer

    scorer = LocalBertScorer(str(bert_ckpt))
    refs = ["the quick brown fox jumps", "normal sinus rhythm"]
    # identical pairs score exactly 1 (same contexts -> same embeddings)
    out = scorer.score(refs, list(refs))
    np.testing.assert_allclose(out["f1"], [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(out["precision"], [1.0, 1.0], atol=1e-5)
    # unrelated pairs score strictly lower and stay in [-1, 1]
    out2 = scorer.score(refs, ["atrial fibrillation shows", "fox ecg jumps"])
    for key in ("precision", "recall", "f1"):
        assert all(v < 0.999 for v in out2[key])
        assert all(-1.0 <= v <= 1.0 for v in out2[key])
    # word-overlap pair beats disjoint pair on recall
    out3 = scorer.score(["normal sinus rhythm"], ["sinus rhythm shows"])
    assert out3["recall"][0] > out2["recall"][1]


def test_bertscore_env_activates_local_mode(bert_ckpt, monkeypatch):
    from ecg_byte_tpu.utils import bertscore as bs

    monkeypatch.setenv(bs.MODEL_ENV, str(bert_ckpt))
    scores, mode = bertscore_with_mode(REFS, HYPS)
    assert mode == "local-bert"
    assert scores["hf-f1"][0] > 0.99  # identical first pair
    assert all(np.isfinite(scores["hf-f1"]))
    # and without the env var, offline -> zero-fill
    monkeypatch.delenv(bs.MODEL_ENV)
    _, mode2 = bertscore_with_mode(REFS, HYPS)
    assert mode2 == "zero-fill"
