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
