"""Text-generation evaluation metrics + statistical analysis.

Mirrors ecg_byte/utils/model_utils.py:29-92: corpus BLEU (smoothing method1),
METEOR, ROUGE-1/2/L F, BERTScore, and the 5-seed mean/std/95% t-CI summary.
BERTScore requires a local BERT checkpoint; without one it is reported as
zeros and flagged (zero egress in this environment).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def early_stopping(validation_losses, patience: int = 5, delta: float = 0.0) -> bool:
    """Reference early stop (model_utils.py:17-27): stop when the latest loss
    exceeds the best loss observed at least ``patience`` epochs ago by delta."""
    if len(validation_losses) < patience + 1:
        return False
    best_loss = min(validation_losses[:-patience])
    return validation_losses[-1] > best_loss + delta


def calculate_bleu(references, hypotheses) -> float:
    from nltk.translate.bleu_score import SmoothingFunction, corpus_bleu

    smoother = SmoothingFunction()
    return corpus_bleu(
        [[r.split()] for r in references],
        [h.split() for h in hypotheses],
        smoothing_function=smoother.method1,
    )


def _ensure_wordnet() -> None:
    """Reference downloads wordnet at import (model_utils.py:6); do it lazily
    and tolerate offline environments (the metric then raises -> zero-fill)."""
    import nltk

    try:
        nltk.data.find("corpora/wordnet")
    except LookupError:
        try:
            nltk.download("wordnet", quiet=True)
        except Exception:
            pass


def _meteor_exact(ref: List[str], hyp: List[str]) -> float:
    """METEOR with exact unigram matching only (no wordnet): harmonic-mean
    F(alpha=0.9) with the standard fragmentation penalty.  Used as fallback
    when the wordnet corpus is unavailable offline."""
    if not hyp or not ref:
        return 0.0
    ref_avail = list(ref)
    pairs = []  # (hyp_idx, ref_idx)
    for i, h in enumerate(hyp):
        if h in ref_avail:
            j = ref_avail.index(h)
            ref_avail[j] = None
            pairs.append((i, ref.index(h)))
    m = len(pairs)
    if m == 0:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = precision * recall / (0.9 * precision + 0.1 * recall)
    # count chunks: contiguous in both hyp and ref order
    pairs.sort()
    chunks = 1
    for (i1, j1), (i2, j2) in zip(pairs, pairs[1:]):
        if not (i2 == i1 + 1 and j2 == j1 + 1):
            chunks += 1
    penalty = 0.5 * (chunks / m) ** 3
    return fmean * (1.0 - penalty)


def meteor_with_mode(references, hypotheses):
    """Returns (score, mode).  mode is "wordnet" (true METEOR) or "exact"
    (offline fallback: exact-unigram matching only) — reported results must
    say which path produced them."""
    _ensure_wordnet()
    try:
        from nltk.translate.meteor_score import meteor_score

        score = float(
            np.mean(
                [
                    meteor_score([r.split()], h.split())
                    for r, h in zip(references, hypotheses)
                ]
            )
        )
        return score, "wordnet"
    except LookupError:
        score = float(
            np.mean(
                [
                    _meteor_exact(r.split(), h.split())
                    for r, h in zip(references, hypotheses)
                ]
            )
        )
        return score, "exact"


def calculate_meteor(references, hypotheses) -> float:
    return meteor_with_mode(references, hypotheses)[0]


def calculate_rouge(references, hypotheses) -> Dict[str, float]:
    from rouge import Rouge

    scores = Rouge().get_scores(hypotheses, references, avg=True)
    return {
        "rouge-1": scores["rouge-1"]["f"],
        "rouge-2": scores["rouge-2"]["f"],
        "rouge-l": scores["rouge-l"]["f"],
    }


def bertscore_with_mode(references, hypotheses, device=None):
    """Returns (P/R/F1 dict, mode).  mode is "hf" (HF evaluate, reference
    path), "local-bert" (in-repo BERT against the checkpoint named by
    $ECG_BYTE_BERTSCORE_MODEL — utils/bertscore.py), or "zero-fill" (no
    scorer available offline)."""
    try:
        from evaluate import load  # optional dep, absent offline

        results = load("bertscore").compute(
            predictions=hypotheses, references=references, lang="en"
        )
        return {
            "hf-prec": results["precision"],
            "hf-rec": results["recall"],
            "hf-f1": results["f1"],
        }, "hf"
    except Exception:
        pass
    try:
        from ecg_byte_tpu.utils.bertscore import local_scorer_from_env

        scorer = local_scorer_from_env()
        if scorer is not None:
            results = scorer.score(references, hypotheses)
            return {
                "hf-prec": results["precision"],
                "hf-rec": results["recall"],
                "hf-f1": results["f1"],
            }, "local-bert"
    except Exception as e:
        print(f"local BERTScore failed ({e}); falling back to zero-fill")
    n = len(hypotheses)
    return {
        "hf-prec": [0.0] * n,
        "hf-rec": [0.0] * n,
        "hf-f1": [0.0] * n,
    }, "zero-fill"


def calculate_bertscore(references, hypotheses, device=None) -> Dict[str, List[float]]:
    """BERTScore P/R/F1; zeros when no local scorer model is available."""
    return bertscore_with_mode(references, hypotheses, device)[0]


def evaluate_strings(references, hypotheses, device=None) -> Dict:
    """Full metric dict per model_utils.py:56-64, plus a MODES entry that
    labels whether METEOR/BERTScore ran their real implementation or an
    offline fallback (silently changed numbers are worse than labeled ones)."""
    if len(references) != len(hypotheses):
        raise ValueError("The number of references and hypotheses must be the same.")
    meteor, meteor_mode = meteor_with_mode(references, hypotheses)
    bert, bert_mode = bertscore_with_mode(references, hypotheses, device)
    return {
        "BLEU": calculate_bleu(references, hypotheses),
        "METEOR": meteor,
        "ROUGE": calculate_rouge(references, hypotheses),
        "BERTSCORE": bert,
        "MODES": {"meteor": meteor_mode, "bertscore": bert_mode},
    }


def run_statistical_analysis(all_seeds_results: Sequence[Dict]) -> Dict:
    """5-seed mean/std/95% t-CI (model_utils.py:68-92)."""
    from scipy import stats

    metrics = list(all_seeds_results[0]["metrics"].keys())
    out = {}
    for metric in metrics:
        values = [r["metrics"][metric] * 100 for r in all_seeds_results]
        mean = float(np.mean(values))
        std = float(np.std(values, ddof=1)) if len(values) > 1 else 0.0
        dof = len(values) - 1
        t_value = stats.t.ppf(0.975, dof) if dof > 0 else 0.0
        margin = t_value * (std / np.sqrt(len(values))) if dof > 0 else 0.0
        out[metric] = {
            "mean": mean,
            "std": std,
            "conf_interval": (mean - margin, mean + margin),
            "raw_values": values,
        }
    return out
