"""Test runner: greedy generation + per-sample metrics.

Mirrors ecg_byte/runners/inference.py: batch-size-1 greedy decode, two-stage
outputs post-processed with ``.split('?')[-1]`` (:23-26), per-sample metric
dicts with zero-fill on failure (:27-39), and the same averaging structure
(:49-69)."""

from __future__ import annotations

from typing import Callable, Dict

from tqdm import tqdm

from ecg_byte_tpu.utils.metrics import evaluate_strings

ZERO_RESULT = {
    "BLEU": 0,
    "METEOR": 0.0,
    "ROUGE": {"rouge-1": 0.0, "rouge-2": 0.0, "rouge-l": 0.0},
    "BERTSCORE": {"hf-prec": [0.0], "hf-rec": [0.0], "hf-f1": [0.0]},
}


def tester(
    generate_fn: Callable[[Dict], str],
    dataloader,
    *,
    two_stage: bool = False,
    dev: bool = False,
    desc: str = "Testing",
):
    """Evaluate generation over a loader of inference batches.

    ``generate_fn(batch) -> str`` wraps the model's decode + detokenize
    (prompt already sliced off)."""
    all_results, gt_answers, gen_answers, questions = [], [], [], []
    dev_count = 0
    for batch in tqdm(dataloader, desc=desc, leave=True):
        if batch is None:
            print("Skipping invalid batch")
            continue
        answers = batch["answer"]
        try:
            text = generate_fn(batch)
            # batched decode returns one string per row; scalar decode one
            texts = text if isinstance(text, list) else [text]
            if two_stage:
                texts = [t.split("?")[-1] for t in texts]
            for i, t in enumerate(texts):
                all_results.append(evaluate_strings([answers[i]], [t], None))
                gt_answers.append(answers[i])
                gen_answers.append(t)
                questions.append(batch["question"][i])
        except Exception as e:
            print("could not evaluate for some reason:", str(e))
            print(f"Error type: {type(e).__name__}")
            all_results.append(dict(ZERO_RESULT))
        if dev:
            dev_count += 1
            if dev_count == 10:
                break

    metric_sums = {
        "BLEU": 0.0, "METEOR": 0.0,
        "rouge-1": 0.0, "rouge-2": 0.0, "rouge-l": 0.0,
        "hf-prec": 0.0, "hf-rec": 0.0, "hf-f1": 0.0,
    }
    metric_counts = {k: 0 for k in metric_sums}
    metric_modes: Dict[str, set] = {}
    for entry in all_results:
        for key, value in entry.items():
            if key == "MODES":
                for m, mode in value.items():
                    metric_modes.setdefault(m, set()).add(mode)
            elif key in ("ROUGE", "ROUGE-HF", "BERTSCORE"):
                for sub_key, sub_value in value.items():
                    if key == "BERTSCORE":
                        metric_sums[sub_key] += sub_value[0]
                    else:
                        metric_sums[sub_key] += sub_value
                    metric_counts[sub_key] += 1
            else:
                metric_sums[key] += value
                metric_counts[key] += 1
    seed_averages = {
        k: (metric_sums[k] / metric_counts[k] if metric_counts[k] else 0.0)
        for k in metric_sums
    }
    return {
        "metrics": seed_averages,
        # which implementation produced each metric: e.g.
        # {"meteor": ["wordnet"], "bertscore": ["zero-fill"]}
        "metric_modes": {k: sorted(v) for k, v in metric_modes.items()},
        "qa_results": {
            "questions": questions,
            "gt_answers": gt_answers,
            "gen_answers": gen_answers,
        },
    }
