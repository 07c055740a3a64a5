"""End-to-end CLI smoke tests: train_tokenizer -> main train -> main inference,
exercising the real command surface in subprocesses on a toy dataset."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-m"] + cmd, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"{cmd} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    for split, n in [("train", 8), ("val", 3), ("test", 3)]:
        os.makedirs(root / f"data/ptb_500/ecg/{split}")
        os.makedirs(root / f"data/ptb_500/text/{split}")
        for i in range(n):
            sig = (np.cumsum(rng.normal(size=(12, 80)), -1) * 0.05).astype(np.float32)
            np.save(root / f"data/ptb_500/ecg/{split}/ecg_{i}_0.npy", sig)
            with open(root / f"data/ptb_500/text/{split}/text_{i}_0.json", "w") as f:
                json.dump("Sinus rhythm, normal ECG.", f)
    paths = [str(root / f"data/ptb_500/ecg/train/ecg_{i}_0.npy") for i in range(8)]
    allsig = np.stack([np.load(p) for p in paths])
    np.save(
        root / "data/stats.npy",
        {
            "percentile_1": float(np.percentile(allsig, 1)),
            "percentile_99": float(np.percentile(allsig, 99)),
            "global_min": float(allsig.min()),
            "global_max": float(allsig.max()),
        },
    )
    with open(root / "data/sampled_ecg_files_8.txt", "w") as f:
        f.write("\n".join(paths))
    # build the tokenizer here so every test in this module is standalone
    from ecg_byte_tpu.ops.quantize import normalize_quantize, quantized_to_string
    from ecg_byte_tpu.tokenizer import BpeTokenizer

    stats = np.load(root / "data/stats.npy", allow_pickle=True).item()
    _, q = normalize_quantize(allsig, stats["percentile_1"], stats["percentile_99"])
    corpus = "".join(quantized_to_string(np.asarray(qi)) for qi in q)
    BpeTokenizer.train(corpus, 80).save(str(root / "data/tokenizer_80.pkl"))
    return root


def test_train_tokenizer_cli(workdir):
    out = _run(
        [
            "ecg_byte_tpu.cli.train_tokenizer", "--train", "--num_merges", "80",
            "--sampled_files", "data/sampled_ecg_files_8.txt",
            "--percentiles", "data/stats.npy",
            "--check_file", "data/ptb_500/ecg/train/ecg_0_0.npy",
            "--out_dir", "./data",
        ],
        cwd=workdir,
    )
    assert "Round-trip exact: True" in out
    assert os.path.exists(workdir / "data/tokenizer_80.pkl")
    assert "Compression ratio" in out


MAIN_ARGS = [
    "ecg_byte_tpu.cli.main", "--model", "tiny-llama", "--dataset", "ptb_500",
    "--tokenizer_check", "tokenizer_80", "--num_merges", "80",
    "--percentiles", "data/stats.npy", "--pad_to_max", "200",
    "--batch_size", "4", "--epochs", "2", "--peft", "--dev", "--seed", "0",
]


def test_main_train_cli(workdir):
    out = _run(MAIN_ARGS, cwd=workdir)
    assert "Training Finished" in out
    run_dirs = os.listdir(workdir / "runs/0")
    assert len(run_dirs) == 1
    assert os.path.isdir(workdir / "runs/0" / run_dirs[0] / "best_model")
    assert os.path.isdir(workdir / "runs/0" / run_dirs[0] / "crash_model")
    assert os.path.exists(workdir / "runs/0" / run_dirs[0] / "train_val_loss.png")


def test_main_inference_cli(workdir):
    ckpt = os.listdir(workdir / "runs/0")[0]
    out = _run(MAIN_ARGS + ["--inference", "--checkpoint", ckpt], cwd=workdir)
    assert "Inference Complete" in out
    res = json.load(
        open(workdir / "runs/0" / ckpt / "seed_42_results_ptb_500.json")
    )
    assert len(res["qa_results"]["gen_answers"]) == 3
    stats = json.load(
        open(workdir / "runs/0" / ckpt / "statistical_analysis_ptb_500.json")
    )
    assert "BLEU" in stats and "raw_values" in stats["BLEU"]
    assert len(stats["BLEU"]["raw_values"]) == 5


def test_main_train_gpt2_family(workdir):
    args = [a for a in MAIN_ARGS]
    args[args.index("tiny-llama")] = "tiny-gpt2"
    out = _run(args + ["--seed", "1"], cwd=workdir)
    assert "Training Finished" in out


def test_main_train_gemma_family(workdir):
    args = [a for a in MAIN_ARGS]
    args[args.index("tiny-llama")] = "tiny-gemma"
    out = _run(args + ["--seed", "2"], cwd=workdir)
    assert "Training Finished" in out


def test_make_synthetic_cli(tmp_path):
    out = _run(
        ["ecg_byte_tpu.cli.make_synthetic", "--n_train", "6", "--n_val", "2",
         "--n_test", "2", "--seg_len", "80"],
        cwd=tmp_path,
    )
    assert "Wrote 6/2/2" in out
    import numpy as np
    sig = np.load(tmp_path / "data/ptb_500/ecg/train/ecg_0_0.npy")
    assert sig.shape == (12, 80)
    stats = np.load(tmp_path / "data/ptb_500_dataset_stats.npy",
                    allow_pickle=True).item()
    assert stats["percentile_1"] < stats["percentile_99"]
    assert os.path.exists(tmp_path / "data/sampled_ecg_files_6.txt")
