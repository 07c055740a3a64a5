"""Two-stage CLI e2e: pretrain (stage 1) -> finetune (stage 2) -> inference,
in subprocesses on a toy dataset with tiny backbones."""

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
    assert r.returncode == 0, f"{cmd} failed:\n{r.stdout[-1500:]}\n{r.stderr[-1500:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("two_stage")
    rng = np.random.default_rng(0)
    for split, n in [("train", 6), ("val", 2), ("test", 2)]:
        os.makedirs(root / f"data/ptb_500/ecg/{split}")
        os.makedirs(root / f"data/ptb_500/text/{split}")
        for i in range(n):
            sig = (np.cumsum(rng.normal(size=(12, 64)), -1) * 0.05).astype(np.float32)
            np.save(root / f"data/ptb_500/ecg/{split}/ecg_{i}_0.npy", sig)
            with open(root / f"data/ptb_500/text/{split}/text_{i}_0.json", "w") as f:
                json.dump("Normal sinus rhythm.", f)
    sigs = np.stack([
        np.load(root / f"data/ptb_500/ecg/train/ecg_{i}_0.npy") for i in range(6)
    ])
    np.save(root / "data/stats.npy", {
        "percentile_1": float(np.percentile(sigs, 1)),
        "percentile_99": float(np.percentile(sigs, 99)),
    })
    return root


STAGE1_DIR = "resnet_ptb_500_0.0001_0.9_0.99_1e-08_0.01_500_4_2"


def test_pretrain_resnet(workdir):
    out = _run(
        ["ecg_byte_tpu.cli.pretrain", "--model", "resnet", "--dataset", "ptb_500",
         "--batch_size", "4", "--dev", "--tiny", "--image_size", "32", "--seed", "0"],
        cwd=workdir,
    )
    assert "Model saved" in out
    assert os.path.isdir(workdir / "runs/0" / STAGE1_DIR / "best_model")


def _ensure_stage1(workdir):
    if not os.path.isdir(workdir / "runs/0" / STAGE1_DIR / "best_model"):
        test_pretrain_resnet(workdir)


def test_finetune_train_and_inference(workdir):
    _ensure_stage1(workdir)
    args = [
        "ecg_byte_tpu.cli.finetune", "--model", "resnet_model",
        "--llm", "tiny-llama", "--dataset", "ptb_500",
        "--batch_size", "2", "--dev", "--tiny", "--image_size", "32",
        "--pad_to_max", "120", "--percentiles", "data/stats.npy",
        "--first_check", STAGE1_DIR, "--seed", "0",
    ]
    out = _run(args, cwd=workdir)
    assert "Training Finished" in out
    stage2 = [d for d in os.listdir(workdir / "runs/0") if d.startswith("resnet_model")]
    assert len(stage2) == 1
    out = _run(args + ["--inference", "--checkpoint", stage2[0]], cwd=workdir)
    assert "Inference Complete" in out
    res = json.load(
        open(workdir / "runs/0" / stage2[0] / "seed_42_results_ptb_500.json")
    )
    assert "averages" in res
    # int8 serving mode: merged adapters quantized, embeds splice exact
    out = _run(
        args + ["--inference", "--checkpoint", stage2[0], "--int8_decode"],
        cwd=workdir,
    )
    assert "Inference Complete" in out


def test_pretrain_resnet_data_parallel(workdir):
    """--dis shards the batch over a dp mesh (8 virtual CPU devices)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-m", "ecg_byte_tpu.cli.pretrain", "--model", "resnet",
         "--dataset", "ptb_500", "--batch_size", "8", "--dev", "--tiny",
         "--image_size", "32", "--seed", "3", "--dis", "--epochs", "1"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"{r.stdout[-1500:]}\n{r.stderr[-1500:]}"
    assert "Model saved" in r.stdout


def test_pretrain_clip_vit(workdir):
    out = _run(
        ["ecg_byte_tpu.cli.pretrain", "--model", "clip_vit", "--dataset",
         "ptb_500", "--batch_size", "4", "--dev", "--tiny",
         "--image_size", "32", "--seed", "5"],
        cwd=workdir,
    )
    assert "Model saved" in out
