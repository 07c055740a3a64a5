"""Flagship dress rehearsal: the reference's main.py:141-165 spine at true
scale, as ONE program per phase, on the real chip.

Every piece of the flagship path is oracle-tested at tiny scale elsewhere;
this driver proves the path *executes at flagship scale*: a size-exact
synthetic Llama-3.2-1B checkpoint (2.47 GB bf16 safetensors, 128,256-row
tokenizer.json — cli/make_flagship_fixture.py) is ingested by
``cli/main.py --hf_weights``, the ECG vocabulary (3,500 merges -> 3,759
added tokens) is registered and the embedding resized, LoRA overlays the
frozen base, training runs real steps, a SIGTERM mid-epoch exercises the
crash checkpoint, ``--resume crash_model`` continues the run, and a 5-seed
greedy-decode evaluation closes the loop.  Phase wall-clocks (compile
included) and live-HBM readings are printed and written to
``<workdir>/rehearsal_summary.json`` — REHEARSAL.md in the repo root
records the committed run.

Usage (from the repo root; needs the real TPU):
  python scripts/flagship_rehearsal.py [--workdir /tmp/flagship_rehearsal]
        [--fresh-compile-cache]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def train_args(tiny: bool):
    merges = "100" if tiny else "3500"
    return [
        "--model", "llama-3.2-1b",
        "--dataset", "ptb_500",
        "--tokenizer_check", f"tokenizer_{merges}",
        "--num_merges", merges,
        # reference canonical pad/batch (scripts/train_model.sh)
        "--pad_to_max", "128" if tiny else "1020",
        "--batch_size", "2",
        "--epochs", "2",
        "--warmup", "500",
        "--peft",
        "--seed", "0",
    ]


def env_for_run(workdir: str, compile_cache: str) -> dict:
    env = dict(os.environ)
    # the axon PJRT plugin must stay importable (see .claude/skills/verify)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    env["ECG_BYTE_LOG_MEMORY"] = "1"
    if env.get("JAX_PLATFORMS", "").startswith("cpu"):
        # XLA:CPU persistent-cache entries are AOT-compiled against the
        # writing host's machine features; loading them on another host
        # prints cpu_aot_loader errors and runs crippled (measured: the
        # tiny token-cache build went from seconds to hung).  The cache is
        # only worth it for the minutes-long TPU compiles anyway.
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
    else:
        env["JAX_COMPILATION_CACHE_DIR"] = compile_cache
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return env


def run_phase(name, argv, workdir, env, timeout=3600, sigterm_on=None):
    """Run one CLI phase as a subprocess; optionally SIGTERM it when a
    stdout marker appears (the preemption rehearsal).  Returns a record
    with wall-clock, rc, and the log path."""
    log_path = os.path.join(workdir, f"phase_{name}.log")
    print(f"=== phase {name}: {' '.join(argv)}", flush=True)
    t0 = time.perf_counter()
    with open(log_path, "w") as log:
        proc = subprocess.Popen(
            argv, cwd=workdir, env=env, stdout=log, stderr=subprocess.STDOUT
        )
        terminated = False
        try:
            while proc.poll() is None:
                if time.perf_counter() - t0 > timeout:
                    raise TimeoutError(f"phase {name} exceeded {timeout}s")
                if sigterm_on and not terminated:
                    with open(log_path) as f:
                        if sigterm_on in f.read():
                            print(f"    marker {sigterm_on!r} seen -> SIGTERM",
                                  flush=True)
                            proc.send_signal(signal.SIGTERM)
                            terminated = True
                time.sleep(0.5)
        finally:
            # never leave an orphan competing for the chip/CPUs if the
            # driver itself is killed (learned the hard way: a timeout-killed
            # driver left a flagship-on-CPU child that throttled the next run)
            if proc.poll() is None:
                proc.kill()
                proc.wait()
    dt = time.perf_counter() - t0
    rc = proc.returncode
    tail = subprocess.run(["tail", "-n", "8", log_path],
                          capture_output=True, text=True).stdout
    print(f"    rc={rc} wall={dt:.1f}s\n{tail}", flush=True)
    expected_rc = rc == 0 or (sigterm_on and terminated)
    if not expected_rc:
        raise RuntimeError(f"phase {name} failed (rc={rc}); see {log_path}")
    return {"phase": name, "wall_s": round(dt, 1), "rc": rc,
            "sigterm": bool(sigterm_on and terminated), "log": log_path}


def grep_log(log, needle):
    with open(log) as f:
        return [ln.strip() for ln in f if needle in ln]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/flagship_rehearsal")
    ap.add_argument("--fixture", default=None,
                    help="flagship fixture dir (generated if absent)")
    ap.add_argument("--fresh-compile-cache", action="store_true",
                    help="measure true compile times (default reuses the "
                         "persistent cache)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny fixture + shapes: same phase logic, "
                         "CPU-runnable (tests/test_flagship_rehearsal.py)")
    args = ap.parse_args()
    if args.fixture is None:
        args.fixture = ("/tmp/fake_llama32_1b_tiny" if args.tiny
                        else "/tmp/fake_llama32_1b")
    os.makedirs(args.workdir, exist_ok=True)
    compile_cache = os.path.join(
        args.workdir, "jax_cache"
    ) if args.fresh_compile_cache else "/tmp/jax_tpu_cache"
    env = env_for_run(args.workdir, compile_cache)
    py = sys.executable
    phases = []

    # 0) size-exact synthetic checkpoint (idempotent)
    t0 = time.perf_counter()
    out = subprocess.run(
        [py, "-m", "ecg_byte_tpu.cli.make_flagship_fixture",
         "--out", args.fixture] + (["--tiny"] if args.tiny else []),
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    if out.returncode:
        raise RuntimeError(out.stdout + out.stderr)
    fixture_stats = json.loads(out.stdout.strip().splitlines()[-1])
    phases.append({"phase": "fixture", "wall_s": round(time.perf_counter() - t0, 1),
                   **fixture_stats})
    print(f"=== fixture: {fixture_stats}", flush=True)

    # 1) synthetic dataset tree (reference layout) + stats
    data_root = os.path.join(args.workdir, "data")
    if not os.path.exists(os.path.join(data_root, "ptb_500_dataset_stats.npy")):
        phases.append(run_phase(
            "dataset",
            [py, "-m", "ecg_byte_tpu.cli.make_synthetic",
             "--data_root", data_root, "--name", "ptb_500",
             "--n_train", "24", "--n_val", "8", "--n_test", "8"]
            + (["--seg_len", "100"] if args.tiny else []),
            args.workdir, env, timeout=300,
        ))

    # 2) ECG BPE tokenizer at the canonical 3,500 merges
    n_merges = "100" if args.tiny else "3500"
    tok_pkl = os.path.join(data_root, f"tokenizer_{n_merges}.pkl")
    if not os.path.exists(tok_pkl):
        phases.append(run_phase(
            "train_tokenizer",
            [py, "-m", "ecg_byte_tpu.cli.train_tokenizer", "--train",
             "--num_merges", n_merges,
             "--sampled_files",
             os.path.join(data_root, "sampled_ecg_files_24.txt"),
             "--percentiles",
             os.path.join(data_root, "ptb_500_dataset_stats.npy"),
             "--out_dir", data_root],
            args.workdir, env, timeout=1800,
        ))

    common = train_args(args.tiny) + [
        "--hf_weights", args.fixture,
        "--data_root", data_root,
        "--percentiles", os.path.join(data_root, "ptb_500_dataset_stats.npy"),
    ]

    # 3) flagship train, SIGTERM'd mid-epoch-2 (preemption rehearsal):
    #    ingest 2.47 GB + parse 128k tokenizer.json + register 3,759 ECG
    #    tokens + resize embeddings + LoRA + train epoch 1 + crash save
    phases.append(run_phase(
        "train_preempted",
        [py, "-m", "ecg_byte_tpu.cli.main"] + common,
        args.workdir, env, timeout=3600,
        sigterm_on="Best model saved at epoch: 1",
    ))

    # 4) resume from the crash checkpoint, finish epoch 2, save best
    phases.append(run_phase(
        "train_resumed",
        [py, "-m", "ecg_byte_tpu.cli.main"] + common
        + ["--resume", "crash_model"],
        args.workdir, env, timeout=3600,
    ))

    # 5) 5-seed greedy-decode evaluation (LoRA merged for serving)
    cfg = ("llama-3.2-1b_ptb_500_0.0001_0.9_0.99_1e-08_0.01_500_2_2_"
           + ("100_128" if args.tiny else "3500_1020") + "_False")
    phases.append(run_phase(
        "inference",
        [py, "-m", "ecg_byte_tpu.cli.main"] + common
        + ["--inference", "--checkpoint", cfg, "--dev"],
        args.workdir, env, timeout=3600,
    ))

    # collect the evidence lines
    evidence = {}
    for p in phases:
        if "log" not in p:
            continue
        evidence[p["phase"]] = {
            "memory": grep_log(p["log"], "[memory]"),
            "model": grep_log(p["log"], "Model llama-3.2-1b"),
            "resume": grep_log(p["log"], "Resumed"),
            "crash": grep_log(p["log"], "crash"),
            "loss": grep_log(p["log"], "Loss:"),
            "metrics": grep_log(p["log"], "mean"),
        }
    summary = {"phases": phases, "evidence": evidence,
               "compile_cache_fresh": args.fresh_compile_cache}
    with open(os.path.join(args.workdir, "rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
