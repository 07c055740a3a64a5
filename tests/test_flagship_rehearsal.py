"""Tiny-shape run of the flagship dress-rehearsal driver.

scripts/flagship_rehearsal.py proves the reference's main.py:141-165 spine
(`--hf_weights` safetensors ingest -> tokenizer.json parse -> signal-token
registration + embedding resize -> LoRA train -> SIGTERM crash checkpoint ->
`--resume crash_model` -> 5-seed greedy evaluation) executes as one program
per phase.  The committed full-scale run on the real chip is recorded in
REHEARSAL.md; this test runs the same driver at tiny shapes on CPU so the
phase logic (fixture generation, marker-triggered SIGTERM, resume, evidence
collection) stays green in the suite.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tiny_rehearsal_all_phases(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    fixture = tmp_path / "fixture"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "flagship_rehearsal.py"),
         "--tiny", "--workdir", str(tmp_path / "work"),
         "--fixture", str(fixture)],
        env=env, capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]

    summary = json.load(open(tmp_path / "work" / "rehearsal_summary.json"))
    phases = {p["phase"]: p for p in summary["phases"]}
    # every phase of the spine ran
    for name in ("fixture", "dataset", "train_tokenizer",
                 "train_preempted", "train_resumed", "inference"):
        assert name in phases, f"missing phase {name}"
    # the preemption rehearsal actually delivered the SIGTERM
    assert phases["train_preempted"]["sigterm"]
    assert phases["train_resumed"]["rc"] == 0
    assert phases["inference"]["rc"] == 0

    ev = summary["evidence"]
    # resume picked up the crash checkpoint (epoch advanced past 1)
    assert any("Resumed crash_model" in ln for ln in ev["train_resumed"]["resume"])
    # the --hf_weights ingest produced the resized-model banner in each phase
    for name in ("train_preempted", "train_resumed", "inference"):
        assert ev[name]["model"], f"no model banner in {name}"
    # evaluation emitted the full metric table
    assert any("BLEU" in ln for ln in ev["inference"]["metrics"])
    # live-HBM residency was recorded at the phase boundaries
    assert ev["train_preempted"]["memory"]
