"""Differential diagnosis of the GPT-2-XL decode fixed cost (BENCH round 5:
4.13 ms/tok of non-weight-streaming time vs Llama's 0.155 — 0.557 of
attainable where llama sits at ~0.97).

Each variant isolates one structural suspect; run one variant per process
(the decode program caches per (config, shape), and the fused-attention
dispatch gate reads env at trace time):

  base        stock gpt2_xl (48L, hidden 1600, 25 heads, vocab 50257)
  aligned     lane-aligned clone: hidden 1664 = 13*128 (26 heads), vocab
              50304, mlp 6656 — isolates the 1600 % 128 != 0 padding tax
  half        stock shapes but 24 layers — per-layer vs fixed split
  fused_off   stock, ECG_BYTE_FUSED_DECODE_ATTN=0 — XLA attention path
  s128        stock, 128-token prompt — KV-prefix scaling

Usage: python scripts/gpt2_decode_diag.py <variant>
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import dataclasses  # noqa: E402
import json  # noqa: E402


def main(variant: str):
    if variant == "fused_off":
        os.environ["ECG_BYTE_FUSED_DECODE_ATTN"] = "0"

    import jax  # noqa: F401

    import bench
    from ecg_byte_tpu.models import gpt2_xl
    from ecg_byte_tpu.models import transformer as T

    cfg = gpt2_xl()
    s = 512
    if variant == "aligned":
        cfg = dataclasses.replace(
            cfg, hidden_size=1664, num_heads=26, num_kv_heads=26,
            intermediate_size=6656, vocab_size=50304,
        )
    elif variant == "half":
        cfg = dataclasses.replace(cfg, num_layers=24)
    elif variant == "s128":
        s = 128
    elif variant not in ("base", "fused_off"):
        raise SystemExit(f"unknown variant {variant}")

    params = T.init_params(cfg, jax.random.PRNGKey(0))
    row = bench.bench_decode(
        cfg, params, metric=f"gpt2xl_diag_{variant}", s=s
    )
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "base")
