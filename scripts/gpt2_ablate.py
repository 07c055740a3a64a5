"""Per-layer ablation of the GPT-2-XL decode budget (round-5 diagnosis).

Measured facts so far (scripts/gpt2_decode_diag.py, BENCH probes):
  * decode time scales ~linearly with layer count and with weight bytes at
    a CONSTANT ~370 GB/s effective rate (base/aligned/half variants) — half
    the 680-790 GB/s a dependent single-row matmul chain sustains at the
    SAME matrix sizes (/tmp/probe_sizes.py: 15-22 MB matrices stream at
    full attainable rate);
  * lane alignment is not the cause (1664-hidden clone: same per-byte
    rate) and neither is the attention implementation (fused Pallas vs
    XLA: identical per_tok).

So ~80 us/layer of the 174 us/layer measured lives in the per-layer glue
around the matmuls.  Each variant here removes one glue component from the
REAL end-to-end greedy decode (monkeypatched before trace):

  full        stock (baseline)
  attn_id     attention replaced by identity (cache update kept)
  nocacheupd  _append_kv -> identity: no cache DUS; NOTE k/v projections
              go dead, so ~10.2 MB/layer of weight stream disappears too
              (14 us/layer at attainable rate — subtract when reading)
  nonorm      LayerNorm -> identity (both per-layer norms + final)
  nobias      all linear biases stripped from the layer params
  unroll      _scan_layers(unroll=True): no rolled-scan DUS/DS machinery

Usage: python scripts/gpt2_ablate.py <variant>   (one per process — the
decode program caches per trace and gates read env at trace time).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json  # noqa: E402


def main(variant: str):
    import jax
    import numpy as np

    from ecg_byte_tpu.models import gpt2_xl
    from ecg_byte_tpu.models import transformer as T

    cfg = gpt2_xl()
    params = T.init_params(cfg, jax.random.PRNGKey(0))

    if variant == "attn_id":
        os.environ["ECG_BYTE_FUSED_DECODE_ATTN"] = "0"
        T.decode_attention = (
            lambda q, k, v, mask, k_scale=None, v_scale=None: q
        )
    elif variant == "nocacheupd":
        T._append_kv = lambda caches, k, v, idx: caches
    elif variant == "nonorm":
        T._norm = lambda x, w, b, c: x
    elif variant == "nobias":
        params["layers"] = {
            name: {k: v for k, v in p.items() if k != "bias"}
            if isinstance(p, dict) else p
            for name, p in params["layers"].items()
        }
    elif variant == "unroll":
        orig = T._scan_layers

        def unrolled(*args, **kw):
            kw["unroll"] = True
            return orig(*args, **kw)

        T._scan_layers = unrolled
    elif variant != "full":
        raise SystemExit(f"unknown variant {variant}")

    from ecg_byte_tpu.infer.decode import greedy_generate

    b, s, n_new = 1, 512, 128
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 1000, (b, s)), np.int32)
    mask = np.ones((b, s), np.int32)

    def run(n):
        out = greedy_generate(
            params, cfg, ids, mask, max_new_tokens=n,
            eos_token_id=-1, pad_token_id=0,
        )
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = greedy_generate(
                params, cfg, ids, mask, max_new_tokens=n,
                eos_token_id=-1, pad_token_id=0,
            )
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_large = run(16), run(n_new)
    per_tok = (t_large - t_small) / (n_new - 16)
    print(json.dumps({
        "variant": variant,
        "per_tok_ms": round(per_tok * 1e3, 3),
        "per_layer_us": round(per_tok * 1e6 / cfg.num_layers, 1),
    }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
