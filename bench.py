"""Headline benchmarks: preprocess+tokenize throughput, decode, training.

Emits one JSON line per metric ({"metric", "value", "unit", "vs_baseline"}),
headline last:

1. ``decode_throughput`` — Llama-3.2-1B greedy decode (batch 1, 1k prompt,
   KV cache, 128 new tokens).  ``vs_baseline`` is the fraction of the
   HBM-bandwidth roofline (BASELINE.md target: >= 0.90): one token must
   stream every parameter byte plus the KV prefix, so
   roofline tok/s = measured stream bandwidth / bytes-per-step.
2. ``train_throughput`` — flagship LoRA train step (batch 4 x 1024).
   ``vs_baseline`` is MFU against the chip's bf16 peak, with flops from
   the analytic 4*N_mm model-flops count (forward 2*N_mm + activation
   grads 2*N_mm for the frozen-base LoRA step; remat recompute excluded)
   — see bench_train.  ``vs_attainable`` divides by the same-session
   measured MXU rate instead (measure_mxu_flops).
3. ``preprocess_tokenize_throughput`` — ECGs/sec through the fused device
   preprocess + quantize + BPE-encode pipeline vs the reference
   architecture's host path (per-record scipy filtfilt chain, numpy wavelet
   denoise, scipy cubic resample, np.vectorize symbol map, native trie
   encode — mirroring ecg_byte/utils/preprocess_utils.py +
   tokenizer_utils.py + rust_bpe::encode_text run sequentially, as the
   reference's per-item ``__getitem__`` pipeline does).
   ``vs_baseline`` is the speedup over that host path on this machine.
4. ``pretrain_merl_throughput`` / ``finetune_fusion_throughput`` — the
   two-stage stack on the real chip: stage-1 MERL ResNet101 contrastive
   step (samples/s, MFU from XLA cost-analysis flops) and stage-2
   frozen-encoder + flagship-LoRA fusion step (tokens/s, analytic-model
   MFU), both with same-session ``vs_attainable`` probes.
5. ``tokenizer_train`` — BPE merge-learning wall-clock: the csrc
   incremental trainer vs the reference algorithm (full rescan per merge)
   compiled in the same translation unit, head-to-head at a common corpus
   plus documented linear extrapolation to the canonical 200k-ECG scale.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compile cache: flagship compiles take minutes on this
# host class, and every metric re-runs the same shapes (set before any
# jax import; harmless when already configured by the caller)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")



def make_synthetic_records(n, rng, fs=500, length=5000, leads=12):
    """ECG-like signals: slow oscillation + QRS-ish spikes + noise + hum."""
    t = np.arange(length) / fs
    base = 0.8 * np.sin(2 * np.pi * 1.1 * t)
    spikes = np.zeros(length)
    spikes[:: int(0.8 * fs)] = 1.5
    hum = 0.1 * np.sin(2 * np.pi * 60 * t)
    x = base + spikes + hum
    out = x[None, None, :] + 0.05 * rng.normal(size=(n, leads, length))
    return out.astype(np.float32)


def train_merges(rng, num_merges=3500):
    import pickle
    import tempfile

    from ecg_byte_tpu.ops.quantize import normalize_quantize, quantized_to_string
    from ecg_byte_tpu.tokenizer import native

    recs = make_synthetic_records(20, rng)
    p1, p99 = np.percentile(recs, 1), np.percentile(recs, 99)
    # the corpus is deterministic (seeded synthetic records), so the
    # trained tokenizer is a pure function of num_merges — disk-cache the
    # ~3.5 min C++ training across bench invocations
    cache = os.path.join(
        tempfile.gettempdir(), f"ecg_byte_bench_merges_{num_merges}.pkl"
    )
    if os.path.exists(cache):
        try:
            with open(cache, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass
    _, q = normalize_quantize(recs, p1, p99)
    corpus = "".join(quantized_to_string(np.asarray(qi)) for qi in q).encode()
    _, merges = native.train(corpus, num_merges)
    out = (merges, float(p1), float(p99))
    try:
        tmp = f"{cache}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(out, f)
        os.replace(tmp, cache)
    except OSError:
        pass
    return out


# --- reference-style host path -------------------------------------------------


def _numpy_wavelet_denoise(x, level=4):
    """Host wavelet denoise standing in for pywt (same math as reference)."""
    from ecg_byte_tpu.ops.wavelet import daubechies

    f = daubechies(6)
    out = np.empty_like(x)
    for lead in range(x.shape[0]):
        sig = x[lead]
        coeffs = []
        a = sig
        lens = []
        for _ in range(level):
            n = len(a)
            pad = f.dec_len - 1
            idx = np.arange(-pad, n + pad)
            idx = np.mod(idx, 2 * n)
            idx = np.where(idx >= n, 2 * n - 1 - idx, idx)
            ext = a[idx]
            lo = np.convolve(ext, f.dec_lo[::-1], "valid")[1::2]
            hi = np.convolve(ext, f.dec_hi[::-1], "valid")[1::2]
            m = (n + f.dec_len - 1) // 2
            lens.append(n)
            coeffs.append(hi[:m])
            a = lo[:m]
        thr = np.median(np.abs(coeffs[-1]))
        thr = 0 if thr == 0 else thr / 0.6745
        den = [np.sign(c) * np.maximum(np.abs(c) - thr, 0) for c in coeffs]
        for d, n in zip(den[::-1], lens[::-1]):
            ua = np.zeros(2 * len(a)); ua[::2] = a
            ud = np.zeros(2 * len(d)); ud[::2] = d
            rec = np.convolve(ua, f.rec_lo, "full") + np.convolve(ud, f.rec_hi, "full")
            a = rec[f.dec_len - 2 : f.dec_len - 2 + n]
        out[lead] = a
    return out


def reference_host_path(recs, p1, p99, encoder):
    """Sequential per-record pipeline, reference architecture."""
    from scipy import interpolate
    from scipy import signal as sps

    ALPHABET = list("abcdefghijklmnopqrstuvwxyz")
    n_tokens = 0
    for rec in recs:
        x = rec  # (12, 5000) leads-first; reference is time-first — same math
        for f0 in (50.0, 60.0):
            b, a = sps.iirnotch(f0, 30.0, 500.0)
            x = sps.filtfilt(b, a, x, axis=-1)
        b, a = sps.butter(4, [0.5 / 250.0, 100 / 250.0], btype="band")
        x = sps.filtfilt(b, a, x, axis=-1)
        b, a = sps.butter(4, 0.05 / 250.0, btype="high")
        x = sps.filtfilt(b, a, x, axis=-1)
        x = _numpy_wavelet_denoise(x)
        t_orig = np.linspace(0, 10.0, 5000, endpoint=True)
        t_tgt = np.linspace(0, 10.0, 2500, endpoint=True)
        x = interpolate.interp1d(
            t_orig, x, kind="cubic", axis=-1,
            bounds_error=False, fill_value="extrapolate",
        )(t_tgt)
        # reference quantizer (np.vectorize symbol map, tokenizer_utils.py:14-19)
        normalized = (x - (p1 - 0.5)) / ((p99 + 0.5) - (p1 - 0.5) + 1e-6)
        clipped = np.clip(normalized, 0, 1)
        scaled = np.minimum(np.floor(clipped * 26), 25).astype(np.uint8)
        symbols = np.vectorize(lambda v: ALPHABET[v])(scaled)
        text = "".join(symbols.flatten())
        ids = encoder.encode(text.encode())
        n_tokens += len(ids)
    return n_tokens


# --- TPU path -----------------------------------------------------------------


def tpu_path_factory(merges, p1, p99):
    import jax

    from ecg_byte_tpu.ops import bpe_encode, dsp
    from ecg_byte_tpu.ops.quantize import normalize_quantize

    matcher = bpe_encode.build_best_matcher(merges)

    @jax.jit
    def pipeline(adc):
        # ingest raw int16 ADC units like a WFDB record; physical-unit
        # conversion ((adc - baseline)/gain) happens on device
        signals = adc.astype(jnp.float32) / 200.0
        x = dsp.preprocess_records(signals, fs=500.0, target_fs=250.0)
        _, q = normalize_quantize(x, p1, p99)
        q = q.reshape(q.shape[0], -1)
        ids, counts = bpe_encode.encode(q, matcher)
        return ids, counts

    import jax.numpy as jnp

    return pipeline


def bench_preprocess_stages(merges, p1, p99, adc_dev, batch):
    """Measured per-stage budget of the device pipeline (ms per batch)."""
    import jax
    import jax.numpy as jnp

    from ecg_byte_tpu.ops import bpe_encode, bpe_match, dsp
    from ecg_byte_tpu.ops.quantize import normalize_quantize

    matcher = bpe_encode.build_best_matcher(merges)
    is_pallas = isinstance(matcher, bpe_match.PallasMatcher)
    if not is_pallas:
        banks_meta = tuple(b[0] for b in matcher.banks)
        bank_arrays = tuple(b[1:] for b in matcher.banks)

    def timeit(fn, *args, n_small=6, n_large=30, rounds=3):
        # Two-size slope differencing: each sync through the axon tunnel
        # carries a fixed ~tens-of-ms RTT that a plain mean-over-n divides
        # but never removes (measured: the 0.3 ms quantize stage reads as
        # 5-10 ms at n=6, session-dependent).  The slope between two loop
        # sizes cancels the fixed per-sync cost exactly.
        def total(n):
            best = 1e9
            for _ in range(rounds):
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(*args)
                np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                best = min(best, time.perf_counter() - t0)
            return best

        fn(*args)  # warm
        ts, tl = total(n_small), total(n_large)
        return round(max(tl - ts, 0.0) / (n_large - n_small) * 1e3, 1)

    @jax.jit
    def stage_dsp(adc):
        return dsp.preprocess_records(
            adc.astype(jnp.float32) / 200.0, fs=500.0, target_fs=250.0
        )

    @jax.jit
    def stage_quant(x):
        _, q = normalize_quantize(x, p1, p99)
        return q.reshape(q.shape[0], -1)

    @jax.jit
    def stage_match(q):
        if is_pallas:
            return bpe_match.longest_match(q, matcher)
        m = bpe_encode.ConvMatcher(
            banks=tuple((l,) + a for l, a in zip(banks_meta, bank_arrays)),
            max_len=matcher.max_len,
        )
        return bpe_encode._longest_match_conv(q.astype(jnp.int32), m)

    @jax.jit
    def stage_chain(ml):
        if (bpe_encode._pallas_chain_available()
                and matcher.max_len <= bpe_match._WINDOW):
            return bpe_match.greedy_chain(ml)
        return bpe_encode._greedy_chain_scan(ml, matcher.max_len)

    @jax.jit
    def stage_compact(mt, vis):
        return bpe_encode._compact(mt, vis)

    x = stage_dsp(adc_dev)
    q = stage_quant(x)
    mt, ml = stage_match(q)
    vis = stage_chain(ml)
    stage_compact(mt, vis)
    budget = {
        "dsp": timeit(stage_dsp, adc_dev),
        "quantize": timeit(stage_quant, x),
        "match": timeit(stage_match, q),
        "chain": timeit(stage_chain, ml),
        "compact": timeit(stage_compact, mt, vis),
    }
    return {
        "metric": "preprocess_stage_budget",
        "value": round(sum(budget.values()), 1),
        "unit": f"ms per {batch}-record batch",
        "vs_baseline": 0,
        "stages_ms": budget,
    }


# --- flagship decode / train -------------------------------------------------

# (HBM bytes/s, bf16 FLOP/s) per device kind; conservative public numbers.
_DEVICE_PEAKS = {
    "TPU v5 lite": (819e9, 197e12),  # v5e
    "TPU v5e": (819e9, 197e12),
    "TPU v5p": (2765e9, 459e12),
    "TPU v4": (1228e9, 275e12),
    "TPU v6 lite": (1640e9, 918e12),  # v6e / Trillium
}


def _device_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for name, peaks in _DEVICE_PEAKS.items():
        if kind.startswith(name):
            return peaks
    return _DEVICE_PEAKS["TPU v5 lite"]


def _flagship():
    import jax

    from ecg_byte_tpu.models import llama_3_2_1b
    from ecg_byte_tpu.models import transformer as T

    # Llama-3.2-1B with the reference's signal-token extension
    # (3,500 merges + 256 base ids + <sig_start>/<sig_end>/<pad>).
    config = llama_3_2_1b(vocab_size=128256 + 3756 + 3)
    params = T.init_params(config, jax.random.PRNGKey(0))
    return config, params


def measure_stream_bandwidth():
    """Machine-attainable HBM read bandwidth (GB/s), measured.

    Dependent single-row matmul chains over a 2 GB weight stack: each scan
    step must stream a fresh 128 MB matrix from HBM (VMEM cannot hold the
    stack) and the carried vector serializes the chain, so wall-clock =
    bytes / attainable-bandwidth.  Timed at TWO sweep counts and
    differenced — the axon tunnel's ~30 ms dispatch+sync round trip would
    otherwise be charged to the probe (16 GB streams in ~22 ms, so a single
    absolute timing under-reads bandwidth by >2x).  Differencing makes the
    probe commensurable with bench_decode, which cancels the same RTT the
    same way.  Measured here: ~739 GB/s = 90% of the 819 GB/s nominal —
    the denominator decode should be judged against.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    k, n = 16, 8192
    lo_sweeps, hi_sweeps = 4, 16
    w = jax.random.normal(jax.random.PRNGKey(0), (k, n, n), jnp.bfloat16)
    y0 = jnp.ones((1, n), jnp.bfloat16)

    @partial(jax.jit, static_argnames="sweeps")
    def many(y, w, sweeps):
        def outer(_, y):
            y2, _ = jax.lax.scan(
                lambda c, wi: (jnp.tanh(c @ wi), None), y, w
            )
            return y2
        return jax.lax.fori_loop(0, sweeps, outer, y)

    def timed(sweeps):
        out = many(y0, w, sweeps)
        np.asarray(out[0, :1])  # tiny device-side slice; hard sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = many(y0, w, sweeps)
            np.asarray(out[0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(lo_sweeps), timed(hi_sweeps)
    sweep_bytes = k * n * n * 2
    return (hi_sweeps - lo_sweeps) * sweep_bytes / (t_hi - t_lo)


def bench_decode(config, params, metric="decode_throughput", s=1024):
    """Greedy decode tok/s; vs_baseline = fraction of the NOMINAL HBM
    roofline (BASELINE.md target >= 0.90), vs_attainable = fraction of the
    measured-attainable streaming roofline (the in-process bandwidth probe
    above) — both recorded so the ceiling argument travels with the number."""
    import jax

    from ecg_byte_tpu.infer.decode import greedy_generate

    b, n_new = 1, 128
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 1000, (b, s)), np.int32)
    mask = np.ones((b, s), np.int32)

    def run(n):
        out = greedy_generate(
            params, config, ids, mask, max_new_tokens=n,
            eos_token_id=-1, pad_token_id=0,
        )
        np.asarray(out)  # hard sync (tunnel-safe)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = greedy_generate(
                params, config, ids, mask, max_new_tokens=n,
                eos_token_id=-1, pad_token_id=0,
            )
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    # two sizes isolate the per-token decode rate from prefill/dispatch
    t_small, t_large = run(16), run(n_new)
    per_tok = (t_large - t_small) / (n_new - 16)

    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    kv_bytes = (
        config.num_layers * (s + n_new) * config.num_kv_heads * config.head_dim
        * 2 * 2  # k+v, bf16
    )
    hbm_bw, _ = _device_peaks()
    bytes_per_tok = param_bytes + kv_bytes
    roofline = hbm_bw / bytes_per_tok
    out = {
        "metric": metric,
        "value": round(1.0 / per_tok, 1),
        "unit": "tok/s",
        "vs_baseline": round(1.0 / per_tok / roofline, 3),
        "per_tok_ms": round(per_tok * 1e3, 3),
        "weight_bytes": param_bytes,
    }
    try:
        attainable_bw = measure_stream_bandwidth()
        out["vs_attainable"] = round(
            1.0 / per_tok / (attainable_bw / bytes_per_tok), 3
        )
        out["attainable_bw_gbps"] = round(attainable_bw / 1e9, 1)
        # fixed (non-weight-streaming) per-token cost: what remains of the
        # step after the weight stream at attainable bandwidth — KV
        # attention + in-program glue.  bench_decode_int8 consumes this to
        # record its attainable fraction with the fixed cost subtracted
        # (the BASELINE.md:84-92 argument, machine-readable).
        out["fixed_ms_per_tok"] = round(
            (per_tok - param_bytes / attainable_bw) * 1e3, 3
        )
    except Exception as e:  # the probe must never cost us the metric
        print(f"bandwidth probe skipped: {e}", file=sys.stderr)
    return out


def bench_decode_int8(config, params, bf16_row=None):
    """int8 decode: weight-only int8 (models/quantized.py) + int8 KV cache
    (transformer.init_kv_cache dtype=int8) — the --int8_decode mode.

    value = tok/s; vs_baseline = fraction of the int8-bytes nominal HBM
    roofline (the mode exists because bytes/token halve — judge it against
    the roofline those bytes imply; same semantics as the bf16 row's
    nominal fraction).  Alongside it records every term of the ceiling
    argument: ``speedup_vs_bf16``, ``vs_attainable`` (int8 bytes at the
    measured streaming bandwidth), and ``vs_attainable_fixed_adjusted``
    (fixed per-token cost from the bf16 row added to the int8 bound —
    ~1.0 means the kernel streams int8 bytes at full attainable speed).
    """
    import jax

    from ecg_byte_tpu.infer.decode import greedy_generate
    from ecg_byte_tpu.models.quantized import quantize_lm_int8

    qparams = jax.jit(lambda p: quantize_lm_int8(p, config))(params)
    jax.block_until_ready(qparams)

    b, s, n_new = 1, 1024, 128
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 1000, (b, s)), np.int32)
    mask = np.ones((b, s), np.int32)

    def run(n):
        out = greedy_generate(
            qparams, config, ids, mask, max_new_tokens=n,
            eos_token_id=-1, pad_token_id=0, int8_kv=True,
        )
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = greedy_generate(
                qparams, config, ids, mask, max_new_tokens=n,
                eos_token_id=-1, pad_token_id=0, int8_kv=True,
            )
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_large = run(16), run(n_new)
    per_tok = (t_large - t_small) / (n_new - 16)

    # streamed bytes per token: every leaf except the embedding table,
    # which is only GATHERED (B rows) now that the head use is lm_head_q
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(qparams)
    ) - qparams["embed"].size * qparams["embed"].dtype.itemsize
    # int8 KV: 1 byte per cache element + a bf16 scale per (pos, kv-head)
    kv_elems = (
        config.num_layers * (s + n_new) * config.num_kv_heads * 2  # k+v
    )
    kv_bytes = kv_elems * config.head_dim * 1 + kv_elems * 2
    hbm_bw, _ = _device_peaks()
    bytes_per_tok = param_bytes + kv_bytes
    roofline = hbm_bw / bytes_per_tok
    out = {
        "metric": "decode_throughput_int8",
        "value": round(1.0 / per_tok, 1),
        "unit": "tok/s",
        "vs_baseline": round(1.0 / per_tok / roofline, 3),
        "per_tok_ms": round(per_tok * 1e3, 3),
        "weight_bytes": param_bytes,
    }
    if bf16_row is not None:
        if "per_tok_ms" in bf16_row:
            out["speedup_vs_bf16"] = round(
                bf16_row["per_tok_ms"] / (per_tok * 1e3), 2
            )
        if "attainable_bw_gbps" in bf16_row:
            bw = bf16_row["attainable_bw_gbps"] * 1e9
            out["vs_attainable"] = round(
                1.0 / per_tok / (bw / bytes_per_tok), 3
            )
            if "fixed_ms_per_tok" in bf16_row:
                # attainable bound with the measured fixed per-token cost
                # (KV attention + glue, from the bf16 row) added in: the
                # int8 kernel's own efficiency, byte-model slack removed.
                # Conservative for this mode: the bf16 row's fixed cost
                # includes a bf16 KV stream that int8_kv halves, so a
                # fraction slightly above 1.0 is possible and means the
                # KV byte savings landed.
                bound_ms = (
                    param_bytes / bw * 1e3 + bf16_row["fixed_ms_per_tok"]
                )
                out["vs_attainable_fixed_adjusted"] = round(
                    bound_ms / (per_tok * 1e3), 3
                )
    return out


def bench_train(config, params):
    """LoRA train step tokens/s and MFU (model-flops / bf16 peak)."""
    import jax

    from ecg_byte_tpu.train import create_train_state, make_train_step
    from ecg_byte_tpu.train.scheduler import make_optimizer

    b, s = 4, 1024
    opt = make_optimizer(config.hidden_size, warmup_steps=500)
    rng = np.random.default_rng(0)
    ids = np.asarray(rng.integers(0, 1000, (b, s)), np.int32)
    batch = {
        "input_ids": ids,
        "attn_mask": np.ones((b, s), np.int32),
        "labels": ids,
    }
    # rbg dropout keys: threefry LoRA-dropout mask generation measured
    # 324->287 ms/step at 4x1024 (the hardware RngBitGenerator vs the
    # software threefry path); identical distribution, different stream
    key = jax.random.key(1, impl="rbg")

    # (remat, norm) AUTOTUNE.  "slim" (save everything except the
    # _slim-tagged elementwise tensors) and "dots" (save matmul outputs,
    # recompute elementwise + softmax) have traded places ACROSS CHIP
    # SESSIONS for identical binaries (measured same-session pairs: slim
    # 224.7 vs dots 295.8 ms/step one session, slim 218.5 vs dots 206.2
    # another — TRAINPERF.md round 4b).  The fused Pallas RMSNorm
    # (ops/rmsnorm.py) interacts with the remat choice: under slim it won
    # 189.1->181.5 and 189.5->182.3 ms/step in two round-5 sessions, under
    # dots it was neutral-to-worse (TRAINPERF.md round 5) — so the norm
    # choice is a second autotune axis, not a static default.  The honest
    # number is whichever combination THIS session sustains: measure all
    # four, keep the winner; any candidate can also compile-OOM on tighter
    # sessions, so a failure just drops it.
    def timed_step(remat, fresh_params):
        st = create_train_state(
            config, opt, jax.random.PRNGKey(0), peft=True,
            params=fresh_params,
        )
        del fresh_params
        step = make_train_step(config, opt, None, remat=remat)
        st, loss = step(st, batch, key)  # compile + warm
        float(loss)

        def total(n):
            nonlocal st
            loss = None
            t0 = time.perf_counter()
            for _ in range(n):
                st, loss = step(st, batch, key)
            float(loss)
            return time.perf_counter() - t0

        # Two-size slope differencing (see bench_preprocess_stages.timeit):
        # a single sync over n steps leaves ~5 ms/step of fixed tunnel RTT
        # in a plain mean; the slope cancels it.
        total(2)
        return min((total(8) - total(2)) / 6 for _ in range(2))

    results = {}
    prev_norm = os.environ.get("ECG_BYTE_PALLAS_NORM")
    candidates = [(r, n) for n in ("xla", "pallas") for r in ("slim", "dots")]
    try:
        for i, (remat, norm) in enumerate(candidates):
            # the norm gate reads the env var at TRACE time
            # (transformer._pallas_norm_wanted), so toggling here selects
            # the kernel for this candidate's compile
            os.environ["ECG_BYTE_PALLAS_NORM"] = "1" if norm == "pallas" else "0"
            try:
                # the step donates its state, whose base IS `params` —
                # rebuild the (deterministic) init for every candidate
                # after the first
                fresh = params if i == 0 else _flagship()[1]
                results[(remat, norm)] = timed_step(remat, fresh)
            except Exception as e:
                print(f"remat={remat} norm={norm} skipped: {type(e).__name__}",
                      file=sys.stderr)
    finally:
        if prev_norm is None:
            os.environ.pop("ECG_BYTE_PALLAS_NORM", None)
        else:
            os.environ["ECG_BYTE_PALLAS_NORM"] = prev_norm
    if not results:
        raise RuntimeError("no remat mode compiled at the flagship shape")
    remat_mode, norm_mode = min(results, key=results.get)
    dt = results[(remat_mode, norm_mode)]
    tokens_per_s = b * s / dt

    # Model flops per token for frozen-base LoRA training: forward 2*N_mm,
    # backward activation grads 2*N_mm (weight grads skipped), N_mm = all
    # matmul params incl. the unembed.  Remat recompute NOT counted (MFU
    # counts useful flops only).
    c = config
    per_layer = (
        c.hidden_size * c.qkv_dim  # q
        + 2 * c.hidden_size * c.kv_dim  # k, v
        + c.qkv_dim * c.hidden_size  # o
        + 3 * c.hidden_size * c.intermediate_size  # gate, up, down
    )
    n_mm = c.num_layers * per_layer + c.hidden_size * c.vocab_size
    flops_per_token = 4 * n_mm
    _, peak_flops = _device_peaks()
    mfu = tokens_per_s * flops_per_token / peak_flops
    out = {
        "metric": "train_throughput",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(mfu, 3),
        "remat_mode": remat_mode,
        "norm_mode": norm_mode,
    }
    for (rmode, nmode), mdt in results.items():
        suffix = rmode if nmode == "xla" else f"{rmode}_pnorm"
        out[f"ms_per_step_{suffix}"] = round(mdt * 1e3, 1)
    try:
        meas = measure_mxu_flops()
        out["attainable_bf16_tflops"] = round(meas / 1e12, 1)
        out["vs_attainable"] = round(
            tokens_per_s * flops_per_token / meas, 3
        )
    except Exception as e:
        print(f"mxu probe skipped: {e}", file=sys.stderr)
    return out


def _xla_flops_of(jitted, *args):
    """Executed-FLOP count from XLA's cost analysis of the compiled program
    (None when the backend does not report it)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = cost.get("flops") if cost else None
        return float(flops) if flops and flops > 0 else None
    except Exception:
        return None


def bench_pretrain():
    """Stage-1 MERL pretrain step (ResNet101-1D contrastive) at the
    reference shape: batch 128 x (12, 2500) signals, frozen 768-d text
    embeddings, the combined cross-modal + uni-modal CLIP loss
    (reference pretrain.py:155-234, ecg_byte/models/merl.py:171-234).

    value = samples/s for the full train step (resnet fwd+bwd, head,
    losses, adam update).  vs_baseline = MFU-style fraction of the chip's
    nominal bf16 peak with executed flops taken from XLA's cost analysis
    of the compiled step; ``vs_attainable`` divides by the same-session
    measured MXU rate (measure_mxu_flops) like the flagship train row.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ecg_byte_tpu.models import encoders as enc
    from ecg_byte_tpu.models import resnet1d

    b, leads, siglen = 128, 12, 2500
    rp, rs, meta = resnet1d.init_resnet(jax.random.PRNGKey(0), "resnet101")
    feat_shape = jax.eval_shape(
        lambda p, s, x: resnet1d.resnet_forward(p, s, meta, x)[0],
        rp, rs, jax.ShapeDtypeStruct((1, leads, siglen), jnp.float32),
    )
    head = enc.init_merl_head(
        jax.random.PRNGKey(1), feature_channels=meta["out_channels"],
        spacial_dim=int(feat_shape.shape[-1]),
    )
    params = {"resnet": rp, "head": head}
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "norm_signal": jnp.asarray(
            rng.standard_normal((b, leads, siglen), dtype=np.float32)
        ),
        "text_emb": jnp.asarray(
            rng.standard_normal((b, 768), dtype=np.float32)
        ),
    }

    import jax.numpy as _jnp

    def make_step(compute_dtype):
        def loss_fn(p, bn_state, batch, key):
            feats, new_bn = resnet1d.resnet_forward(
                p["resnet"], bn_state, meta, batch["norm_signal"], train=True,
                compute_dtype=compute_dtype,
            )
            loss, _aux = enc.merl_pretrain_loss(
                p["head"], feats, batch["text_emb"], dropout_rng=key,
            )
            return loss, new_bn

        @jax.jit
        def step(p, bn_state, opt_state, batch, key):
            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, bn_state, batch, key
            )
            updates, opt_state = opt.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), new_bn, opt_state, loss

        return step

    # compute-dtype A/B, same per-session autotune discipline as
    # bench_train: bf16 conv operands double the MXU rate (f32 internal
    # accumulation; parity test tests/test_two_stage.py) but the win size
    # is session/shape dependent, so measure both and keep the winner.
    key = jax.random.key(0, impl="rbg")
    results = {}
    steps = {}
    for name, cd in (("f32", None), ("bf16", _jnp.bfloat16)):
        try:
            step = make_step(cd)
            steps[name] = step
            params, rs, opt_state, loss = step(params, rs, opt_state, batch, key)
            float(loss)  # compile + warm, hard sync

            def total(n):
                nonlocal params, rs, opt_state
                loss = None
                t0 = time.perf_counter()
                for _ in range(n):
                    params, rs, opt_state, loss = step(
                        params, rs, opt_state, batch, key
                    )
                float(loss)
                return time.perf_counter() - t0

            total(2)
            results[name] = min((total(8) - total(2)) / 6 for _ in range(2))
        except Exception as e:
            print(f"pretrain dtype={name} skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if not results:
        raise RuntimeError("no pretrain step compiled")
    dtype_mode = min(results, key=results.get)
    dt = results[dtype_mode]
    samples_per_s = b / dt

    out = {
        "metric": "pretrain_merl_throughput",
        "value": round(samples_per_s, 1),
        "unit": f"samples/s (resnet101, batch {b} x {leads}x{siglen})",
        "ms_per_step": round(dt * 1e3, 1),
        "compute_dtype": dtype_mode,
        "vs_baseline": 0,
    }
    for name, mdt in results.items():
        out[f"ms_per_step_{name}"] = round(mdt * 1e3, 1)
    flops = _xla_flops_of(steps[dtype_mode], params, rs, opt_state, batch, key)
    if flops:
        _, peak = _device_peaks()
        out["vs_baseline"] = round(flops / dt / peak, 3)
        out["xla_flops_per_step"] = flops
        try:
            out["vs_attainable"] = round(flops / dt / measure_mxu_flops(), 3)
        except Exception as e:
            print(f"mxu probe skipped: {e}", file=sys.stderr)
    return out


def bench_finetune_fusion(config, params):
    """Stage-2 fusion train step: frozen ResNet101 signal encoder spliced
    into the flagship LLM (LoRA), the reference finetune.py:173-199 path.

    Same shape discipline as bench_train (batch 4, sequence 1024 after the
    <signal> splice): value = tokens/s; vs_baseline = MFU vs nominal peak
    using the same analytic 4*N_mm LLM flop model (the frozen encoder adds
    forward-only flops, excluded like remat recompute); ``vs_attainable``
    divides by the session MXU probe.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ecg_byte_tpu.models import fusion as F
    from ecg_byte_tpu.models import lora as lora_lib
    from ecg_byte_tpu.models import resnet1d

    # Training-mode adapt_sequence (labels present, add_idx=2) CONSUMES the
    # slot after <signal>, so the spliced length equals the input length —
    # and the real dataset packs to pad_to_max+4 = 1024 (data/datasets.py).
    # 1024 = 8x128 keeps the resident attention kernel's s%128 gate and the
    # MXU tile alignment; an off-by-one 1023 here measured +89 ms/step
    # (resident kernel rejected, every matmul padding a ragged tile).
    b, s = 4, 1024
    rp, rs, meta = resnet1d.init_resnet(jax.random.PRNGKey(0), "resnet101")
    fus = F.init_fusion(
        jax.random.PRNGKey(1), "resnet_model", config.hidden_size,
        resnet_channels=meta["out_channels"],
    )
    lora = lora_lib.init_lora(config, jax.random.PRNGKey(2))
    trainable = {"fusion": fus, "lora": lora}
    opt = optax.adamw(1e-4)
    opt_state = opt.init(trainable)

    rng = np.random.default_rng(0)
    sig_id = config.vocab_size - 2
    ids = np.asarray(rng.integers(0, 1000, (b, s)), np.int32)
    ids[:, 0] = sig_id  # one <signal> placeholder per row
    batch = {
        "norm_signal": jnp.asarray(
            rng.standard_normal((b, 12, 2500), dtype=np.float32)
        ),
        "tokenized_signal": jnp.asarray(ids),
        "attn_mask": jnp.ones((b, s), jnp.int32),
        "quantized_signal_ids_input": jnp.asarray(ids),
        "position_ids": jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s)),
    }

    # the frozen trees (2.47 GB LLM base + ResNet) must be jit ARGUMENTS:
    # closed over, XLA embeds them as compile-time constants (a 2.6 GB
    # lowering, minutes of extra compile, and a second device copy)
    frozen = {"llm": params, "rp": rp, "rs": rs}

    def loss_fn(tr, frozen, batch, key):
        return F.fusion_lm_loss(
            frozen["llm"], config, tr["fusion"], "resnet_model", batch,
            sig_id, lora=tr["lora"], dropout_rng=key,
            encoders={"resnet": (frozen["rp"], frozen["rs"], meta)},
        )

    @jax.jit
    def step(tr, opt_state, frozen, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(tr, frozen, batch, key)
        updates, opt_state = opt.update(grads, opt_state, tr)
        return optax.apply_updates(tr, updates), opt_state, loss

    key = jax.random.key(0, impl="rbg")
    trainable, opt_state, loss = step(trainable, opt_state, frozen, batch, key)
    float(loss)

    def total(n):
        nonlocal trainable, opt_state
        loss = None
        t0 = time.perf_counter()
        for _ in range(n):
            trainable, opt_state, loss = step(
                trainable, opt_state, frozen, batch, key
            )
        float(loss)
        return time.perf_counter() - t0

    total(2)
    dt = min((total(8) - total(2)) / 6 for _ in range(2))
    tokens_per_s = b * s / dt  # training-mode splice keeps length == s

    c = config
    per_layer = (
        c.hidden_size * c.qkv_dim
        + 2 * c.hidden_size * c.kv_dim
        + c.qkv_dim * c.hidden_size
        + 3 * c.hidden_size * c.intermediate_size
    )
    n_mm = c.num_layers * per_layer + c.hidden_size * c.vocab_size
    _, peak = _device_peaks()
    mfu = tokens_per_s * 4 * n_mm / peak
    out = {
        "metric": "finetune_fusion_throughput",
        "value": round(tokens_per_s, 1),
        "unit": f"tokens/s (resnet encoder + flagship LoRA, batch {b} x {s})",
        "ms_per_step": round(dt * 1e3, 1),
        "vs_baseline": round(mfu, 3),
    }
    try:
        out["vs_attainable"] = round(
            tokens_per_s * 4 * n_mm / measure_mxu_flops(), 3
        )
    except Exception as e:
        print(f"mxu probe skipped: {e}", file=sys.stderr)
    return out


def bench_tokenizer_train():
    """Merge-learning wall-clock at the canonical 3,500 merges: the csrc
    incremental trainer (doubly-linked token list + incrementally maintained
    pair counts, O(corpus + merge sites)) vs the reference ALGORITHM (full
    corpus rescan per merge, rust_bpe/src/lib.rs:85-117) compiled in the
    same C++ translation unit with the same deterministic tie-break — the
    language and compiler cancel, so the ratio is the algorithm's.

    The canonical corpus (scripts/train_tok.sh:4-9) is 200k sampled ECGs
    (~6.0e9 symbols at 12 leads x 2500 samples) — the rescan algorithm
    needs days for that single-threaded (the reference's rayon get_stats
    is a <= num_threads=6 constant factor on the same O(merges * corpus)
    asymptotics), so the head-to-head runs at a common small size, rescan
    linearity in corpus length is verified with a second size, and both
    are extrapolated linearly to 200k ECGs (both algorithms are linear in
    corpus at fixed merges; extrapolation noted in the row).  Outputs of
    the two trainers are asserted identical (the algorithm-identity oracle
    also runs in tests/test_bpe.py).
    """
    from ecg_byte_tpu.ops.quantize import normalize_quantize, quantized_to_string
    from ecg_byte_tpu.tokenizer import native

    n_merges = 3500
    symbols_per_ecg = 12 * 2500  # canonical post-resample shape

    def corpus_of(n_ecgs, rng):
        # quantized synthetic ECG text at the canonical per-record length;
        # built in chunks so the float intermediates stay bounded
        parts = []
        remaining = n_ecgs
        while remaining:
            take = min(remaining, 512)
            recs = make_synthetic_records(take, rng, length=2500)
            p1, p99 = np.percentile(recs, 1), np.percentile(recs, 99)
            _, q = normalize_quantize(recs, p1, p99)
            parts.append(
                "".join(quantized_to_string(np.asarray(qi)) for qi in q)
            )
            remaining -= take
        return "".join(parts).encode()

    rng = np.random.default_rng(7)
    head_to_head_ecgs = 50
    ours_large_ecgs = 4000
    canonical_ecgs = 200_000

    small = corpus_of(head_to_head_ecgs, rng)
    smaller = small[: len(small) // 2]

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return time.perf_counter() - t0, out

    t_rescan, (_, merges_r) = timed(
        lambda: native.train(small, n_merges, algorithm="rescan")
    )
    t_ours_small, (_, merges_i) = timed(lambda: native.train(small, n_merges))
    assert [tuple(m) for m in merges_r] == [tuple(m) for m in merges_i], (
        "rescan and incremental trainers diverged"
    )
    # rescan linearity check: half the corpus, same merges -> ~half the time
    t_rescan_half, _ = timed(
        lambda: native.train(smaller, n_merges, algorithm="rescan")
    )
    large = corpus_of(ours_large_ecgs, rng)
    t_ours_large, _ = timed(lambda: native.train(large, n_merges))

    rescan_200k_s = t_rescan * (canonical_ecgs / head_to_head_ecgs)
    ours_200k_s = t_ours_large * (canonical_ecgs / ours_large_ecgs)
    return {
        "metric": "tokenizer_train",
        "value": round(t_ours_large, 2),
        "unit": f"s for 3500 merges over {ours_large_ecgs} ECGs "
                f"({len(large) / 1e6:.0f} MB corpus)",
        # measured head-to-head algorithm ratio at the common size
        "vs_baseline": round(t_rescan / t_ours_small, 1),
        "head_to_head_ecgs": head_to_head_ecgs,
        "rescan_s": round(t_rescan, 2),
        "ours_s_same_corpus": round(t_ours_small, 3),
        "rescan_linearity": round(t_rescan / max(t_rescan_half, 1e-9), 2),
        "symbols_per_ecg": symbols_per_ecg,
        # linear extrapolations to the canonical 200k-ECG corpus
        "rescan_200k_extrapolated_h": round(rescan_200k_s / 3600, 1),
        "ours_200k_extrapolated_s": round(ours_200k_s, 1),
        "speedup_200k_extrapolated": round(rescan_200k_s / ours_200k_s, 0),
        "note": ("single-threaded head-to-head; the reference's rayon "
                 "get_stats is a <=6x constant factor (train_tok.sh uses "
                 "6 threads) on the same O(merges*corpus) scaling"),
    }


def measure_mxu_flops():
    """Achieved bf16 MXU FLOP/s on a large square matmul, same process.

    The train MFU divides by the device's NOMINAL bf16 peak; sessions
    through the axon tunnel vary >20% in wall-clock for identical
    binaries (TRAINPERF.md: 204-296 ms/step across sessions, same code),
    so the nominal fraction conflates kernel quality with session
    throttle.  This probe measures what the MXU actually sustains in
    THIS session — the analogue of measure_stream_bandwidth for the HBM
    roofline — and vs_attainable records the step's fraction of it.
    Slope-differenced like the other probes.
    """
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    bm = jnp.ones((n, n), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnums=(2,))
    def chain(a, b, steps):
        def body(c, _):
            c = (c @ b) * (1.0 / n)  # rescale keeps values finite
            return c.astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, a, None, length=steps)
        return c[0, 0].astype(jnp.float32)

    def run(steps):
        t0 = time.perf_counter()
        float(np.asarray(chain(a, bm, steps)))
        return time.perf_counter() - t0

    run(4)  # compile both shapes up front
    run(32)
    dt = min(run(32) - run(4) for _ in range(3)) / 28
    return 2 * n * n * n / dt


def main():
    rng = np.random.default_rng(0)
    from ecg_byte_tpu.tokenizer import native

    # dev aid: ECG_BYTE_BENCH_ONLY=decode|train|preprocess (comma-separable)
    # limits the run to those metric groups; the driver runs everything.
    only = {
        s.strip()
        for s in os.environ.get("ECG_BYTE_BENCH_ONLY", "").split(",")
        if s.strip()
    }

    def wanted(group):
        return not only or group in only

    # flagship decode + train first (they share the 1B-param init)
    if wanted("decode") or wanted("train"):
        try:
            config, params = _flagship()
            if wanted("decode"):
                bf16_row = bench_decode(config, params)
                print(json.dumps(bf16_row))
                try:  # beyond-reference serving mode; never costs parity
                    print(json.dumps(bench_decode_int8(config, params, bf16_row)))
                except Exception as e:
                    print(f"int8 decode bench skipped: {e}", file=sys.stderr)
            if wanted("train"):
                print(json.dumps(bench_train(config, params)))
            del params
        except Exception as e:  # keep the headline metric alive on small hosts
            print(f"flagship decode/train bench skipped: {e}", file=sys.stderr)

    if wanted("gpt2"):
        # non-llama flagship: GPT-2-XL (1.5B — learned positions, biases,
        # LayerNorm, gelu) decode row, so the perf story is validated on a
        # structurally different family (VERDICT r4 item 10).  Prompt 512:
        # gpt2's learned position table caps S_max at 1024.
        try:
            import jax

            from ecg_byte_tpu.models import gpt2_xl
            from ecg_byte_tpu.models import transformer as T

            cfg_g = gpt2_xl()
            params_g = T.init_params(cfg_g, jax.random.PRNGKey(0))
            print(json.dumps(bench_decode(
                cfg_g, params_g, metric="decode_throughput_gpt2xl", s=512
            )))
            del params_g
        except Exception as e:
            print(f"gpt2-xl decode bench skipped: {e}", file=sys.stderr)

    if wanted("twostage"):
        try:
            print(json.dumps(bench_pretrain()))
        except Exception as e:
            print(f"pretrain bench skipped: {e}", file=sys.stderr)
        try:
            config2, params2 = _flagship()
            print(json.dumps(bench_finetune_fusion(config2, params2)))
            del params2
        except Exception as e:
            print(f"fusion bench skipped: {e}", file=sys.stderr)

    if wanted("tokenizer"):
        try:
            print(json.dumps(bench_tokenizer_train()))
        except Exception as e:
            print(f"tokenizer train bench skipped: {e}", file=sys.stderr)

    if not wanted("preprocess"):
        return

    merges, p1, p99 = train_merges(rng, num_merges=3500)
    encoder = native.NativeEncoder(merges)

    # --- baseline: measure a few records sequentially (best of 2 rounds)
    base_recs = make_synthetic_records(8, rng)
    base_rates = []
    for _ in range(2):
        t0 = time.perf_counter()
        reference_host_path(base_recs, p1, p99, encoder)
        base_rates.append(len(base_recs) / (time.perf_counter() - t0))
    baseline_rate = max(base_rates)

    # --- ours: batched on device, raw int16 ADC ingest (WFDB source units)
    import jax

    batch = 256
    recs = make_synthetic_records(batch, rng)
    adc = np.clip(recs * 200.0, -32768, 32767).astype(np.int16)
    pipeline = tpu_path_factory(merges, p1, p99)
    adc_dev = jax.device_put(adc)
    ids, counts = pipeline(adc_dev)  # compile + warm
    np.asarray(counts)  # hard sync (tunnel-safe)

    # primary: device pipeline throughput.  Ingest is excluded because it
    # is environment-bound, not design-bound: a co-located TPU host feeds
    # HBM over PCIe/DMA at >10 GB/s (~2 ms per 30 MB batch, <1% of step
    # time), while this dev harness tunnels at ~85 MB/s (~350 ms/batch,
    # the dominant term).  The tunnel-ingest rate is reported separately.
    rates = []
    for _round in range(3):
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            ids, counts = pipeline(adc_dev)
        np.asarray(counts)
        rates.append(iters * batch / (time.perf_counter() - t0))
    our_rate = sorted(rates)[len(rates) // 2]  # median round

    # measured per-stage budget (each stage jitted alone; same batch) —
    # committed so the throughput number travels with its decomposition
    try:
        print(json.dumps(bench_preprocess_stages(merges, p1, p99, adc_dev, batch)))
    except Exception as e:  # never cost the headline metric
        print(f"stage budget skipped: {e}", file=sys.stderr)

    # secondary: with per-batch host->device ingest through this
    # environment's tunnel, transfers double-buffered against compute
    t0 = time.perf_counter()
    prev = None
    staged = jax.device_put(adc)
    for _ in range(6):
        cur, staged = staged, jax.device_put(adc)  # overlap next transfer
        ids, counts = pipeline(cur)
        if prev is not None:
            np.asarray(prev)  # steady-state: sync with one batch lag
        prev = counts
    np.asarray(prev)
    ingest_rate = 6 * batch / (time.perf_counter() - t0)

    # The ingest metric's denominator: measured host->device transfer rate
    # THIS session.  The metric is tunnel-bound by design (see comment
    # above), so without the same-session tunnel rate a swing across
    # driver rounds (BENCH_r03 385.5 vs BENCH_r04 167.5 ECGs/s) is
    # unattributable.  Slope-differenced over two transfer counts so the
    # fixed per-dispatch RTT cancels, same discipline as the HBM/MXU
    # probes.
    def _transfer_total(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                jax.device_put(adc).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    try:
        _transfer_total(1)  # warm
        t_lo, t_hi = _transfer_total(2), _transfer_total(8)
        tunnel_bps = (8 - 2) * adc.nbytes / max(t_hi - t_lo, 1e-9)
        tunnel_row = {
            "tunnel_gbps": round(tunnel_bps / 1e9, 3),
            "batch_mb": round(adc.nbytes / 1e6, 1),
        }
    except Exception as e:
        print(f"tunnel probe skipped: {e}", file=sys.stderr)
        tunnel_row = {}

    print(
        json.dumps(
            {
                "metric": "preprocess_tokenize_ingest_limited",
                "value": round(ingest_rate, 2),
                "unit": "ECGs/s",
                "vs_baseline": round(ingest_rate / baseline_rate, 2),
                **tunnel_row,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "preprocess_tokenize_throughput",
                "value": round(our_rate, 2),
                "unit": "ECGs/s",
                "vs_baseline": round(our_rate / baseline_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
