"""Same-session A/B of the fused RMSNorm Pallas kernel inside the full
flagship train step (VERDICT round-4 item 5: the 13.8 ms/step XLA norm
cost measured by identity-stubbing in TRAINPERF round 4b).

Runs the flagship 4x1024 LoRA step twice in one process — XLA norms vs
ECG_BYTE_PALLAS_NORM=1 — under both remat policies, slope-differenced
timing (same discipline as bench.bench_train).  Results land in
TRAINPERF.md / the kernel docstring.

Run: ``python scripts/norm_ab.py``  (needs a TPU-backed jax).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402


def timed_step(config, params, remat):
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
    key = jax.random.key(1, impl="rbg")
    st = create_train_state(
        config, opt, jax.random.PRNGKey(0), peft=True, params=params
    )
    step = make_train_step(config, opt, None, remat=remat)
    st, loss = step(st, batch, key)
    float(loss)

    def total(n):
        nonlocal st
        loss = None
        t0 = time.perf_counter()
        for _ in range(n):
            st, loss = step(st, batch, key)
        float(loss)
        return time.perf_counter() - t0

    total(2)
    return min((total(8) - total(2)) / 6 for _ in range(2))


def main():
    print(f"devices: {jax.devices()}")
    for norm in ("xla", "pallas"):
        os.environ["ECG_BYTE_PALLAS_NORM"] = "1" if norm == "pallas" else "0"
        for remat in ("slim", "dots"):
            config, params = bench._flagship()
            try:
                dt = timed_step(config, params, remat)
                print(f"norm={norm:6s} remat={remat:4s}: {dt * 1e3:7.1f} ms/step",
                      flush=True)
            except Exception as e:
                print(f"norm={norm:6s} remat={remat:4s}: failed "
                      f"({type(e).__name__}: {e})", flush=True)
            del config, params


if __name__ == "__main__":
    main()
