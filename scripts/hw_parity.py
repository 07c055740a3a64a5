"""Hardware (non-interpret) parity checks for the Pallas kernels.

The pytest suite runs on the virtual CPU mesh where Pallas executes in
interpret mode, which does not exercise Mosaic's layout lowering.  This
script re-runs the exactness oracles on the real chip so layout
assumptions (e.g. the 128-aligned lane-offset slices after ``pltpu.roll``
in ops/bpe_match.py, the strided native-layout cache BlockSpecs in
ops/attention_decode.py) are validated against actual Mosaic codegen.

Run: ``python scripts/hw_parity.py``  (needs a TPU-backed jax).
Results of each dated run are recorded in the kernel docstrings /
TRAINPERF.md.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def check_bpe_match_bits():
    """Bits kernel token streams vs the native trie encoder on hardware."""
    from ecg_byte_tpu.ops import bpe_match
    from ecg_byte_tpu.ops.quantize import quantized_to_string
    from ecg_byte_tpu.tokenizer import native

    rng = np.random.default_rng(0)
    walk = np.cumsum(rng.integers(-2, 3, size=200_000))
    corpus = quantized_to_string((np.abs(walk) % 26).astype(np.uint8)).encode()
    _, merges = native.train(corpus, 500)
    pm = bpe_match.build_pallas_matcher(merges)
    assert pm.use_bits, "expected the bits kernel to be selected"

    q = (np.abs(np.cumsum(rng.integers(-2, 3, size=(16, 30_000)), axis=1))
         % 26).astype(np.uint8)
    ids, cnt = bpe_match.encode(q, pm)  # non-interpret: real Mosaic lowering
    ids, cnt = np.asarray(ids), np.asarray(cnt)

    enc = native.NativeEncoder(merges)
    for i, row in enumerate(q):
        want = [int(t) for t in enc.encode(quantized_to_string(row).encode())]
        got = [int(t) for t in ids[i][: int(cnt[i])]]
        assert got == want, f"row {i}: bits kernel diverged from trie"
    print(f"bpe_match bits kernel: {q.shape[0]}x{q.shape[1]} rows "
          f"token-exact vs native trie on {jax.devices()[0].device_kind}")


def check_fused_decode_attention():
    """Fused decode-attention kernel vs the XLA path on hardware."""
    from ecg_byte_tpu.ops.attention import decode_attention
    from ecg_byte_tpu.ops.attention_decode import decode_attention_fused

    rng = np.random.default_rng(1)
    for int8 in (False, True):
        b, s, h, kh, d = 4, 1152, 32, 8, 64
        q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
        if int8:
            k = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
            v = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
            ks = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
            vs = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
        else:
            k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
            ks = vs = None
        mask = np.ones((b, s), np.int32)
        mask[:, -128:] = 0
        mask[0, :7] = 0
        mask = jnp.asarray(mask)

        want = np.asarray(
            decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs)
        ).astype(np.float32)
        got = np.asarray(
            decode_attention_fused(q, k, v, mask, ks, vs)
        ).astype(np.float32)
        # bf16 PV accumulation differences only; tolerance is bf16 ulp-scale
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        err = float(np.max(np.abs(got - want)))
        print(f"fused decode attention ({'int8' if int8 else 'bf16'}): "
              f"max |delta| vs XLA path = {err:.2e} on hardware")


def bench_fused_vs_xla():
    """Micro A/B of the per-layer attention op (not the full decode step)."""
    from ecg_byte_tpu.ops.attention import decode_attention
    from ecg_byte_tpu.ops.attention_decode import decode_attention_fused

    rng = np.random.default_rng(2)
    b, s, h, kh, d = 1, 1152, 32, 8, 64
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.bfloat16)
    mask = jnp.ones((b, s), jnp.int32)

    # 16 back-to-back layers' worth per timed call, mimicking a token step
    def many(fn):
        def f(q, k, v, mask, ks, vs):
            out = q
            for _ in range(16):
                out = fn(out.reshape(b, 1, h, d), k, v, mask, ks, vs)
            return out
        return jax.jit(f)

    for int8 in (False, True):
        if int8:
            k = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
            v = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
            ks = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
            vs = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
        else:
            k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.bfloat16)
            ks = vs = None
        for name, fn in (
            ("xla", lambda q, k, v, m, ks, vs: decode_attention(
                q, k, v, m, k_scale=ks, v_scale=vs)),
            ("fused", lambda q, k, v, m, ks, vs: decode_attention_fused(
                q, k, v, m, ks, vs)),
        ):
            g = many(fn)
            np.asarray(g(q, k, v, mask, ks, vs))  # compile + warm
            reps = 50
            t0 = time.perf_counter()
            for _ in range(reps):
                out = g(q, k, v, mask, ks, vs)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / reps
            kind = "int8" if int8 else "bf16"
            print(f"decode attention x16 layers ({kind}/{name}): "
                  f"{dt * 1e3:.3f} ms")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    check_bpe_match_bits()
    check_fused_decode_attention()
    bench_fused_vs_xla()
