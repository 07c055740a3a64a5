"""Interpret-mode parity: fused decode-attention kernel vs the XLA path
(ops/attention.decode_attention) for bf16 and int8-scaled caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.ops.attention import decode_attention
from ecg_byte_tpu.ops.attention_decode import decode_attention_fused, supported


def _case(b=2, s=256, h=8, kh=2, d=64, int8=False, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    if int8:
        k = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (b, s, kh, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.05, (b, s, kh)), jnp.float32)
    else:
        k = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, s, kh, d)), jnp.float32)
        ks = vs = None
    mask = np.ones((b, s), np.int32)
    mask[:, -s // 4:] = 0  # unfilled tail
    mask[0, :3] = 0        # left padding
    return q, k, v, jnp.asarray(mask), ks, vs


@pytest.mark.parametrize("int8", [False, True])
def test_fused_matches_xla(int8):
    q, k, v, mask, ks, vs = _case(int8=int8)
    want = decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs)
    got = decode_attention_fused(q, k, v, mask, ks, vs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("int8", [False, True])
def test_fused_mha_flat_path_matches_xla(int8):
    """g == 1 (MHA, e.g. GPT-2): the flat probs-expand PV path, including
    an odd head count so the packed KH*D lane span is tile-unaligned."""
    q, k, v, mask, ks, vs = _case(h=5, kh=5, int8=int8, seed=7)
    want = decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs)
    got = decode_attention_fused(q, k, v, mask, ks, vs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_single_kv_head_gqa_fold():
    q, k, v, mask, *_ = _case(b=1, s=128, h=4, kh=1, seed=3)
    want = decode_attention(q, k, v, mask)
    got = decode_attention_fused(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("int8", [False, True])
def test_fused_fresh_row_substitution(int8):
    """fresh_k/fresh_v + write_idx: the kernel sees the STALE pre-append
    cache (garbage at the write slot) plus this token's row, and must
    match the XLA path running on the appended cache."""
    q, k, v, mask, ks, vs = _case(int8=int8, seed=11)
    b, s, kh, d = k.shape
    write_idx = jnp.int32(s // 2)
    rng = np.random.default_rng(99)
    if int8:
        fk = jnp.asarray(rng.integers(-127, 128, (b, 1, kh, d)), jnp.int8)
        fv = jnp.asarray(rng.integers(-127, 128, (b, 1, kh, d)), jnp.int8)
        fks = jnp.asarray(rng.uniform(0.01, 0.05, (b, 1, kh)), jnp.float32)
        fvs = jnp.asarray(rng.uniform(0.01, 0.05, (b, 1, kh)), jnp.float32)
    else:
        fk = jnp.asarray(rng.standard_normal((b, 1, kh, d)), jnp.float32)
        fv = jnp.asarray(rng.standard_normal((b, 1, kh, d)), jnp.float32)
        fks = fvs = None
    # the appended cache the XLA oracle sees
    k_new = k.at[:, s // 2].set(fk[:, 0])
    v_new = v.at[:, s // 2].set(fv[:, 0])
    ks_new = ks.at[:, s // 2].set(fks[:, 0]) if int8 else None
    vs_new = vs.at[:, s // 2].set(fvs[:, 0]) if int8 else None
    mask = mask.at[:, s // 2].set(1)
    want = decode_attention(
        q, k_new, v_new, mask, k_scale=ks_new, v_scale=vs_new
    )
    got = decode_attention_fused(
        q, k, v, mask, ks, vs,
        fresh_k=fk, fresh_v=fv, fresh_ks=fks, fresh_vs=fvs,
        write_idx=write_idx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_supported_gate():
    assert supported((1, 1, 32, 64), 1152, 64)
    assert not supported((1, 1, 32, 64), 1000, 64)  # s not lane-aligned
    assert not supported((1, 1, 32, 100), 1152, 100)


def test_dispatch_gate_int8_cache_keeps_xla(monkeypatch):
    """int8 KV caches stay on the XLA path (measured slower fused on v5e,
    see ops/attention_decode.py docstring) unless explicitly forced."""
    from ecg_byte_tpu.models.transformer import _fused_decode_attn_wanted

    k = jnp.zeros((1, 1152, 8, 64), jnp.int8)
    cache = {"k": k, "v": k, "k_scale": jnp.ones((1, 1152, 8)),
             "v_scale": jnp.ones((1, 1152, 8))}
    monkeypatch.setenv("ECG_BYTE_FUSED_DECODE_ATTN", "1")
    assert not _fused_decode_attn_wanted(None, cache)
    monkeypatch.setenv("ECG_BYTE_FUSED_DECODE_ATTN", "0")
    assert not _fused_decode_attn_wanted(None, cache)
