"""Parity tests for the resident-sequence Pallas attention kernel.

Oracle: the XLA grouped-attention path in ops/attention.py (itself
HF-parity-tested via tests/test_hf_parity.py).  Runs the Pallas kernel in
interpret mode on the CPU mesh; on-device numerics are exercised by the
train bench and the flash parity test pattern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.ops import attention, attention_resident


def _make_inputs(b, s, kh, g, d, seed=0, left_pad=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, s, kh * g, d)).astype(np.float32)
    k = rng.normal(size=(b, s, kh, d)).astype(np.float32)
    v = rng.normal(size=(b, s, kh, d)).astype(np.float32)
    pad_mask = np.ones((b, s), np.int32)
    if left_pad:
        pad_mask[:, :left_pad] = 0
    return (
        jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16),
        jnp.asarray(pad_mask),
    )


@pytest.mark.parametrize("left_pad", [0, 37])
@pytest.mark.parametrize(
    "b,s,kh,g,d,block_m",
    [
        (2, 256, 2, 4, 64, 512),   # GQA fold: block spans multiple heads
        (1, 256, 2, 1, 64, 256),   # MHA (g=1): block == one head
        (2, 128, 1, 2, 64, 128),   # block smaller than a head
    ],
)
def test_resident_matches_grouped(b, s, kh, g, d, block_m, left_pad):
    q, k, v, pad_mask = _make_inputs(b, s, kh, g, d, left_pad=left_pad)
    qg = q.reshape(b, s, kh, g, d)

    ref = attention._grouped_attention(qg, k, v, pad_mask)
    got = attention_resident.resident_attention(
        qg, k, v, pad_mask, block_m, True
    )
    valid = np.asarray(pad_mask, bool)
    r = np.asarray(ref, np.float32)[valid]
    o = np.asarray(got, np.float32)[valid]
    np.testing.assert_allclose(o, r, atol=2e-2, rtol=2e-2)


def test_resident_grads_match_grouped():
    b, s, kh, g, d, block_m = 2, 256, 2, 4, 64, 512
    q, k, v, pad_mask = _make_inputs(b, s, kh, g, d, left_pad=19, seed=3)
    qg = q.reshape(b, s, kh, g, d)

    def loss_ref(qg, k, v):
        out = attention._grouped_attention(qg, k, v, pad_mask)
        w = pad_mask[:, :, None, None, None].astype(out.dtype)
        return jnp.sum((out * w).astype(jnp.float32) ** 2)

    def loss_res(qg, k, v):
        out = attention_resident.resident_attention(
            qg, k, v, pad_mask, block_m, True
        )
        w = pad_mask[:, :, None, None, None].astype(out.dtype)
        return jnp.sum((out * w).astype(jnp.float32) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qg, k, v)
    gp = jax.grad(loss_res, argnums=(0, 1, 2))(qg, k, v)
    for name, a, bb in zip("qkv", gr, gp):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            bb / scale, a / scale, atol=4e-2, err_msg=f"d{name}"
        )


def test_resident_no_pad_mask():
    b, s, kh, g, d = 1, 128, 2, 2, 64
    q, k, v, _ = _make_inputs(b, s, kh, g, d, seed=7)
    qg = q.reshape(b, s, kh, g, d)
    ref = attention._grouped_attention(qg, k, v, None)
    got = attention_resident.resident_attention(qg, k, v, None, 256, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_resident_sharded_matches_single_device():
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    b, s, kh, g, d = 2, 256, 2, 4, 64
    q, k, v, pad_mask = _make_inputs(b, s, kh, g, d, left_pad=11, seed=5)
    qg = q.reshape(b, s, kh, g, d)

    ref = attention._grouped_attention(qg, k, v, pad_mask)
    got = attention_resident.resident_attention_sharded(
        qg, k, v, pad_mask, mesh=mesh, block_m=256, interpret=True
    )
    valid = np.asarray(pad_mask, bool)
    np.testing.assert_allclose(
        np.asarray(got, np.float32)[valid],
        np.asarray(ref, np.float32)[valid],
        atol=2e-2, rtol=2e-2,
    )


def test_resident_grads_under_remat():
    """jax.checkpoint around the custom-VJP kernel (the train step wraps
    layers in remat policies) must reproduce the unwrapped gradients."""
    b, s, kh, g, d, block_m = 1, 128, 2, 2, 64, 256
    q, k, v, pad_mask = _make_inputs(b, s, kh, g, d, seed=11)
    qg = q.reshape(b, s, kh, g, d)

    def loss(qg, k, v):
        out = attention_resident.resident_attention(
            qg, k, v, pad_mask, block_m, True
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_plain = jax.grad(loss, argnums=(0, 1, 2))(qg, k, v)
    g_remat = jax.grad(jax.checkpoint(loss), argnums=(0, 1, 2))(qg, k, v)
    for a, bb in zip(g_plain, g_remat):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=1e-3, rtol=1e-3,
        )


def test_supported_gate():
    assert attention_resident.supported((4, 1024, 8, 4, 64), jnp.bfloat16)
    assert not attention_resident.supported((4, 1024, 8, 4, 64), jnp.float32)
    assert not attention_resident.supported((1, 4096, 8, 4, 64), jnp.bfloat16)
    assert not attention_resident.supported((1, 100, 8, 4, 64), jnp.bfloat16)
