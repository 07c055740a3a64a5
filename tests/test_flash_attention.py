"""Pallas flash attention parity vs the XLA reference path (interpret mode
on CPU; the same kernels were validated on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.ops import attention as A
from ecg_byte_tpu.ops import flash_attention as FA


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    b, s, h, kh, d = 2, 64, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[0, :9] = 0  # left padding on row 0
    return q, k, v, jnp.asarray(mask)


def test_forward_matches_xla(qkv):
    q, k, v, mask = qkv
    ref, _ = A.causal_attention(q, k, v, mask, use_flash=False)
    out = FA.flash_attention(q, k, v, mask, block_q=32, block_k=32, interpret=True)
    valid = np.asarray(mask) == 1
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], atol=2e-3
    )


def test_forward_no_mask(qkv):
    q, k, v, _ = qkv
    ref, _ = A.causal_attention(q, k, v, None, use_flash=False)
    out = FA.flash_attention(q, k, v, None, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_backward_matches_xla(qkv):
    q, k, v, mask = qkv
    valid = jnp.asarray(np.asarray(mask) == 1)

    def loss_flash(q, k, v):
        out = FA.flash_attention(q, k, v, mask, block_q=32, block_k=32, interpret=True)
        return jnp.sum(jnp.where(valid[..., None, None], out, 0.0) ** 2)

    def loss_ref(q, k, v):
        out, _ = A.causal_attention(q, k, v, mask, use_flash=False)
        return jnp.sum(jnp.where(valid[..., None, None], out, 0.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=f"d{name} mismatch",
        )


def test_unsupported_configs_raise():
    q = jnp.zeros((1, 64, 4, 10))  # head_dim not multiple of 8
    with pytest.raises(NotImplementedError):
        FA.flash_attention(q, q, q, None)
    q = jnp.zeros((1, 8, 4, 16))  # sequence too short
    with pytest.raises(NotImplementedError):
        FA.flash_attention(q, q, q, None)


def test_flash_attention_sharded_parity():
    """shard_map-wrapped kernel matches the XLA reference on a dp x tp mesh."""
    import jax
    from ecg_byte_tpu.ops.attention import causal_attention
    from ecg_byte_tpu.ops.flash_attention import flash_attention_sharded
    from ecg_byte_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    rng = np.random.default_rng(0)
    b, s, h, kh, d = 4, 64, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, kh, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, s)) > 0.2, jnp.int32)
    mask = mask.at[:, -1].set(1)

    with mesh:
        out = flash_attention_sharded(q, k, v, mask, mesh=mesh, interpret=True)
    want, _ = causal_attention(q, k, v, mask, use_flash=False)
    valid = np.asarray(mask)[:, :, None, None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(want) * valid, atol=2e-2, rtol=2e-2
    )
