"""Parity tests for the fused RMSNorm Pallas kernel (ops/rmsnorm.py) in
interpret mode against the XLA formula in models/transformer._norm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecg_byte_tpu.ops.rmsnorm import rmsnorm, supported

EPS = 1e-5


def _xla_rmsnorm(x, w, eps=EPS):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), -1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 16, 128), (32, 256), (8, 128)])
def test_forward_parity(dtype, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    w = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    got = rmsnorm(x, w, EPS, 16, True)
    want = _xla_rmsnorm(x, w)
    if dtype == jnp.bfloat16:
        assert (got == want).all()  # same f32 math, same final cast
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_gradient_parity_dx_and_dw():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(128), jnp.float32)
    g = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)

    def loss_kernel(x, w):
        return jnp.sum(rmsnorm(x, w, EPS, 8, True) * g)

    def loss_xla(x, w):
        return jnp.sum(_xla_rmsnorm(x, w) * g)

    dx_k, dw_k = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    dx_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_x),
                               rtol=1e-5, atol=1e-5)


def test_grid_accumulated_dw_multi_block():
    """dw must sum over ALL row blocks (grid accumulation), not just one."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.ones(128, jnp.float32)
    dw = jax.grad(
        lambda w: jnp.sum(rmsnorm(x, w, EPS, 8, True)), argnums=0
    )(w)
    dw_ref = jax.grad(lambda w: jnp.sum(_xla_rmsnorm(x, w)))(w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate():
    assert supported(jnp.zeros((4, 1024, 2048)), 2048)
    assert not supported(jnp.zeros((4, 16, 100)), 100)  # lane-misaligned


def test_norm_env_gate_off_by_default(monkeypatch):
    """transformer._norm only dispatches to the kernel under the env flag."""
    from ecg_byte_tpu.models import transformer as T

    monkeypatch.delenv("ECG_BYTE_PALLAS_NORM", raising=False)
    assert not T._pallas_norm_wanted(jnp.zeros((4, 1024, 2048)))
