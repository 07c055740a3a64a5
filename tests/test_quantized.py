"""Weight-only int8 serving mode (models/quantized.py).

The reference has no quantized serving; this mode exists for the TPU
decode roofline (half the streamed bytes per token).  Tests pin the
quantization error bound, the transparent forward dispatch, and decode
determinism under the int8 tree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.infer import greedy_generate
from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.models.quantized import (
    dequantize_kernel,
    quantize_lm_int8,
)
from ecg_byte_tpu.models.transformer import forward, init_params


def _tiny(arch="llama", **kw):
    config = tiny_test_config(arch, dtype="bfloat16", **kw)
    params = init_params(config, jax.random.PRNGKey(0))
    return config, params


def test_quantization_error_bound():
    config, params = _tiny()
    qparams = quantize_lm_int8(params, config)
    for name in ("q_proj", "o_proj", "up_proj", "down_proj"):
        w = np.asarray(params["layers"][name]["kernel"], np.float32)
        entry = qparams["layers"][name]
        assert "kernel" not in entry
        deq = np.asarray(
            dequantize_kernel(entry["kernel_q"], entry["kernel_scale"]),
            np.float32,
        )
        # per-output-channel symmetric: error <= scale/2 plus bf16
        # rounding of the scale and of the dequant product (~2^-8 each)
        scale = np.asarray(entry["kernel_scale"], np.float32)
        bound = scale * 0.51 + np.abs(w) * 2.0**-7 + 1e-6
        assert np.all(np.abs(deq - w) <= bound)


def test_int8_forward_close_and_head_quantized():
    config, params = _tiny()
    qparams = quantize_lm_int8(params, config)
    assert "lm_head_q" in qparams  # tied model: head quantized, embed exact
    np.testing.assert_array_equal(
        np.asarray(qparams["embed"]), np.asarray(params["embed"])
    )
    ids = np.arange(24, dtype=np.int32)[None] % config.vocab_size
    full = np.asarray(forward(params, config, jnp.asarray(ids)))
    quant = np.asarray(forward(qparams, config, jnp.asarray(ids)))
    # weight-only int8 stays close in logit space on a tiny random model
    denom = np.abs(full).max() + 1e-6
    assert np.abs(quant - full).max() / denom < 0.06


def test_int8_decode_runs_and_deterministic():
    config, params = _tiny()
    qparams = quantize_lm_int8(params, config)
    prompt = jnp.asarray(np.arange(16, dtype=np.int32)[None] % config.vocab_size)
    out1 = np.asarray(greedy_generate(qparams, config, prompt, max_new_tokens=8))
    out2 = np.asarray(greedy_generate(qparams, config, prompt, max_new_tokens=8))
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape[1] == 8  # greedy_generate returns the new tokens


def test_int8_untied_head_gpt2():
    config, params = _tiny("gpt2")
    config = config.replace(tie_word_embeddings=False)
    params = init_params(config, jax.random.PRNGKey(1))
    qparams = quantize_lm_int8(params, config)
    assert "lm_head" not in qparams and "lm_head_q" in qparams
    ids = np.arange(12, dtype=np.int32)[None] % config.vocab_size
    full = np.asarray(forward(params, config, jnp.asarray(ids)))
    quant = np.asarray(forward(qparams, config, jnp.asarray(ids)))
    denom = np.abs(full).max() + 1e-6
    assert np.abs(quant - full).max() / denom < 0.06
