"""Logit-parity oracle vs genuine HuggingFace implementations (torch CPU).

The reference's whole point of vendoring transformers is exact HF semantics
(SURVEY.md: transformers/ pin).  These tests build tiny random HF models,
save real safetensors checkpoints, ingest them through our loader, and
require forward logits to match the torch forward pass to <=1e-3.

Critically, the Llama case carries rope_scaling rope_type="llama3" (the
Llama-3.2 config), exercising the wavelength-banded inv_freq rescale of the
reference fork's modeling_rope_utils.py:310-350 at every position.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from ecg_byte_tpu.models import transformer as T  # noqa: E402
from ecg_byte_tpu.models.hf_loader import load_hf_checkpoint  # noqa: E402


def _save(model, tmp_path):
    model.eval()
    d = str(tmp_path / "hf_model")
    model.save_pretrained(d, safe_serialization=True)
    return d


def _our_logits(model_dir, ids, mask=None, position_ids=None):
    params, config = load_hf_checkpoint(model_dir, dtype="float32")
    out = T.forward(
        params, config,
        jnp.asarray(ids, jnp.int32),
        None if mask is None else jnp.asarray(mask, jnp.int32),
        None if position_ids is None else jnp.asarray(position_ids, jnp.int32),
        remat=False,
    )
    return np.asarray(out)


def _hf_logits(model, ids, mask=None, position_ids=None):
    with torch.no_grad():
        out = model(
            input_ids=torch.asarray(np.asarray(ids), dtype=torch.long),
            attention_mask=None if mask is None
            else torch.asarray(np.asarray(mask), dtype=torch.long),
            position_ids=None if position_ids is None
            else torch.asarray(np.asarray(position_ids), dtype=torch.long),
        )
    return out.logits.float().numpy()


def _assert_close(ours, hf, tol=1e-3):
    np.testing.assert_allclose(ours, hf, atol=tol, rtol=tol)


def _ids(vocab, b=2, s=12, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, vocab, size=(b, s)).astype(np.int64)


def test_llama32_rope_scaling_logit_parity(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=500.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16,
        },
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = _save(model, tmp_path)
    ids = _ids(64)
    _assert_close(_our_logits(d, ids), _hf_logits(model, ids))


def test_llama32_rope_scaling_matters(tmp_path):
    """Guard against the rescale silently not being applied: the same
    checkpoint interpreted WITHOUT rope_scaling must give different logits."""
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=500.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 16,
        },
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    d = _save(model, tmp_path)
    ids = _ids(64)
    params, config = load_hf_checkpoint(d, dtype="float32")
    assert config.rope_scaling_type == "llama3"
    scaled = T.forward(params, config, jnp.asarray(ids, jnp.int32), remat=False)
    plain = T.forward(
        params, config.replace(rope_scaling_type=None),
        jnp.asarray(ids, jnp.int32), remat=False,
    )
    assert np.abs(np.asarray(scaled) - np.asarray(plain)).max() > 1e-3


def test_llama_left_padded_parity(tmp_path):
    """Left-pad + explicit position_ids — the packing the datasets emit."""
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(cfg)
    d = _save(model, tmp_path)
    ids = _ids(64, b=2, s=10, seed=1)
    mask = np.ones((2, 10), np.int64)
    mask[0, :3] = 0
    mask[1, :1] = 0
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0)
    ours = _our_logits(d, ids, mask, pos)
    hf = _hf_logits(model, ids, mask, pos)
    # padded rows attend to nothing real; compare valid positions only
    for b in range(2):
        valid = mask[b] == 1
        _assert_close(ours[b][valid], hf[b][valid])


def test_gpt2_logit_parity(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = transformers.GPT2LMHeadModel(cfg)
    d = _save(model, tmp_path)
    ids = _ids(96, seed=2)
    _assert_close(_our_logits(d, ids), _hf_logits(model, ids))


def test_gemma_logit_parity(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=8, max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = transformers.GemmaForCausalLM(cfg)
    d = _save(model, tmp_path)
    ids = _ids(128, seed=3)
    _assert_close(_our_logits(d, ids), _hf_logits(model, ids))
