"""Shared CLI plumbing: model construction, tokenizer setup, seeding."""

from __future__ import annotations

import os
import random
from typing import Optional

import jax
import numpy as np

from ecg_byte_tpu.data.text_tokenizer import (
    ByteTextTokenizer,
    load_text_tokenizer,
    register_ecg_tokens,
)
from ecg_byte_tpu.models import (
    TransformerConfig,
    gemma_2b,
    gpt2_xl,
    llama_3_2_1b,
    tiny_test_config,
)
from ecg_byte_tpu.models import transformer as T

_PRESETS = {
    "meta-llama/Llama-3.2-1B": llama_3_2_1b,
    "llama-3.2-1b": llama_3_2_1b,
    "google/gemma-2b": gemma_2b,
    "gemma-2b": gemma_2b,
    "openai-community/gpt2-xl": gpt2_xl,
    "gpt2-xl": gpt2_xl,
    "tiny-llama": lambda: tiny_test_config("llama", vocab_size=512),
    "small-llama": lambda: tiny_test_config(
        "llama", vocab_size=512, hidden_size=256, num_layers=4, num_heads=8,
        num_kv_heads=4, head_dim=32, intermediate_size=1024,
    ),
    "tiny-gpt2": lambda: tiny_test_config("gpt2", vocab_size=512),
    "tiny-gemma": lambda: tiny_test_config("gemma", vocab_size=512),
}


def set_seed(seed: int) -> None:
    """Reference seeding (main.py:92-95); jax PRNG keys derive from this."""
    random.seed(seed)
    np.random.seed(seed)


def build_model(
    model_name: str,
    vocab,
    *,
    hf_weights: Optional[str] = None,
    dtype: Optional[str] = None,
):
    """Construct (params, config, text_tokenizer) with ECG tokens registered.

    With ``hf_weights`` (a local HF model dir) the real checkpoint + HF
    tokenizer load; otherwise a preset config with random init and the
    self-contained byte tokenizer (zero-download mode).
    """
    if hf_weights:
        from ecg_byte_tpu.models.hf_loader import load_hf_checkpoint

        params, config = load_hf_checkpoint(hf_weights, dtype or "bfloat16")
        tokenizer = load_text_tokenizer(hf_weights)
    else:
        if model_name not in _PRESETS:
            raise ValueError(
                f"unknown model {model_name!r}; options: {sorted(_PRESETS)} "
                "or pass --hf_weights for a local checkpoint"
            )
        config = _PRESETS[model_name]()
        if dtype:
            config = config.replace(dtype=dtype)
        tokenizer = ByteTextTokenizer()
        params = None

    new_size = register_ecg_tokens(tokenizer, vocab)
    if params is None:
        config = config.replace(vocab_size=max(config.vocab_size, new_size))
        params = T.init_params(config, jax.random.PRNGKey(0))
    else:
        params, config = T.resize_embeddings(params, config, new_size)
    return params, config, tokenizer


def make_log_fn(args):
    """wandb logger gated on --log (reference project 'bpe-trans',
    main.py:96-98); returns None offline or when wandb is absent."""
    if not getattr(args, "log", False):
        return None
    try:
        import wandb

        wandb.init(project="bpe-trans", config=vars(args))
        return wandb.log
    except Exception as e:  # wandb missing or no egress
        print(f"--log disabled ({e})")
        return None


def make_run_dir(args) -> str:
    """Reference run-directory fingerprint (main.py:99): runs/<seed>/<cfg>."""
    cfg = (
        f"{args.model.replace('/', '-')}_{args.dataset}_{args.lr}_{args.beta1}_"
        f"{args.beta2}_{args.eps}_{args.weight_decay}_{args.warmup}_"
        f"{args.batch_size}_{args.epochs}_{args.num_merges}_{args.pad_to_max}_"
        f"{args.toy}"
    )
    return os.path.join("./runs", str(args.seed), cfg)
