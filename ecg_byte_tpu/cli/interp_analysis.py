"""Interpretability CLI: rebuild tokenizer + LoRA model, load a checkpoint,
run attention attribution (counterpart of ecg_byte/interp_analysis.py,
fixing its broken EGMTokenDataset import — the intended dataset is
ECGTokenDataset, SURVEY.md quirks)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ecg_byte_tpu.cli.common import build_model, set_seed
from ecg_byte_tpu.data import DataConfig, DataLoader, ECGTokenDataset
from ecg_byte_tpu.interpret import interpreter
from ecg_byte_tpu.models import transformer as T
from ecg_byte_tpu.tokenizer import load_vocab_and_merges
from ecg_byte_tpu.train import create_train_state
from ecg_byte_tpu.train.checkpoint import load_checkpoint
from ecg_byte_tpu.train.scheduler import make_optimizer


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--dataset', type=str, default='ptb_500')
    parser.add_argument('--model', type=str, default=None)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--dev', action='store_true')
    parser.add_argument('--checkpoint', type=str)
    parser.add_argument('--tokenizer_check', type=str)
    parser.add_argument('--num_merges', type=int, default=3500)
    parser.add_argument('--pad_to_max', type=int, default=1020)
    parser.add_argument('--percentiles', type=str, default=None)
    parser.add_argument('--interpret', action='store_true')
    parser.add_argument('--peft', action='store_true', default=True)
    parser.add_argument('--hf_weights', type=str, default=None)
    parser.add_argument('--data_root', type=str, default='./data')
    parser.add_argument('--seg_len', type=int, default=500)
    parser.add_argument('--max_plots', type=int, default=20)
    return parser.parse_args()


def main():
    args = get_args()
    set_seed(args.seed)
    vocab, merges = load_vocab_and_merges(
        os.path.join(args.data_root, f"{args.tokenizer_check}.pkl")
    )
    params, config, tokenizer = build_model(
        args.model, vocab, hf_weights=args.hf_weights
    )
    optimizer = make_optimizer(config.hidden_size, 500)
    state = create_train_state(
        config, optimizer, jax.random.PRNGKey(args.seed), peft=True, params=params
    )
    if args.checkpoint:
        ckpt_dir = f"./runs/{args.seed}/{args.checkpoint}"
        state, _ = load_checkpoint(ckpt_dir, "best_model", state)
        print(f"Loaded checkpoint from {ckpt_dir}")

    from ecg_byte_tpu.utils.file_utils import align_signal_text_files

    test_signals, test_texts = align_signal_text_files(
        f"{args.data_root}/{args.dataset}/ecg/test",
        f"{args.data_root}/{args.dataset}/text/test",
    )
    data_cfg = DataConfig(
        dataset=args.dataset, pad_to_max=args.pad_to_max,
        percentiles=args.percentiles, inference=False,
    )
    ds = ECGTokenDataset(
        test_signals, test_texts, vocab, merges, tokenizer=tokenizer, args=data_cfg
    )
    pad_id = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)
    loader = DataLoader(ds, batch_size=1, shuffle=False, pad_id=pad_id)

    # streaming layer+head mean: never materializes the (L, B, H, S, S)
    # stack the reference's eager capture OOMs on (interpret.py:53)
    @jax.jit
    def attn_fn(input_ids, attn_mask, position_ids):
        return T.mean_attention(
            state.full_params(), config, input_ids, attn_mask, position_ids,
            lora=state.lora(),
        )

    def forward_fn(batch):
        return attn_fn(
            np.asarray(batch["tokenized_signal"], np.int32),
            np.asarray(batch["attn_mask"], np.int32),
            np.asarray(batch["position_ids"], np.int32),
        )

    percentiles = ds.percentiles
    results = interpreter(
        forward_fn, loader, tokenizer, vocab, percentiles,
        signal_shape=(12, args.seg_len), dev=args.dev, max_plots=args.max_plots,
    )
    print(f"Interpreted {len(results['signal']['sequences'])} samples")
    return results


if __name__ == "__main__":
    main()
