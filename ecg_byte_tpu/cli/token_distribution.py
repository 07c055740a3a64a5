"""Token usage/length distribution CLI (analysis/token_distribution.py)."""

from __future__ import annotations

import argparse
import glob

import numpy as np

from ecg_byte_tpu.tokenizer import load_vocab_and_merges
from ecg_byte_tpu.tokenizer.analysis import analyze_token_distribution
from ecg_byte_tpu.utils.viz_utils import (
    plot_token_length_distribution,
    plot_token_rank_frequency,
)


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--tokenizer', type=str, required=True,
                        help='path to tokenizer .pkl')
    parser.add_argument('--ecg_glob', type=str, required=True,
                        help='glob of ECG .npy files')
    parser.add_argument('--percentiles', type=str, required=True)
    parser.add_argument('--num_workers', type=int, default=4)
    parser.add_argument('--limit', type=int, default=None)
    parser.add_argument('--out_dir', type=str, default='./pngs')
    return parser.parse_args()


def main():
    args = get_args()
    _, merges = load_vocab_and_merges(args.tokenizer)
    percentiles = np.load(args.percentiles, allow_pickle=True).item()
    paths = sorted(glob.glob(args.ecg_glob))
    if args.limit:
        paths = paths[: args.limit]
    print(f"Analyzing {len(paths)} ECGs")
    counts, lengths = analyze_token_distribution(
        paths, merges, percentiles, args.num_workers
    )
    print(f"Distinct tokens used: {len(counts)}")
    print(f"Mean encoded length: {np.mean(lengths):.1f} "
          f"(min {min(lengths)}, max {max(lengths)})")
    plot_token_rank_frequency(counts, args.out_dir)
    plot_token_length_distribution(lengths, args.out_dir)
    print(f"Plots written to {args.out_dir}")


if __name__ == "__main__":
    main()
