"""BPE segment-span visualization CLI (analysis/track_bpe_encoding.py).

Colors each BPE token's symbol span over the signal per lead.  Unlike the
reference (whose merge-replay no-ops on rust-format merges), spans come
straight from the greedy encoding."""

from __future__ import annotations

import argparse

import numpy as np

from ecg_byte_tpu.tokenizer import load_vocab_and_merges
from ecg_byte_tpu.tokenizer.analysis import quantize_file, track_encoding
from ecg_byte_tpu.utils.viz_utils import plot_bpe_segments


def get_args():
    parser = argparse.ArgumentParser(description=None)
    parser.add_argument('--tokenizer', type=str, required=True)
    parser.add_argument('--ecg_file', type=str, required=True)
    parser.add_argument('--percentiles', type=str, required=True)
    parser.add_argument('--leads', type=int, nargs='+', default=list(range(12)))
    parser.add_argument('--out_dir', type=str, default='./pngs')
    return parser.parse_args()


def main():
    args = get_args()
    _, merges = load_vocab_and_merges(args.tokenizer)
    percentiles = np.load(args.percentiles, allow_pickle=True).item()
    signal = np.load(args.ecg_file)
    text = quantize_file(args.ecg_file, percentiles)
    ids, segment_map = track_encoding(text, merges)
    print(f"{len(text)} symbols -> {len(ids)} tokens "
          f"({len(text) / max(len(ids), 1):.2f}x)")
    seg_len = signal.shape[-1]
    for lead in args.leads:
        plot_bpe_segments(signal, segment_map, lead, seg_len, args.out_dir)
    print(f"Plots written to {args.out_dir}")


if __name__ == "__main__":
    main()
