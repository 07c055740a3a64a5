"""Plot utilities (matplotlib artifacts matching the reference's outputs).

Mirrors ecg_byte/utils/viz_utils.py: train/val loss curves, original vs
decoded signal overlays, attention-over-signal maps, text-token attention
bars, token distribution plots, and colored BPE segment maps.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def plot_train_val_loss(train_loss, val_loss, directory_path: str) -> None:
    _ensure_dir(directory_path)
    plt.figure(figsize=(8, 5))
    plt.plot(train_loss, label="train")
    plt.plot(val_loss, label="val")
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.legend()
    plt.title("Training and validation loss")
    plt.tight_layout()
    plt.savefig(os.path.join(directory_path, "train_val_loss.png"))
    plt.close()


def plot_original_vs_decoded(
    decoded_signal: np.ndarray,
    original_array: np.ndarray,
    lead_index: int = 0,
    out_dir: str = "./pngs",
) -> None:
    _ensure_dir(out_dir)
    plt.figure(figsize=(12, 4))
    plt.plot(original_array[lead_index], label="original", alpha=0.8)
    plt.plot(decoded_signal[lead_index], label="decoded", alpha=0.8)
    plt.legend()
    plt.title(f"Original vs decoded, lead {lead_index}")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "original_vs_decoded.png"))
    plt.close()


def plot_attention_on_signal(
    signal: np.ndarray,
    attention_array: np.ndarray,
    lead_index: int,
    sample_count: int,
    out_dir: str = "./pngs/attention",
) -> None:
    """Signal trace with attention weight filled underneath (twinx)."""
    _ensure_dir(out_dir)
    fig, ax1 = plt.subplots(figsize=(12, 4))
    ax1.plot(signal[lead_index], color="tab:blue", lw=0.8)
    ax1.set_ylabel("amplitude")
    ax2 = ax1.twinx()
    att = attention_array[lead_index]
    ax2.fill_between(np.arange(len(att)), att, color="tab:red", alpha=0.3)
    ax2.set_ylabel("attention")
    plt.title(f"Attention over signal, lead {lead_index}, sample {sample_count}")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, f"attn_sample{sample_count}_lead{lead_index}.png"))
    plt.close()


def plot_text_attention_weights(
    tokens: Sequence[str],
    attention: np.ndarray,
    sample_count: int,
    out_dir: str = "./pngs/attention",
) -> None:
    _ensure_dir(out_dir)
    n = min(len(tokens), len(attention))
    plt.figure(figsize=(max(6, n * 0.4), 4))
    plt.bar(range(n), attention[:n])
    plt.xticks(range(n), tokens[:n], rotation=90, fontsize=6)
    plt.ylabel("attention")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, f"text_attn_sample{sample_count}.png"))
    plt.close()


def plot_token_rank_frequency(token_counts: Dict[int, int], out_dir: str = "./pngs") -> None:
    _ensure_dir(out_dir)
    freqs = sorted(token_counts.values(), reverse=True)
    plt.figure(figsize=(6, 4))
    plt.loglog(np.arange(1, len(freqs) + 1), freqs)
    plt.xlabel("rank")
    plt.ylabel("frequency")
    plt.title("Token rank-frequency")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "token_rank_frequency.png"))
    plt.close()


def plot_token_length_distribution(token_lengths: Sequence[int], out_dir: str = "./pngs") -> None:
    _ensure_dir(out_dir)
    plt.figure(figsize=(6, 4))
    plt.hist(token_lengths, bins=50)
    plt.xlabel("tokens per ECG")
    plt.ylabel("count")
    plt.title("Encoded length distribution")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, "token_length_distribution.png"))
    plt.close()


def plot_bpe_segments(
    signal: np.ndarray,
    segment_map: Sequence,
    lead_index: int,
    seg_len: int,
    out_dir: str = "./pngs",
) -> None:
    """Colored spans showing which samples each BPE token covers."""
    _ensure_dir(out_dir)
    plt.figure(figsize=(12, 4))
    lead = signal[lead_index]
    plt.plot(lead, color="black", lw=0.6)
    cmap = plt.get_cmap("tab20")
    lead_start = lead_index * seg_len
    lead_end = lead_start + seg_len
    for i, (start, end) in enumerate(segment_map):
        s = max(start, lead_start) - lead_start
        e = min(end, lead_end) - lead_start
        if e <= 0 or s >= seg_len or e <= s:
            continue
        plt.axvspan(s, e, color=cmap(i % 20), alpha=0.25)
    plt.title(f"BPE token spans, lead {lead_index}")
    plt.tight_layout()
    plt.savefig(os.path.join(out_dir, f"bpe_segments_lead{lead_index}.png"))
    plt.close()
