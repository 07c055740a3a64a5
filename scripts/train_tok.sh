#!/bin/bash
# Canonical tokenizer training: 3500 merges over 200k sampled ECGs
# (reference scripts/train_tok.sh:4-9)
python -m ecg_byte_tpu.cli.train_tokenizer \
    --train \
    --num_merges 3500 \
    --sampled_files ./data/sampled_ecg_files_200000.txt \
    --num_processes 6 \
    --percentiles ./data/mimic_dataset_stats.npy
