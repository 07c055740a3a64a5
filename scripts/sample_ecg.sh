#!/bin/bash
# Morphology-stratified sampling for tokenizer training (reference scripts/sample_ecg.sh)
python -m ecg_byte_tpu.cli.sample_ecg \
    --ecg_dir ./data/mimic_2500/ecg/train \
    --num_samples 200000 \
    --max_clusters 100 \
    --subset_size 10000
