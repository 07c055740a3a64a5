#!/bin/bash
# Attention attribution over the test split (reference scripts/interpret.sh)
python -m ecg_byte_tpu.cli.interp_analysis \
    --model llama-3.2-1b \
    --hf_weights ./checkpoints/Llama-3.2-1B \
    --dataset mimic_500 \
    --tokenizer_check tokenizer_3500 \
    --percentiles ./data/mimic_dataset_stats.npy \
    --pad_to_max 1020 \
    --interpret \
    --checkpoint "$1"
