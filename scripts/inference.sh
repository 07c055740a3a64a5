#!/bin/bash
# 5-seed evaluation (reference scripts/inference.sh)
python -m ecg_byte_tpu.cli.main \
    --model llama-3.2-1b \
    --hf_weights ./checkpoints/Llama-3.2-1B \
    --dataset mimic_500 \
    --tokenizer_check tokenizer_3500 \
    --num_merges 3500 \
    --percentiles ./data/mimic_dataset_stats.npy \
    --pad_to_max 1020 \
    --batch_size 8 \
    --epochs 1 \
    --peft \
    --inference \
    --checkpoint "$1"
