#!/bin/bash
# Canonical end-to-end training: Llama-3.2-1B, LoRA, pad_to_max 1020
# (reference scripts/train_model.sh:5-17; --dis shards over all local chips)
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
    --warmup 500 \
    --peft \
    --dis
