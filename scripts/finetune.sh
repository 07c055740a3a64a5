#!/bin/bash
# Stage-2 LLM finetuning on a frozen stage-1 backbone
# (reference scripts/finetune.sh; model in *_model)
python -m ecg_byte_tpu.cli.finetune \
    --model "${1:-resnet_model}" \
    --llm llama-3.2-1b \
    --hf_weights ./checkpoints/Llama-3.2-1B \
    --dataset mimic_500 \
    --pad_to_max 1022 \
    --batch_size 8 \
    --epochs 1 \
    --percentiles ./data/mimic_dataset_stats.npy \
    --first_check "$2"
