#!/bin/bash
# Stage-1 backbone pretraining (reference scripts/pretrain.sh; model in
# clip | vit | clip_vit | resnet)
python -m ecg_byte_tpu.cli.pretrain \
    --model "${1:-resnet}" \
    --dataset mimic_500 \
    --batch_size 64 \
    --epochs 20 \
    --warmup 500
