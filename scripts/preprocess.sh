#!/bin/bash
# Canonical preprocessing run (reference scripts/preprocess.sh parameters)
python -m ecg_byte_tpu.cli.preprocess_ecg \
    --data mimic \
    --seg_len 2500 \
    --instances_json ./data/mimic_instances.json \
    --batch_size 64
