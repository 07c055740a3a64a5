#!/bin/bash
# Token usage/length distributions (reference scripts/token_dist.sh)
python -m ecg_byte_tpu.cli.token_distribution \
    --tokenizer ./data/tokenizer_3500.pkl \
    --ecg_glob "./data/mimic_2500/ecg/test/*.npy" \
    --percentiles ./data/mimic_dataset_stats.npy
