#!/bin/bash
# Colored BPE span maps per lead (reference scripts/track_encoding.sh)
python -m ecg_byte_tpu.cli.track_bpe_encoding \
    --tokenizer ./data/tokenizer_3500.pkl \
    --ecg_file "$1" \
    --percentiles ./data/mimic_dataset_stats.npy
