"""CLI entry points preserving the reference's command surface:
train_tokenizer, main, pretrain, finetune, interp_analysis, preprocess_ecg,
sample_ecg, token_distribution, track_bpe_encoding."""
