"""Data subsystem: datasets, loaders, tokenizer glue, preprocessing.

TPU-native counterpart of the reference's data_loader.py +
utils/preprocess_utils.py: packing semantics are byte-exact with the
reference datasets, while the heavy signal math (filter chain, wavelet
denoise, resample, quantize, BPE encode) runs batched on device.
"""

from ecg_byte_tpu.data.datasets import DataConfig, ECGTokenDataset
from ecg_byte_tpu.data.loader import DataLoader, collate
from ecg_byte_tpu.data.text_tokenizer import (
    ByteTextTokenizer,
    load_text_tokenizer,
    register_ecg_tokens,
)
from ecg_byte_tpu.data.two_stage import (
    ECGCLIPFinetune,
    ECGCLIPPretrain,
    TwoStageConfig,
)

__all__ = [
    "ByteTextTokenizer",
    "DataConfig",
    "DataLoader",
    "ECGCLIPFinetune",
    "ECGCLIPPretrain",
    "ECGTokenDataset",
    "TwoStageConfig",
    "collate",
    "load_text_tokenizer",
    "register_ecg_tokens",
]
