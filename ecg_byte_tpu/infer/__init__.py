"""Inference: jitted KV-cache greedy decoding + text-generation evaluation."""

from ecg_byte_tpu.infer.decode import greedy_generate, GenerateConfig  # noqa: F401
