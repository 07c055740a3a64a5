"""Functional JAX model zoo: Llama-3.2 / Gemma / GPT-2 families, LoRA,
signal encoders (1-D ResNet, CLIP/ViT) and ECG+LLM fusion wrappers."""

from ecg_byte_tpu.models.config import (  # noqa: F401
    TransformerConfig,
    llama_3_2_1b,
    gemma_2b,
    gpt2_xl,
    tiny_test_config,
)
from ecg_byte_tpu.models.quantized import (  # noqa: F401
    dequantize_kernel,
    quantize_lm_int8,
)
