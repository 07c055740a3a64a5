"""TPU-native signal + tokenizer ops (JAX/XLA/Pallas)."""

from ecg_byte_tpu.ops.quantize import (  # noqa: F401
    ALPHABET,
    normalize_quantize,
    quantized_to_string,
    string_to_quantized,
    reverse_normalize,
)
