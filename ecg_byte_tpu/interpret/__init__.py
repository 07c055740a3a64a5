"""Attention-based interpretability: token -> signal-region attribution."""

from ecg_byte_tpu.interpret.attention_maps import (  # noqa: F401
    expand_attention,
    get_component_indices,
    interpreter,
)
