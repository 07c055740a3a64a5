"""ECG-Byte-TPU: a TPU-native (JAX/XLA/Pallas) framework for ECG tokenization and
ECG-conditioned language modeling.

This is a from-scratch rebuild of the capabilities of willxxy/ECG-Byte
(arXiv:2412.14373) designed TPU-first:

- the signal preprocessing chain (notch/band-pass/high-pass filtfilt, wavelet
  denoise, cubic resample, segmentation, percentile quantization) is a set of
  fused, jittable XLA ops batched over leads and records (``ecg_byte_tpu.ops``);
- the byte-pair tokenizer keeps the reference's merge-learning semantics in a
  native C++ core (``csrc/ecgbpe.cpp``) and runs *encoding* as a parallel
  longest-match automaton on TPU (``ecg_byte_tpu.ops.bpe_encode``);
- the LLM stack (Llama-3.2 / Gemma / GPT-2 families) is a functional JAX
  transformer with LoRA overlays, Pallas flash-attention, and a jitted
  KV-cache decode path (``ecg_byte_tpu.models``, ``ecg_byte_tpu.infer``);
- distribution is expressed as shardings over a ``jax.sharding.Mesh``
  (``ecg_byte_tpu.parallel``) instead of DDP/NCCL process groups.
"""

__version__ = "0.1.0"
