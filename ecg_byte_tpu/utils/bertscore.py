"""Offline BERTScore on the in-repo functional BERT.

The reference computes BERTScore through HF ``evaluate``
(ecg_byte/utils/model_utils.py:56-63), which downloads a scorer model —
impossible in a zero-egress environment.  This module computes the same
metric locally: point ``$ECG_BYTE_BERTSCORE_MODEL`` at any local HF BERT
checkpoint directory (config.json + *.safetensors + vocab.txt) and
``score`` follows the BERTScore paper (Zhang et al., ICLR 2020):

1. embed candidate and reference with BERT, taking hidden layer
   ``$ECG_BYTE_BERTSCORE_LAYER`` (default: the bert_score library's tuned
   layer 9 for 12-layer BERTs, else the last layer);
2. L2-normalize token embeddings; cosine similarity is then a dot product;
3. greedy matching — recall averages each reference token's best match in
   the candidate, precision each candidate token's best match in the
   reference; F1 is their harmonic mean.  [CLS]/[SEP] carry zero weight in
   the averages (the bert_score convention when idf is off) but remain
   available as match targets.

No idf weighting and no baseline rescaling, matching the reference's
defaults (``evaluate``'s bertscore with ``lang="en"`` reports raw scores).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

MODEL_ENV = "ECG_BYTE_BERTSCORE_MODEL"
LAYER_ENV = "ECG_BYTE_BERTSCORE_LAYER"


def _default_layer(num_layers: int) -> int:
    # bert_score's tuned layer for bert-base-uncased (12 layers) is 9;
    # for other depths fall back to the final layer.
    return 9 if num_layers == 12 else num_layers


class LocalBertScorer:
    """BERTScore P/R/F1 against a local BERT checkpoint directory."""

    def __init__(self, model_dir: str, layer: Optional[int] = None,
                 max_len: int = 512, batch_size: int = 32):
        import jax

        from ecg_byte_tpu.models.bert import bert_forward, load_hf_bert
        from ecg_byte_tpu.tokenizer.wordpiece import WordPieceTokenizer

        self.params, self.config = load_hf_bert(model_dir)
        vocab_file = os.path.join(model_dir, "vocab.txt")
        lower = self._lower_case(model_dir)
        self.tokenizer = WordPieceTokenizer(vocab_file, lower_case=lower)
        self.layer = layer if layer is not None else _default_layer(
            self.config.num_layers
        )
        if not 0 <= self.layer <= self.config.num_layers:
            raise ValueError(
                f"layer {self.layer} out of range for a "
                f"{self.config.num_layers}-layer checkpoint"
            )
        self.max_len = min(max_len, self.config.max_position_embeddings)
        self.batch_size = batch_size

        import jax.numpy as jnp

        layer_idx = self.layer

        @jax.jit
        def embed(ids, mask):
            hs, _ = bert_forward(
                self.params, self.config, ids, mask, return_all_layers=True
            )
            h = hs[layer_idx].astype(jnp.float32)
            return h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12
            )

        self._embed = embed

    @staticmethod
    def _lower_case(model_dir: str) -> bool:
        import json

        try:
            with open(os.path.join(model_dir, "tokenizer_config.json")) as f:
                return bool(json.load(f).get("do_lower_case", True))
        except (OSError, ValueError):
            return True

    def _encode_batch(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        seqs = [self.tokenizer.encode(t, max_len=self.max_len) for t in texts]
        width = max(len(s) for s in seqs)
        ids = np.full((len(seqs), width), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((len(seqs), width), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return ids, mask

    def _embeddings(self, texts: List[str]):
        """Yield (emb (S, H) f32 normalized, weight (S,) f32) per text."""
        for start in range(0, len(texts), self.batch_size):
            chunk = texts[start : start + self.batch_size]
            ids, mask = self._encode_batch(chunk)
            h = np.asarray(self._embed(ids, mask))
            for row in range(len(chunk)):
                n = int(mask[row].sum())
                emb = h[row, :n]
                w = np.ones(n, np.float32)
                w[0] = 0.0   # [CLS]
                w[n - 1] = 0.0  # [SEP]
                yield emb, w

    def score(self, references: List[str], candidates: List[str]) -> Dict[str, List[float]]:
        """Per-pair precision/recall/F1 (bert_score output convention)."""
        ref_embs = list(self._embeddings(references))
        cand_embs = list(self._embeddings(candidates))
        precision, recall, f1 = [], [], []
        for (re_, rw), (ce, cw) in zip(ref_embs, cand_embs):
            sim = ce @ re_.T  # (n_cand, n_ref) cosine (rows are normalized)
            if cw.sum() == 0 or rw.sum() == 0:
                precision.append(0.0); recall.append(0.0); f1.append(0.0)
                continue
            p = float((sim.max(axis=1) * cw).sum() / cw.sum())
            r = float((sim.max(axis=0) * rw).sum() / rw.sum())
            f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
            precision.append(p); recall.append(r); f1.append(f)
        return {"precision": precision, "recall": recall, "f1": f1}


@functools.lru_cache(maxsize=2)
def _cached_scorer(model_dir: str, layer: Optional[int]) -> LocalBertScorer:
    return LocalBertScorer(model_dir, layer)


def local_scorer_from_env() -> Optional[LocalBertScorer]:
    """Scorer configured by $ECG_BYTE_BERTSCORE_MODEL, or None."""
    model_dir = os.environ.get(MODEL_ENV)
    if not model_dir or not os.path.isdir(model_dir):
        return None
    layer_s = os.environ.get(LAYER_ENV)
    layer = int(layer_s) if layer_s else None
    return _cached_scorer(model_dir, layer)
