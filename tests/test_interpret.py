"""Interpretability: component indices, attention expansion, full runner."""

import numpy as np
import jax

from ecg_byte_tpu.data import (
    ByteTextTokenizer,
    DataConfig,
    DataLoader,
    ECGTokenDataset,
    register_ecg_tokens,
)
from ecg_byte_tpu.interpret import (
    expand_attention,
    get_component_indices,
    interpreter,
)
from ecg_byte_tpu.models import tiny_test_config
from ecg_byte_tpu.models import transformer as T
from ecg_byte_tpu.ops.quantize import normalize_quantize, quantized_to_string
from ecg_byte_tpu.tokenizer import BpeTokenizer


def test_expand_attention():
    vocab = {0: "ab", 1: "c", 2: "abcd"}
    out = expand_attention([0, 1, 2], [0.5, 0.2, 0.1], vocab)
    assert out == [0.5, 0.5, 0.2, 0.1, 0.1, 0.1, 0.1]


def test_component_indices():
    tok = ByteTextTokenizer()
    tok.add_tokens(["<sig_start>", "<sig_end>"], special_tokens=True)
    tok.add_special_tokens({"pad_token": "<pad>"})
    ss = tok.convert_tokens_to_ids("<sig_start>")
    se = tok.convert_tokens_to_ids("<sig_end>")
    seq = [5, ss, 10, 11, se, 20, 21, 30, 31]
    labels = [-100, -100, -100, -100, -100, -100, -100, 30, 31]
    s, q, a = get_component_indices(seq, labels, tok)
    assert (s, q, a) == (2, 5, 7)


def test_interpreter_end_to_end(tmp_path):
    """Tiny model + toy dataset -> attribution maps with the right shapes."""
    import json

    rng = np.random.default_rng(0)
    (tmp_path / "ecg").mkdir()
    (tmp_path / "text").mkdir()
    sigs = []
    for i in range(3):
        s = (np.cumsum(rng.normal(size=(12, 50)), -1) * 0.05).astype(np.float32)
        np.save(tmp_path / "ecg" / f"ecg_{i}_0.npy", s)
        json.dump("Normal sinus rhythm.", open(tmp_path / "text" / f"text_{i}_0.json", "w"))
        sigs.append(s)
    stats = np.stack(sigs)
    percentiles = {
        "percentile_1": float(np.percentile(stats, 1)),
        "percentile_99": float(np.percentile(stats, 99)),
    }
    _, q = normalize_quantize(stats, percentiles["percentile_1"], percentiles["percentile_99"])
    corpus = "".join(quantized_to_string(np.asarray(qi)) for qi in q)
    bpe = BpeTokenizer.train(corpus, 60)
    tok = ByteTextTokenizer()
    register_ecg_tokens(tok, bpe.vocab)

    cfg = DataConfig(dataset="ptb_500", pad_to_max=420, percentiles=percentiles)
    sig_paths = [str(tmp_path / "ecg" / f"ecg_{i}_0.npy") for i in range(3)]
    txt_paths = [str(tmp_path / "text" / f"text_{i}_0.json") for i in range(3)]
    ds = ECGTokenDataset(sig_paths, txt_paths, bpe.vocab, bpe.merges,
                         tokenizer=tok, args=cfg)
    loader = DataLoader(ds, batch_size=1, pad_id=ds.pad_id, prefetch=False)

    config = tiny_test_config("llama", vocab_size=len(tok))
    params = T.init_params(config, jax.random.PRNGKey(0))

    def forward_fn(batch):
        ids = np.asarray(batch["tokenized_signal"], np.int32)
        mask = np.asarray(batch["attn_mask"], np.int32)
        pos = np.asarray(batch["position_ids"], np.int32)
        # streaming layer+head mean must match the eager stack exactly
        mean = T.mean_attention(params, config, ids, mask, pos)
        _, stack = T.forward(params, config, ids, mask, pos,
                             return_attentions=True)
        np.testing.assert_allclose(
            np.asarray(mean),
            np.asarray(stack, np.float32).mean(axis=(0, 2)),
            atol=2e-6,
        )
        return mean

    results = interpreter(
        forward_fn, loader, tok, bpe.vocab, percentiles,
        signal_shape=(12, 50), dev=True, max_plots=1,
        out_dir=str(tmp_path / "pngs"),
    )
    n = len(results["signal"]["sequences"])
    assert n == 3
    for k in ("signal", "question", "answer"):
        assert len(results[k]["attentions"]) == n
    # attribution plots written for the first sample
    import os
    pngs = os.listdir(tmp_path / "pngs")
    assert any(p.startswith("attn_sample0") for p in pngs)
    assert any(p.startswith("text_attn") for p in pngs)
    # decoded signal text round-trips through the vocab
    assert all(set(t) <= set("abcdefghijklmnopqrstuvwxyz")
               for t in results["signal"]["signal"])
