"""Oracle tests: JAX Marian port vs HF ``MarianMTModel`` (torch, tests-only).

Mirrors tests/test_hf_parity.py's approach for the causal LMs: a tiny
random Marian checkpoint is saved to safetensors, loaded by
models/marian.py, and forward logits + greedy generation are compared.
Reference role replaced: the opus-mt-de-en translation batch
(/root/reference/ecg_byte/utils/preprocess_utils.py:664-713).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ecg_byte_tpu.models import marian  # noqa: E402

VOCAB = 97
PAD, EOS = 96, 0


@pytest.fixture(scope="module")
def hf_marian(tmp_path_factory):
    cfg = transformers.MarianConfig(
        vocab_size=VOCAB, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        activation_function="swish", max_position_embeddings=64,
        pad_token_id=PAD, eos_token_id=EOS, decoder_start_token_id=PAD,
        scale_embedding=True, share_encoder_decoder_embeddings=True,
        static_position_embeddings=True,
        bad_words_ids=[[PAD]], forced_eos_token_id=None,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.MarianMTModel(cfg).eval()
    d = tmp_path_factory.mktemp("marian_ckpt")
    model.save_pretrained(str(d), safe_serialization=True)
    json.dump(cfg.to_dict(), open(d / "config.json", "w"))
    return d, model, cfg


def _batch(rng, b=3, s=9):
    src = rng.integers(1, VOCAB - 1, size=(b, s)).astype(np.int64)
    mask = np.ones((b, s), np.int64)
    # right-pad one row to exercise the encoder/cross masks
    src[1, -3:] = PAD
    mask[1, -3:] = 0
    return src, mask


def test_forward_logits_match(hf_marian):
    d, model, _cfg = hf_marian
    params, config = marian.load_hf_marian(str(d))
    rng = np.random.default_rng(0)
    src, mask = _batch(rng)
    tgt = rng.integers(1, VOCAB - 1, size=(3, 7)).astype(np.int64)
    with torch.no_grad():
        want = model(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(mask),
            decoder_input_ids=torch.tensor(tgt),
        ).logits.numpy()
    got = np.asarray(marian.forward(params, config, src, mask, tgt))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_greedy_generate_matches(hf_marian):
    d, model, _cfg = hf_marian
    params, config = marian.load_hf_marian(str(d))
    rng = np.random.default_rng(1)
    src, mask = _batch(rng, b=4, s=8)
    with torch.no_grad():
        want = model.generate(
            input_ids=torch.tensor(src), attention_mask=torch.tensor(mask),
            max_length=16, num_beams=1, do_sample=False,
        ).numpy()
    got = np.asarray(marian.greedy_generate(params, config, src, mask,
                                            max_length=16))
    for row_w, row_g in zip(want, got):
        # compare up to and including eos; HF pads after, we pad after
        w = list(row_w)
        g = list(row_g)
        if EOS in w:
            w = w[: w.index(EOS) + 1]
        if EOS in g:
            g = g[: g.index(EOS) + 1]
        assert g == w


def test_translate_reports_torch_free(hf_marian, tmp_path, monkeypatch):
    """data/preprocess.py translation path runs without torch/transformers:
    local checkpoint + native sentencepiece segmentation + vocab.json."""
    from ecg_byte_tpu.data.preprocess import translate_reports
    from ecg_byte_tpu.tokenizer import sp_model

    d, _model, _cfg = hf_marian
    # a tiny handmade sentencepiece unigram model + Marian vocab.json
    pieces = [("<unk>", 0.0), ("▁", -2.0)]
    pieces += [(f"▁{w}", -1.0) for w in
               ("der", "die", "das", "herz", "normal", "sinus")]
    pieces += [(c, -3.0) for c in "abcdefghijklmnopqrstuvwxyz"]
    sp_model.write_spm(str(d / "source.spm"), pieces)
    vocab = {"<pad>": PAD, "</s>": EOS, "<unk>": 1}
    nid = 2
    for p, _ in pieces:
        if p not in vocab:
            vocab[p] = nid
            nid += 1
    json.dump(vocab, open(d / "vocab.json", "w"))

    out = translate_reports(
        np.asarray(["der herz normal", "", "sinus das"], dtype=object),
        model_dir=str(d),
    )
    assert out.shape == (3,)
    assert out[1] == ""
    assert isinstance(out[0], str)
