"""Oracle tests: native HF tokenizer vs the real ``tokenizers`` pipeline.

The native reader (tokenizer/hf_text.py) must be byte-exact with the
HuggingFace fast tokenizer on every id for the three reference backbone
classes (GPT-2 byte-level, Llama-3 split+byte-level with ignore_merges,
Llama-2/Gemma sentencepiece-BPE with byte_fallback), including the ECG
token registration flow (main.py:144-151 semantics).  ``tokenizers`` /
``transformers`` appear ONLY here as oracles — the package itself never
imports them.
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import (  # noqa: E402
    AddedToken, Regex, Tokenizer, decoders, models, normalizers,
    pre_tokenizers, processors, trainers,
)

from ecg_byte_tpu.data.text_tokenizer import register_ecg_tokens  # noqa: E402
from ecg_byte_tpu.tokenizer.hf_text import HFTextTokenizer  # noqa: E402

LLAMA3_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "Hello World!",
    "  leading and trailing  ",
    "don't stop, it's 1234 tokens (really 56789)...",
    "What is the heart rate?   Answer: 72 bpm.",
    "Ünïcödé — ßtraße 🫀 ecg",
    "line\nbreaks\r\n\ttabs",
    "",
    "a",
    "signal_12 is plain text here",
]


@pytest.fixture(scope="module")
def corpus():
    return [
        "the quick brown fox jumps over the lazy dog",
        "hello world, Hello World!",
        "ecg signals 123 456 heart rate rhythm",
        "aaabdaaabac the theme thesis",
        "don't it's we've I'll wasn't",
        "What is the answer? The answer is 42.",
    ] * 20


def _train_bpe(corpus, vocab_size=400, byte_level=True):
    tok = Tokenizer(models.BPE())
    if byte_level:
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        alphabet = pre_tokenizers.ByteLevel.alphabet()
    else:
        alphabet = sorted({c for line in corpus for c in line} | {"▁"})
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<|endoftext|>"],
        initial_alphabet=alphabet, show_progress=False,
    )
    tok.train_from_iterator(corpus, trainer)
    return tok


@pytest.fixture(scope="module")
def gpt2_style(tmp_path_factory, corpus):
    tok = _train_bpe(corpus)
    tok.decoder = decoders.ByteLevel()
    tok.post_processor = processors.ByteLevel(trim_offsets=True)
    path = tmp_path_factory.mktemp("tok") / "gpt2_style.json"
    tok.save(str(path))
    return path, tok


@pytest.fixture(scope="module")
def llama3_style(tmp_path_factory, corpus):
    base = _train_bpe(corpus)
    spec = json.loads(base.to_str())
    tok = Tokenizer(
        models.BPE(
            vocab=spec["model"]["vocab"],
            merges=[tuple(m) for m in spec["model"]["merges"]],
            ignore_merges=True,
        )
    )
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(LLAMA3_PAT), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    tok.add_special_tokens([
        AddedToken("<|begin_of_text|>", special=True),
        AddedToken("<|end_of_text|>", special=True),
    ])
    bos_id = tok.token_to_id("<|begin_of_text|>")
    tok.post_processor = processors.TemplateProcessing(
        single="<|begin_of_text|> $A",
        special_tokens=[("<|begin_of_text|>", bos_id)],
    )
    path = tmp_path_factory.mktemp("tok") / "llama3_style.json"
    tok.save(str(path))
    return path, tok


@pytest.fixture(scope="module")
def llama2_style(tmp_path_factory, corpus):
    """Sentencepiece-BPE export shape: Prepend/Replace normalizer, no
    pre-tokenizer, byte_fallback, Sequence decoder."""
    # character-level BPE over ▁-marked words, plus <0xNN> fallback tokens
    words = sorted({w for line in corpus for w in line.split()})
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = len(vocab)
    chars = sorted({c for w in words for c in w} | {"▁"})
    for c in chars:
        vocab.setdefault(c, len(vocab))
    # a few handmade merges (rank order matters)
    merges = []
    for pair in [("▁", "t"), ("t", "h"), ("▁t", "he"), ("h", "e"),
                 ("e", "r"), ("a", "n"), ("▁", "a"), ("i", "s"),
                 ("▁a", "n"), ("▁", "is"), ("r", "s")]:
        merged = pair[0] + pair[1]
        if pair[0] in vocab and pair[1] in vocab:
            vocab.setdefault(merged, len(vocab))
            merges.append(pair)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, unk_token="<unk>",
                               byte_fallback=True, fuse_unk=True))
    tok.normalizer = normalizers.Sequence([
        normalizers.Prepend("▁"),
        normalizers.Replace(" ", "▁"),
    ])
    tok.decoder = decoders.Sequence([
        decoders.Replace("▁", " "),
        decoders.ByteFallback(),
        decoders.Fuse(),
        decoders.Strip(content=" ", left=1),
    ])
    tok.add_special_tokens([AddedToken("<s>", special=True),
                            AddedToken("</s>", special=True)])
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", special_tokens=[("<s>", 1)],
    )
    path = tmp_path_factory.mktemp("tok") / "llama2_style.json"
    tok.save(str(path))
    return path, tok


ALL_STYLES = ["gpt2_style", "llama3_style", "llama2_style"]


@pytest.mark.parametrize("style", ALL_STYLES)
@pytest.mark.parametrize("specials", [False, True])
def test_encode_matches_oracle(style, specials, request):
    path, oracle = request.getfixturevalue(style)
    mine = HFTextTokenizer.from_pretrained(str(path))
    for text in TEXTS:
        want = oracle.encode(text, add_special_tokens=specials).ids
        got = mine.encode(text, add_special_tokens=specials)
        assert got == want, (style, specials, text)


@pytest.mark.parametrize("style", ALL_STYLES)
def test_decode_matches_oracle(style, request):
    path, oracle = request.getfixturevalue(style)
    mine = HFTextTokenizer.from_pretrained(str(path))
    for text in TEXTS:
        ids = oracle.encode(text, add_special_tokens=True).ids
        for skip in (False, True):
            assert mine.decode(ids, skip_special_tokens=skip) == oracle.decode(
                ids, skip_special_tokens=skip
            ), (style, skip, text)


@pytest.mark.parametrize("style", ALL_STYLES)
def test_ecg_token_registration_matches_oracle(style, request):
    """register_ecg_tokens parity: signal_* as plain added tokens, span
    markers + pad as specials; mixed text round-trips byte-exactly."""
    path, _ = request.getfixturevalue(style)
    mine = HFTextTokenizer.from_pretrained(str(path))
    oracle = Tokenizer.from_file(str(path))

    vocab = {str(i): "x" for i in range(40)}
    n_mine = register_ecg_tokens(mine, vocab)
    oracle.add_tokens([f"signal_{i}" for i in sorted(map(int, vocab))])
    oracle.add_special_tokens([
        AddedToken("<sig_start>", special=True),
        AddedToken("<sig_end>", special=True),
        AddedToken("<pad>", special=True),
    ])
    assert n_mine == oracle.get_vocab_size(with_added_tokens=True)
    assert mine.pad_token == "<pad>"
    assert mine.pad_token_id == oracle.token_to_id("<pad>")

    mixed = [
        "<sig_start>signal_0signal_12signal_39<sig_end>What rhythm is shown?",
        "plain text then signal_7 inline",
        "signal_1signal_1signal_1",
        "<pad><pad>answer",
    ]
    for text in mixed:
        want = oracle.encode(text, add_special_tokens=False).ids
        got = mine.encode(text, add_special_tokens=False)
        assert got == want, text
        for skip in (False, True):
            assert mine.decode(want, skip_special_tokens=skip) == oracle.decode(
                want, skip_special_tokens=skip
            ), (text, skip)


def test_slow_gpt2_format(tmp_path, corpus, gpt2_style):
    """vocab.json + merges.txt loading matches the fast pipeline."""
    _, oracle = gpt2_style
    spec = json.loads(oracle.to_str())
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(spec["model"]["vocab"], f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in spec["model"]["merges"]:
            f.write(f"{a} {b}\n")
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({"bos_token": "<|endoftext|>", "eos_token": "<|endoftext|>"}, f)
    mine = HFTextTokenizer.from_pretrained(str(tmp_path))
    for text in TEXTS:
        assert mine.encode(text, add_special_tokens=False) == oracle.encode(
            text, add_special_tokens=False
        ).ids, text
    assert mine.eos_token == "<|endoftext|>"


def test_transformers_level_surface(llama3_style, tmp_path):
    """The __call__/pad/np-tensor surface matches PreTrainedTokenizerFast."""
    transformers = pytest.importorskip("transformers")
    path, _ = llama3_style
    import shutil

    shutil.copy(path, tmp_path / "tokenizer.json")
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({
            "bos_token": "<|begin_of_text|>", "eos_token": "<|end_of_text|>",
            "tokenizer_class": "PreTrainedTokenizerFast",
        }, f)
    hf = transformers.AutoTokenizer.from_pretrained(
        str(tmp_path), local_files_only=True
    )
    hf.pad_token = hf.eos_token
    mine = HFTextTokenizer.from_pretrained(str(tmp_path))
    assert mine.bos_token_id == hf.bos_token_id
    assert mine.eos_token_id == hf.eos_token_id
    batch = ["What is the QRS duration?", "Answer: 120 ms"]
    got = mine(batch, return_tensors="np", add_special_tokens=False)
    want = hf(batch, return_tensors="np", add_special_tokens=False,
              padding="longest")
    # same ids in the valid region; the pad id may differ (hf has none here)
    import numpy as np

    for g, w, m in zip(got.input_ids, want.input_ids, want.attention_mask):
        n = int(m.sum())
        assert np.array_equal(g[:n], w[:n])
    assert np.array_equal(got.attention_mask, want.attention_mask)
