"""Size-exact synthetic flagship checkpoint generator (dress rehearsal).

Real Llama-3.2-1B weights cannot be downloaded in this environment (zero
egress, gated weights), so the flagship-scale path — `cli/main.py
--hf_weights <dir>`: 2.47 GB safetensors ingest, 128,256-row tokenizer.json
parse, +3,759 `signal_*` added tokens, embedding resize, LoRA overlay,
train, checkpoint/resume, decode (the reference's main.py:141-165 spine) —
would otherwise never execute as ONE program at true scale.  This tool
writes a checkpoint directory that is *size- and format-exact* (same config
values, same safetensors key layout and dtypes, same tokenizer.json
pipeline shape at the full 128k vocab) with random weight values, so
compile/memory/parse behavior is exercised for everything except the
weight values themselves.  Reference spine: /root/reference/main.py:141-165,
ecg_byte/models/llm.py:8-37.

The tokenizer.json is serialized by the real `tokenizers` library (the
same serializer HF checkpoints ship from), so our native reader
(tokenizer/hf_text.py) is exercised on an authentic file, not one shaped
by our own assumptions.

Usage:
  python -m ecg_byte_tpu.cli.make_flagship_fixture --out /tmp/fake_llama32_1b
  python -m ecg_byte_tpu.cli.make_flagship_fixture --out d --tiny  # CPU tests
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Real Llama-3.2-1B config.json values (HF hub card; mirrors what
# models/hf_loader.config_from_hf consumes).
_FLAGSHIP_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "hidden_size": 2048,
    "intermediate_size": 8192,
    "num_hidden_layers": 16,
    "num_attention_heads": 32,
    "num_key_value_heads": 8,
    "head_dim": 64,
    "vocab_size": 128256,
    "max_position_embeddings": 131072,
    "rms_norm_eps": 1e-05,
    "rope_theta": 500000.0,
    "rope_scaling": {
        "factor": 32.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
        "rope_type": "llama3",
    },
    "tie_word_embeddings": True,
    "torch_dtype": "bfloat16",
    "bos_token_id": 128000,
    "eos_token_id": 128001,
}

_TINY_CONFIG = {
    **_FLAGSHIP_CONFIG,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "vocab_size": 1280,
    # 1278 base tokens + bos/eos specials appended (2 specials under 100k)
    "bos_token_id": 1278,
    "eos_token_id": 1279,
}


def write_weights(out_dir: str, cfg: dict, seed: int = 0) -> int:
    """Random bf16 weights in the exact HF single-shard key layout.

    Llama-3.2-1B ships one `model.safetensors` (tied embeddings, no
    lm_head key); hf_loader.load_hf_checkpoint reads exactly these keys.
    Returns total bytes written."""
    import ml_dtypes
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    H, I = cfg["hidden_size"], cfg["intermediate_size"]
    KV = cfg["num_key_value_heads"] * cfg["head_dim"]
    Q = cfg["num_attention_heads"] * cfg["head_dim"]
    bf16 = ml_dtypes.bfloat16

    def w(*shape, std=0.02):
        return (rng.standard_normal(shape, dtype=np.float32) * std).astype(bf16)

    t = {"model.embed_tokens.weight": w(cfg["vocab_size"], H)}
    for i in range(cfg["num_hidden_layers"]):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones(H, bf16)
        t[p + "self_attn.q_proj.weight"] = w(Q, H)
        t[p + "self_attn.k_proj.weight"] = w(KV, H)
        t[p + "self_attn.v_proj.weight"] = w(KV, H)
        t[p + "self_attn.o_proj.weight"] = w(H, Q)
        t[p + "post_attention_layernorm.weight"] = np.ones(H, bf16)
        t[p + "mlp.gate_proj.weight"] = w(I, H)
        t[p + "mlp.up_proj.weight"] = w(I, H)
        t[p + "mlp.down_proj.weight"] = w(H, I)
    t["model.norm.weight"] = np.ones(H, bf16)
    save_file(t, os.path.join(out_dir, "model.safetensors"))
    return sum(x.nbytes for x in t.values())


# The Llama-3 pre-tokenizer split regex (public spec constant, shipped in
# every converted Llama-3 tokenizer.json).
_LLAMA3_PAT = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


def _synthetic_bpe(n_vocab: int):
    """Deterministic (vocab, merges) at an arbitrary scale.

    Byte-level alphabet (256) + all 2-char pairs + 3-char extensions, each
    non-alphabet token created by exactly one merge — a structurally valid
    byte-level BPE of the same row count as the real tokenizer, without
    needing a 15 TB training corpus.  Values are synthetic; the *shape*
    (vocab rows, merge list length, pipeline components) is what the dress
    rehearsal exercises."""
    from tokenizers import pre_tokenizers

    alphabet = sorted(pre_tokenizers.ByteLevel.alphabet())
    assert len(alphabet) == 256
    vocab = {c: i for i, c in enumerate(alphabet)}
    merges = []
    two_char = []
    n_more = n_vocab - 256
    # all 2-char pairs, row-major
    for a in alphabet:
        for b in alphabet:
            if len(merges) >= n_more:
                break
            tok = a + b
            vocab[tok] = len(vocab)
            merges.append((a, b))
            two_char.append(tok)
        if len(merges) >= n_more:
            break
    # 3-char extensions: (2-char token, alphabet char)
    idx = 0
    while len(merges) < n_more:
        m, c = divmod(idx, 256)
        tok = two_char[m] + alphabet[c]
        vocab[tok] = len(vocab)
        merges.append((two_char[m], alphabet[c]))
        idx += 1
    return vocab, merges


def write_tokenizer(out_dir: str, cfg: dict) -> int:
    """Real-shape tokenizer.json: full-scale vocab + merges, the Llama-3
    pipeline (Split regex + ByteLevel pre-tokenizer, bos template
    post-processor, ByteLevel decoder), 256 special tokens — serialized by
    the `tokenizers` library itself.  Returns the vocab size incl. specials."""
    from tokenizers import AddedToken, Regex, Tokenizer, models
    from tokenizers import pre_tokenizers, processors, decoders

    n_specials = 256 if cfg["vocab_size"] > 100000 else 2
    n_base = cfg["vocab_size"] - n_specials
    vocab, merges = _synthetic_bpe(n_base)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges, ignore_merges=True))
    tok.pre_tokenizer = pre_tokenizers.Sequence([
        pre_tokenizers.Split(Regex(_LLAMA3_PAT), behavior="isolated"),
        pre_tokenizers.ByteLevel(add_prefix_space=False, use_regex=False),
    ])
    tok.decoder = decoders.ByteLevel()
    specials = ["<|begin_of_text|>", "<|end_of_text|>"]
    named = ["<|finetune_right_pad_id|>", "<|start_header_id|>",
             "<|end_header_id|>", "<|eom_id|>", "<|eot_id|>", "<|python_tag|>"]
    while len(specials) < n_specials:
        nxt = (named.pop(0) if named else
               f"<|reserved_special_token_{len(specials) - 2}|>")
        specials.append(nxt)
    tok.add_special_tokens([AddedToken(s, special=True) for s in specials])
    bos = "<|begin_of_text|>"
    tok.post_processor = processors.TemplateProcessing(
        single=f"{bos} $A",
        pair=f"{bos} $A {bos} $B:1",
        special_tokens=[(bos, tok.token_to_id(bos))],
    )
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "bos_token": bos,
            "eos_token": "<|end_of_text|>",
            "model_max_length": cfg["max_position_embeddings"],
            "tokenizer_class": "PreTrainedTokenizerFast",
        }, f)
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as f:
        json.dump({"bos_token": bos, "eos_token": "<|end_of_text|>"}, f)
    return tok.get_vocab_size()


def make_fixture(out_dir: str, tiny: bool = False, seed: int = 0,
                 force: bool = False) -> dict:
    """Write the fixture (idempotent via a stamp file); return stats."""
    stamp = os.path.join(out_dir, ".fixture_complete.json")
    if os.path.exists(stamp) and not force:
        with open(stamp) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    cfg = _TINY_CONFIG if tiny else _FLAGSHIP_CONFIG
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    t0 = time.perf_counter()
    n_bytes = write_weights(out_dir, cfg, seed)
    t_w = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_vocab = write_tokenizer(out_dir, cfg)
    t_t = time.perf_counter() - t0
    stats = {
        "weight_bytes": n_bytes,
        "tokenizer_vocab": n_vocab,
        "tokenizer_json_bytes": os.path.getsize(
            os.path.join(out_dir, "tokenizer.json")
        ),
        "write_weights_s": round(t_w, 1),
        "write_tokenizer_s": round(t_t, 1),
    }
    with open(stamp, "w") as f:
        json.dump(stats, f)
    return stats


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--tiny", action="store_true",
                   help="small shapes, same layout (for CPU tests)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force", action="store_true")
    args = p.parse_args()
    stats = make_fixture(args.out, tiny=args.tiny, seed=args.seed,
                         force=args.force)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
