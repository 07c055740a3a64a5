"""Two-stage datasets: CLIP/ViT image pipelines + MERL signal scaling.

Counterpart of ``ECGCLIPPretrain`` / ``ECGCLIPFinetune``
(data_loader.py:136-332).  The HF image processors are replaced by
self-contained equivalents with the same semantics: the 12xL ECG is
min-max scaled to a uint8 grayscale image, replicated to RGB, resized
with PIL bicubic (CLIP: shortest-edge resize + center crop; ViT: direct
resize), rescaled by 1/255 and normalized with the published means/stds.
Text goes through whatever tokenizer is passed (the byte tokenizer in
zero-download mode, real HF processors otherwise).

Fixed vs reference: the label pad/bos masking in
``ECGCLIPFinetune._prepare_training`` (data_loader.py:314-315) boolean-
indexes a Python list (a crash as shipped); here labels are numpy so the
masking actually applies.  The inference item also carries ``attn_mask2``
for the spliced ``tokenized_signal2`` prompt the generate path consumes.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, List, Optional

import numpy as np

from ecg_byte_tpu.data.datasets import (
    create_attention_like_mask,
    create_position_ids,
    parse_question_answer,
)

# HF CLIPImageProcessor / ViTImageProcessor normalization constants
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
VIT_IMAGE_MEAN = (0.5, 0.5, 0.5)
VIT_IMAGE_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass
class TwoStageConfig:
    """Knobs of the reference pretrain/finetune argparse namespaces."""

    dataset: str = "ptb_500"
    model: Optional[str] = None
    percentiles: Any = None
    num_patches: int = 196
    image_size: int = 224
    seed: int = 0
    pad_to_max: int = 1022
    inference: bool = False


def _signal_to_image(signal: np.ndarray) -> "Any":
    """ECG -> PIL RGB image exactly like data_loader.py:152-157."""
    from PIL import Image

    smin, smax = signal.min(), signal.max()
    normalized = (signal - smin) / (smax - smin + 1e-6) * 255
    image = np.stack([normalized] * 3, axis=-1).astype(np.uint8)
    return Image.fromarray(image)


def _resize_shortest_edge(image, size: int):
    from PIL import Image

    w, h = image.size
    short = min(w, h)
    scale = size / short
    return image.resize(
        (max(int(round(w * scale)), size), max(int(round(h * scale)), size)),
        Image.BICUBIC,
    )


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    out = arr[top : top + size, left : left + size]
    if out.shape[0] != size or out.shape[1] != size:  # pad degenerate dims
        pad_h, pad_w = size - out.shape[0], size - out.shape[1]
        out = np.pad(out, ((0, pad_h), (0, pad_w), (0, 0)))
    return out


def _normalize_chw(arr: np.ndarray, mean, std) -> np.ndarray:
    arr = arr.astype(np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return np.transpose(arr, (2, 0, 1))  # HWC -> CHW


def clip_process_image(signal: np.ndarray, image_size: int = 224) -> np.ndarray:
    """CLIPImageProcessor: shortest-edge resize -> center crop -> normalize."""
    img = _resize_shortest_edge(_signal_to_image(signal), image_size)
    arr = _center_crop(np.asarray(img), image_size)
    return _normalize_chw(arr, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)


def vit_process_image(signal: np.ndarray, image_size: int = 224) -> np.ndarray:
    """ViTImageProcessor: direct (size, size) resize -> normalize."""
    from PIL import Image

    img = _signal_to_image(signal).resize((image_size, image_size), Image.BICUBIC)
    return _normalize_chw(np.asarray(img), VIT_IMAGE_MEAN, VIT_IMAGE_STD)


def _tokenize_padded(tokenizer, text: str, max_length: int,
                     add_special_tokens: bool = False):
    """Right-padded fixed-width text encoding (CLIP max 77 / MERL max 64)."""
    out = tokenizer(
        [text],
        return_tensors="np",
        padding="max_length",
        max_length=max_length,
        truncation=True,
        add_special_tokens=add_special_tokens,
    )
    return out.input_ids[0].astype(np.int64), out.attention_mask[0].astype(np.int64)


def _minmax_merl(signal: np.ndarray) -> np.ndarray:
    """Min-max to [0, 1] then x1000 — MERL's scaling (data_loader.py:152-154)."""
    smin, smax = signal.min(), signal.max()
    return ((signal - smin) / (smax - smin + 1e-6) * 1000).astype(np.float32)


class ECGCLIPPretrain:
    """Stage-1 dataset (data_loader.py:136-204)."""

    def __init__(self, signal_path_list, text_path_list, tokenizer=None, args=None):
        self.signal_path_list = np.array(signal_path_list)
        self.text_path_list = np.array(text_path_list)
        self.tokenizer = tokenizer
        self.args = args

    def __len__(self) -> int:
        return len(self.signal_path_list)

    def __getitem__(self, index: int):
        try:
            signal = np.load(self.signal_path_list[index])
            with open(self.text_path_list[index]) as f:
                text_label = json.load(f)
            if isinstance(text_label, list):  # mimic conversations
                text_label = text_label[1]["value"]
        except Exception as e:
            print(f"Error loading files at index {index}: {e}")
            return None

        a = self.args
        item = {
            "clip_input_ids": 1,
            "clip_att_mask": 1,
            "vit_pixel": 1,
            "clip_pixel": 1,
            "mask": 1,
            "norm_signal": _minmax_merl(signal),
            "resnet_input_ids": 1,
            "resnet_att_mask": 1,
        }
        if a.model in ("clip", "clip_vit"):
            ids, mask = _tokenize_padded(self.tokenizer, text_label, 77)
            item["clip_input_ids"] = ids
            item["clip_att_mask"] = mask
            item["clip_pixel"] = clip_process_image(signal, a.image_size)
        if a.model in ("vit", "clip_vit"):
            item["mask"] = np.random.rand(a.num_patches) < 0.75
            item["vit_pixel"] = vit_process_image(signal, a.image_size)
        if a.model == "resnet":
            # a WordPiece (MedCPT) tokenizer needs its [CLS]..[SEP]
            # template — the reference's MedCPT tokenizer default
            # (merl.py:197-201); the byte tokenizer stays bare
            ids, mask = _tokenize_padded(
                self.tokenizer, text_label, 64,
                add_special_tokens=getattr(
                    self.tokenizer, "bert_specials", False
                ),
            )
            item["resnet_input_ids"] = ids
            item["resnet_att_mask"] = mask
        return item


def pad_to_max_seq(
    tokenized_sequence: List[int], pad_id: int, bos_id: int, eos_id: int,
    pad_to_max: int,
) -> List[int]:
    """Reference ``pad_to_max`` (data_loader.py:11-19): total length is
    always ``pad_to_max + 2`` (bos/eos added outside the budget)."""
    seq = list(tokenized_sequence)
    if len(seq) > pad_to_max:
        return [bos_id] + seq[:pad_to_max] + [eos_id]
    if len(seq) < pad_to_max:
        return [pad_id] * (pad_to_max - len(seq)) + [bos_id] + seq + [eos_id]
    return [bos_id] + seq + [eos_id]


class ECGCLIPFinetune:
    """Stage-2 dataset (data_loader.py:208-332)."""

    def __init__(self, signal_path_list, text_path_list, tokenizer=None, args=None):
        self.signal_path_list = np.array(signal_path_list)
        self.text_path_list = np.array(text_path_list)
        self.tokenizer = tokenizer
        self.args = args
        t = tokenizer
        self.pad_id = t.convert_tokens_to_ids(t.pad_token)
        self.bos_id = t.convert_tokens_to_ids(t.bos_token)
        self.eos_id = t.convert_tokens_to_ids(t.eos_token)
        self.sig_start_id = t.convert_tokens_to_ids(["<sig_start>"])
        self.sig_end_id = t.convert_tokens_to_ids(["<sig_end>"])
        self.signal_id = t.convert_tokens_to_ids(["<signal>"])

    def __len__(self) -> int:
        return len(self.signal_path_list)

    def _encoder_inputs(self, signal: np.ndarray, answer: str):
        a = self.args
        item = {
            "mask": 1,
            "clip_pixel": 1,
            "clip_att_mask": 1,
            "vit_pixel": 1,
            "clip_input_ids": 1,
            "norm_signal": _minmax_merl(signal),
        }
        if a.model in ("clip_model", "clip_vit_model"):
            ids, mask = _tokenize_padded(self.tokenizer, answer, 77)
            item["clip_input_ids"] = ids
            item["clip_att_mask"] = mask
            item["clip_pixel"] = clip_process_image(signal, a.image_size)
        if a.model in ("vit_model", "clip_vit_model"):
            item["mask"] = np.random.rand(a.num_patches) < 0.75
            item["vit_pixel"] = vit_process_image(signal, a.image_size)
        return item

    def __getitem__(self, index: int):
        try:
            signal = np.load(self.signal_path_list[index])
            with open(self.text_path_list[index]) as f:
                text_label = json.load(f)
            question, answer = parse_question_answer(text_label, self.args.dataset)
        except Exception as e:
            print(f"Error loading files at index {index}: {e}")
            return None

        enc = self._encoder_inputs(signal, answer)
        tokenized_question = self.tokenizer(
            [question], return_tensors="np", add_special_tokens=False
        ).input_ids[0].tolist()
        tokenized_answer = self.tokenizer(
            [answer], return_tensors="np", add_special_tokens=False
        ).input_ids[0].tolist()

        if self.args.inference:
            return self._prepare_inference(tokenized_question, answer, question, enc)
        return self._prepare_training(tokenized_question, tokenized_answer, enc)

    def _prepare_inference(self, tokenized_question, answer, question, enc):
        """Two prompts: seq1 without and seq2 with the <signal> slot
        (data_loader.py:284-303)."""
        seq1 = [self.bos_id] + self.sig_start_id + self.sig_end_id + tokenized_question
        seq2 = (
            [self.bos_id]
            + self.sig_start_id
            + self.signal_id
            + self.sig_end_id
            + tokenized_question
        )
        item = {
            "answer": answer,
            "question": question,
            "tokenized_signal": np.asarray(seq1, np.int64),
            "tokenized_signal2": np.asarray(seq2, np.int64),
            "attn_mask": np.asarray(
                create_attention_like_mask(self.pad_id, seq1), np.float32
            ),
            "attn_mask2": np.asarray(
                create_attention_like_mask(self.pad_id, seq2), np.float32
            ),
        }
        item.update(enc)
        return item

    def _prepare_training(self, tokenized_question, tokenized_answer, enc):
        """<sig_start> <signal> <sig_end> Q A packing (data_loader.py:305-332),
        with the pad/bos label masking actually applied."""
        full_seq = (
            self.sig_start_id
            + self.signal_id
            + self.sig_end_id
            + tokenized_question
            + tokenized_answer
        )
        labels = [-100] * (len(tokenized_question) + 3) + tokenized_answer

        pad_to = self.args.pad_to_max
        padded = pad_to_max_seq(full_seq, self.pad_id, self.bos_id, self.eos_id, pad_to)
        position_ids = create_position_ids(padded, self.pad_id)
        padded_labels = np.asarray(
            pad_to_max_seq(labels, self.pad_id, self.bos_id, self.eos_id, pad_to),
            np.int64,
        )
        padded_labels[padded_labels == self.pad_id] = -100
        padded_labels[padded_labels == self.bos_id] = -100
        attention_mask = create_attention_like_mask(self.pad_id, padded)

        assert len(padded) == len(attention_mask) == (pad_to + 2), (
            f"Lengths don't match: masked_sample ({len(padded)}), "
            f"attention_mask ({len(attention_mask)}) {pad_to + 2}"
        )

        item = {
            "tokenized_signal": np.asarray(padded, np.int64),
            "attn_mask": np.asarray(attention_mask, np.float32),
            "quantized_signal_ids_input": padded_labels,
            "position_ids": position_ids,
        }
        item.update(enc)
        return item
