"""1-D ResNet over 12-lead ECG signals (MERL backbone), functional JAX.

Mirrors ecg_byte/models/merl.py:33-138: BasicBlock / Bottleneck residual
blocks on Conv1d + BatchNorm1d, stem conv k7 s2, four stages at 64/128/256/
512 channels, ResNet18/34/50/101/152 depths.  BatchNorm carries running
statistics as a separate ``state`` tree (functional equivalent of torch's
buffers); ``train=True`` uses batch statistics and returns updated state.

Layout: activations are (B, C, L) channel-major like the reference, mapped
to XLA conv dimension numbers ("NCH", "OIH", "NCH") — channels contract on
the MXU.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

BN_MOMENTUM = 0.1  # torch default
BN_EPS = 1e-5


def _conv_init(rng, k, c_in, c_out):
    # He-normal fan_out like torch Conv defaults are kaiming_uniform; scale ok
    fan = k * c_in
    std = float(np.sqrt(2.0 / fan))
    return jax.random.normal(rng, (c_out, c_in, k), jnp.float32) * std


def conv1d(x, kernel, stride=1, padding=0, compute_dtype=None):
    """1-D conv; with ``compute_dtype=bfloat16`` the operands are cast for
    the MXU (2x the f32 systolic rate on v5e) and the result is upcast
    back so the BatchNorm statistics and residual sums downstream see f32
    values.  The TPU MXU accumulates bf16 products in f32 internally, so
    the only precision loss is one rounding of the conv output.  (Keeping
    the output f32 via ``preferred_element_type`` instead breaks the conv
    VJP — the transpose conv then mixes an f32 cotangent with bf16
    operands, which lax rejects.)"""
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y.astype(out_dtype) if compute_dtype is not None else y


def _bn_init(c):
    return (
        {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
    )


def batchnorm(x, p, s, train: bool):
    """BatchNorm1d over (B, C, L); returns (y, new_state)."""
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * var,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean[None, :, None]) * (inv * p["scale"])[None, :, None]
    return y + p["bias"][None, :, None], new_s


def _init_block(rng, c_in, c_out, stride, bottleneck: bool):
    ks = jax.random.split(rng, 4)
    if bottleneck:
        p = {
            "conv1": _conv_init(ks[0], 1, c_in, c_out),
            "conv2": _conv_init(ks[1], 3, c_out, c_out),
            "conv3": _conv_init(ks[2], 1, c_out, 4 * c_out),
        }
        bns = ["bn1", "bn2", "bn3"]
        chans = [c_out, c_out, 4 * c_out]
        out_ch = 4 * c_out
    else:
        p = {
            "conv1": _conv_init(ks[0], 3, c_in, c_out),
            "conv2": _conv_init(ks[1], 3, c_out, c_out),
        }
        bns = ["bn1", "bn2"]
        chans = [c_out, c_out]
        out_ch = c_out
    s = {}
    for name, c in zip(bns, chans):
        p[name], s[name] = _bn_init(c)
    if stride != 1 or c_in != out_ch:
        p["shortcut_conv"] = _conv_init(ks[3], 1, c_in, out_ch)
        p["shortcut_bn"], s["shortcut_bn"] = _bn_init(out_ch)
    return p, s, out_ch


def _block_forward(x, p, s, stride, bottleneck, train, compute_dtype=None):
    new_s = {}
    cd = compute_dtype
    if bottleneck:
        out = conv1d(x, p["conv1"], compute_dtype=cd)
        out, new_s["bn1"] = batchnorm(out, p["bn1"], s["bn1"], train)
        out = jax.nn.relu(out)
        out = conv1d(out, p["conv2"], stride=stride, padding=1, compute_dtype=cd)
        out, new_s["bn2"] = batchnorm(out, p["bn2"], s["bn2"], train)
        out = jax.nn.relu(out)
        out = conv1d(out, p["conv3"], compute_dtype=cd)
        out, new_s["bn3"] = batchnorm(out, p["bn3"], s["bn3"], train)
    else:
        out = conv1d(x, p["conv1"], stride=stride, padding=1, compute_dtype=cd)
        out, new_s["bn1"] = batchnorm(out, p["bn1"], s["bn1"], train)
        out = jax.nn.relu(out)
        out = conv1d(out, p["conv2"], padding=1, compute_dtype=cd)
        out, new_s["bn2"] = batchnorm(out, p["bn2"], s["bn2"], train)
    if "shortcut_conv" in p:
        sc = conv1d(x, p["shortcut_conv"], stride=stride, compute_dtype=cd)
        sc, new_s["shortcut_bn"] = batchnorm(sc, p["shortcut_bn"], s["shortcut_bn"], train)
    else:
        sc = x
    return jax.nn.relu(out + sc), new_s


_DEPTHS = {
    "resnet18": ([2, 2, 2, 2], False),
    "resnet34": ([3, 4, 6, 3], False),
    "resnet50": ([3, 4, 6, 3], True),
    "resnet101": ([3, 4, 23, 3], True),
    "resnet152": ([3, 8, 36, 3], True),
}


def init_resnet(rng, variant: str = "resnet101", in_channels: int = 12):
    """Init (params, state, meta).  Output channels: 512 * expansion."""
    depths, bottleneck = _DEPTHS[variant]
    ks = jax.random.split(rng, 2 + sum(depths))
    params: Params = {"stem_conv": _conv_init(ks[0], 7, in_channels, 64)}
    state: Params = {}
    params["stem_bn"], state["stem_bn"] = _bn_init(64)
    c_in = 64
    ki = 2
    meta = {"variant": variant, "strides": [], "bottleneck": bottleneck}
    for stage, (n_blocks, c_out, stride0) in enumerate(
        zip(depths, [64, 128, 256, 512], [1, 2, 2, 2])
    ):
        for b in range(n_blocks):
            stride = stride0 if b == 0 else 1
            p, s, c_in_next = _init_block(ks[ki], c_in, c_out, stride, bottleneck)
            params[f"s{stage}b{b}"] = p
            state[f"s{stage}b{b}"] = s
            meta["strides"].append((f"s{stage}b{b}", stride))
            c_in = c_in_next
            ki += 1
    meta["out_channels"] = c_in
    return params, state, meta


def resnet_forward(params, state, meta, x, train: bool = False,
                   compute_dtype=None):
    """x: (B, 12, L) -> features (B, C_out, L'); returns (y, new_state).

    ``compute_dtype=jnp.bfloat16`` runs every conv's MACs on the MXU in
    bf16 with f32 accumulation (see conv1d); statistics, residual adds,
    and parameters stay f32.  ``ECG_BYTE_RESNET_BF16=1`` turns it on when
    the caller leaves it None (pretrain/finetune CLIs and bench)."""
    if compute_dtype is None and os.environ.get("ECG_BYTE_RESNET_BF16") == "1":
        compute_dtype = jnp.bfloat16
    new_state = {}
    out = conv1d(x, params["stem_conv"], stride=2, padding=3,
                 compute_dtype=compute_dtype)
    out, new_state["stem_bn"] = batchnorm(out, params["stem_bn"], state["stem_bn"], train)
    out = jax.nn.relu(out)
    for name, stride in meta["strides"]:
        out, new_state[name] = _block_forward(
            out, params[name], state[name], stride, meta["bottleneck"], train,
            compute_dtype=compute_dtype,
        )
    return out, new_state
