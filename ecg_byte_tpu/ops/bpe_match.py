"""Pallas BPE encode path: fused arithmetic matcher + sequential-chain kernel.

The XLA conv-matcher (ops/bpe_encode.py) is exact but materializes the
(B, N, T) match-score tensor in HBM — ~54 GB per 256x30k-symbol batch at
T=3500 — and its greedy chain runs as a 30k-step ``lax.scan`` of tiny ops.
Both are rebuilt here as Pallas kernels sized to the measured workload
(canonical tokenizers: max token length <= 16, T <= ~4k):

1. ``match`` kernel (grid (records, position-blocks)): instead of one-hot
   window/filter banks, matching is an *arithmetic* identity —

       sum_{j < len_t} (sym[p+j] - t_j)^2 == 0   <=>   token t matches at p

   expanded per token into ``qt + q2 + C_t`` where ``qt = -2 sum sym*t_j``
   and ``q2 = sum sym^2 * 1[j < len_t]`` both come from ONE int8 MXU dot
   against a combined (3W+3, T) table: the contraction rows hold the raw
   symbol window, the squared-symbol high nibble (weighted 16), the low
   nibble, and three constant rows folding each token's ``sum t^2``.  The
   Toeplitz window matrix is PREBUILT BY XLA as strided int8 copies —
   (B, 3W+3, N) is only ~300 MB per 256x30k batch, ~1 ms of HBM traffic —
   so the kernel does no roll/stack relayouts at all: it DMAs a
   (3W+3, TN) window block, runs the int8 dot and the id epilogue in a
   TRANSPOSED dataflow (score strip (T, TN), positions on the lane axis),
   and the score strip lives and dies in VMEM (materialized to HBM it
   would be ~110 GB per batch — the XLA conv path's measured bound).
2. ``chain`` kernel (sequential grid over position blocks, records in
   lanes): the banded greedy-chain recurrence as an in-kernel loop over a
   rolling 16-row window held in scratch — one hardware loop instead of N
   XLA scan steps.

Round 4: the match epilogue is a PACKED-VALUE MAX (one fused
multiply-add + max-reduce per score element, no int8 hit
materialization, no id dot; 41.2 -> 37.2 ms per 256x30k batch on v5e,
output-identical; the id-dot kernel is kept for ids >= 4096) and
compaction is ops/bpe_encode._compact's packed single-int32 sort
(15.6 -> 9.4 ms).

Round 4b: the Toeplitz windows moved INSIDE the kernel
(_match_kernel_inker).  The XLA prebuild measured 15.6 ms per 256x30k
batch on v5e (39 misaligned strided row copies, ~20 GB/s effective — not
the ~1 ms the bandwidth arithmetic suggests), about 8 ms of it exposed
after DMA overlap.  The kernel now receives the RAW int8 symbol stream as
two pipelined blocks (current tile + lookahead tile for the cross-border
window tail) and builds the (3W+3, TN) window matrix in VMEM: one
(3, X) feature stack [sym | sq>>4 | sq&15] is lane-rotated once per
offset j (``pltpu.roll`` — rotations produce canonical layouts, unlike
lane-offset slices, so the row concat is legal in Mosaic), with the filt
rows interleaved (sym_j, hi_j, lo_j) to match.  HBM traffic per tile
drops from 39xTN window bytes to 2xTN symbol bytes.  Measured:
37.2 -> 29.0 ms at tile_n=8192, strip=3584 on the plain mean-over-6
harness (sweep: 16k/32k tiles are 2-4 ms worse — VMEM pressure); with
the fixed per-sync tunnel RTT slope-differenced out
(bench.bench_preprocess_stages), the stage is 23.9 ms — AT the 23.6 ms
dot-only floor (same harness), i.e. the in-kernel construction and the
epilogue are fully hidden behind the MXU.  The dot floor is invariant
in K for K <= 128 (int8 MXU output-rate law, ~1.19e12 outputs/s), so
this formulation is done: every further lever must cut OUTPUTS
(tokens x positions), and the measured negative results below say the
reorder costs of doing so exceed the dot savings.  Negative
results so far, for the record: first-symbol bucketing (14x fewer
outputs) dies on gather/sort reorder costs (XLA gathers 108-974 ms);
ECG smoothness gives no usable first-symbol locality at any block size;
packing two positions per output column cannot scale the second
position's contribution past int8's range; per-length group dots with
a prefix-sum sq epilogue lose 12 ms to group padding and small-M dots;
bf16 operands break exactness (sym^2 <= 625 exceeds bf16's 256-int
range).

Token streams are byte-exact with the conv matcher and the native trie
encoder (cross-checked in tests/test_bpe_match.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecg_byte_tpu.ops.quantize import NUM_SYMBOLS, _BYTE_A

PAD_SYMBOL = NUM_SYMBOLS  # 26
PAD_TOKEN = -1
_PACK = 8192  # packed value: len * _PACK + id  (id < 8192 enforced at build)
_WINDOW = 16  # chain kernel rolling-window rows (>= max token length)


class PallasMatcher(NamedTuple):
    """Combined arithmetic match table for the Pallas kernel.

    width: padded window width (multiple of 4, >= longest token).
    filt: int8 (3*width + 3, T) — [-2*t_j | 16*ind_j | ind_j] rows plus
      three constant-folding rows encoding ``cadd = sum t_j^2`` against
      window constant rows [64 | 64 | 1] (two 64-rows keep every digit
      int8 for cadd up to 16*625): the MXU dot then lands at exactly 0 on
      a hit and the VPU epilogue needs no broadcast add (padded token
      columns get digit 1 -> score 64, never a hit).
    digits: int8 (2*n_lengths, T) — token id split into base-128 digits
      in its length's row pair (the id-matmul epilogue contracts the hit
      mask against this on the MXU, positions on the lane axis).
    lengths: static tuple of the distinct token lengths, ascending.
    pcol: int32 (T, 1) — ``len * _VAL_PACK + id`` per token column for the
      round-4 packed-value-max epilogue (_match_kernel_val); 0 in padded
      columns.
    use_val: whether the val epilogue's bounds hold (id < _VAL_PACK,
      len <= 16) — canonical tokenizers qualify; larger ids fall back to
      the id-dot epilogue.
    bfilt: int8 (10*bwidth + 2, T) — the round-4d BIT-PLANE match table
      for the two-positions-per-output-column kernel (_match_kernel_bits):
      per offset j < bwidth, five rows hold ``1 - 2*t_bit`` per symbol bit
      (so the dot against the window's bit planes counts MISMATCHED bits,
      0 iff the token matches), repeated for the second packed position,
      plus two trailing cadd rows folding ``sum of set token bits``.
    bwidth: bit-table window width (== max_len when use_bits).
    use_bits: bounds for the packed-pair kernel — max_len <= 12 keeps the
      per-position mismatch count < 64 AND the packed contraction depth
      10*bwidth + 2 <= 128 (one MXU pass).  Longer vocabularies (13..16)
      fall back to the arithmetic-identity kernel.
    """

    width: int
    filt: jax.Array
    digits: jax.Array
    lengths: Tuple[int, ...]
    max_len: int
    pcol: jax.Array
    use_val: bool
    bfilt: jax.Array
    bwidth: int
    use_bits: bool


def build_pallas_matcher(
    merges: Sequence[Tuple[Sequence[int], int]], max_width: int = _WINDOW
) -> PallasMatcher:
    """Compile reference-format merges into the arithmetic match table.

    Same dictionary semantics as ops/bpe_encode.build_matcher (trie
    insert-overwrite, single symbols implicit).  Raises for vocabularies
    the kernel cannot host (token longer than ``max_width`` or id >= 8192)
    — callers fall back to the conv matcher then.  ``max_width`` is capped
    at the chain kernel's rolling window (``_WINDOW``): the chain step can
    never exceed ``_WINDOW`` rows, so admitting longer tokens would produce
    silently wrong streams rather than a loud fallback.
    """
    if max_width > _WINDOW:
        raise ValueError(
            f"max_width {max_width} exceeds the chain-kernel window "
            f"{_WINDOW}; longer tokens must use the conv matcher"
        )
    by_seq = {}
    for seq, token_id in merges:
        symbols = tuple(int(b) - _BYTE_A for b in seq)
        if any(s < 0 or s >= NUM_SYMBOLS for s in symbols):
            continue
        if len(symbols) < 2:
            continue
        if int(token_id) >= _PACK:
            raise ValueError(
                f"token id {token_id} exceeds the {_PACK - 1} packing limit"
            )
        by_seq[symbols] = int(token_id)

    max_len = max((len(s) for s in by_seq), default=1)
    if max_len > max_width:
        raise ValueError(
            f"token length {max_len} exceeds the kernel window {max_width}"
        )
    width = max(4, -(-max_len // 4) * 4)

    t = len(by_seq)
    t_pad = max(256, -(-t // 256) * 256)
    lengths = tuple(sorted({len(s) for s in by_seq} or {2}))
    len_col = {L: i for i, L in enumerate(lengths)}
    filt = np.zeros((3 * width + 3, t_pad), np.int8)
    filt[3 * width, :] = 1  # padded columns: constant score 64, never 0
    digits = np.zeros((2 * len(lengths), t_pad), np.int8)
    pcol = np.zeros((t_pad, 1), np.int32)
    max_id = max(by_seq.values(), default=0)
    use_val = max_id < _VAL_PACK and max_len <= 16
    use_bits = use_val and max_len <= _BITS_MAX_LEN
    bwidth = min(max(max_len, 2), _BITS_MAX_LEN)
    bfilt = np.zeros((10 * bwidth + 2, t_pad), np.int8)
    for col, (symbols, token_id) in enumerate(by_seq.items()):
        for j, s in enumerate(symbols):
            filt[j, col] = -2 * s
            filt[width + j, col] = 16
            filt[2 * width + j, col] = 1
        cadd = sum(s * s for s in symbols)  # <= 16 * 625 = 10000
        h = cadd // 64
        filt[3 * width, col] = h // 2  # against window constant 64
        filt[3 * width + 1, col] = h - h // 2  # against window constant 64
        filt[3 * width + 2, col] = cadd % 64  # against window constant 1
        li = len_col[len(symbols)]
        digits[2 * li, col] = token_id // 128  # ids < 8192 -> digit < 64
        digits[2 * li + 1, col] = token_id % 128
        if use_val:
            pcol[col, 0] = len(symbols) * _VAL_PACK + token_id
        if use_bits:
            badd = 0
            for j, s in enumerate(symbols):
                for k in range(5):
                    tb = (s >> k) & 1
                    w = 1 - 2 * tb  # dot with bit b gives b XOR t - t
                    bfilt[5 * j + k, col] = w
                    bfilt[5 * bwidth + 5 * j + k, col] = w
                    badd += tb
            # c = sum b*(1-2t) + sum t == number of mismatched bits over
            # the token's 5*len window bits; badd <= 5*12 = 60 (int8-safe)
            bfilt[10 * bwidth, col] = badd
            bfilt[10 * bwidth + 1, col] = badd
    return PallasMatcher(
        width=width,
        filt=jnp.asarray(filt),
        digits=jnp.asarray(digits),
        lengths=lengths,
        max_len=max_len,
        pcol=jnp.asarray(pcol),
        use_val=use_val,
        bfilt=jnp.asarray(bfilt),
        bwidth=bwidth,
        use_bits=use_bits,
    )


# ---------------------------------------------------------------------------
# Match kernel


def _match_kernel(win_ref, filt_ref, dig_ref, out_ref, *,
                  strip: int, lengths: Tuple[int, ...]):
    windows = win_ref[0]  # (3W+3, TN) int8 — prebuilt by XLA, no relayouts

    t_total = filt_ref.shape[1]
    strip = min(strip, t_total)
    acc = None
    for t0 in range(0, t_total, strip):
        # TRANSPOSED dataflow: core is (T, TN), so the id contraction's
        # output puts positions on the LANE axis (fully used at TN=2048)
        # instead of padding 2*n_lengths columns to 128 lanes — ~4x less
        # wasted MXU work in the epilogue, and the packed result is
        # already a (1, TN) row (no output relayout).
        core = jax.lax.dot_general(
            filt_ref[:, t0 : t0 + strip], windows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (strip, TN) int32 — lives and dies in VMEM; the constant rows
        # already folded sum t^2 in, so a hit is exactly core == 0
        hit = (core == 0).astype(jnp.int8)
        # id-matmul epilogue: contract the hit mask against per-length id
        # digits on the MXU — at most one token of a given length matches
        # a position, so the sums reproduce the digits exactly
        part = jax.lax.dot_general(
            dig_ref[:, t0 : t0 + strip], hit, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (2*n_lengths, TN)
        acc = part if acc is None else acc + part

    packed = None
    for li, L in enumerate(lengths):
        hi = jax.lax.slice_in_dim(acc, 2 * li, 2 * li + 1, axis=0)
        lo = jax.lax.slice_in_dim(acc, 2 * li + 1, 2 * li + 2, axis=0)
        id_l = hi * 128 + lo  # (1, TN); merge ids are >= 256, so 0 = no hit
        val = jnp.where(id_l > 0, L * _PACK + id_l, 0)
        packed = val if packed is None else jnp.maximum(packed, val)

    out_ref[:] = packed  # (1, TN), already position-major


_VAL_PACK = 4096  # val-kernel P format: len * 4096 + id (id < 4096)
_VAL_SCALE = 131072  # > P_max = 16*4096+4095; 131072 * core_max < 2^31
_BITS_MAX_LEN = 12  # bits kernel: 10*12+2 = 122 <= 128 rows, 5*12 = 60 < 64


def _match_kernel_bits(cur_ref, nxt_ref, filt_ref, pcol_ref, out_ref, *,
                       strip: int, width: int):
    """TWO positions per output column via the bit-plane mismatch count.

    The round-4b module docstring recorded position packing as a negative
    result: under the (sym - t)^2 identity the per-position score reaches
    16 * 26^2 = 10,816, so separating two packed scores needs a 2^14
    relative scale that no int8 operand split can carry.  This kernel
    changes the IDENTITY instead of the scale: with symbols expanded into
    their five bit planes (symbols < 27 < 32),

        c = sum_{j<len,k<5} (b_{j,k} XOR t_{j,k})
          = sum b_{j,k} * (1 - 2 t_{j,k})  +  sum t_{j,k}

    counts MISMATCHED WINDOW BITS — still 0 exactly on a hit, but now
    bounded by 5 * max_len <= 60 < 64 for max_len <= 12.  A 64x relative
    scale fits int8 on the WINDOW side alone (bit features are 0/1, so
    the second position's planes are 0/64), and one dot computes

        core[t, l] = c_p(l) + 64 * c_q(l + TN/2)        (l < TN/2)

    with contraction depth 10 * width + 2 <= 122 — still ONE 128-deep MXU
    pass, at HALF the outputs.  The measured v5e int8 output-rate law
    (~1.19e12 dot outputs/s, invariant in K <= 128 — see module
    docstring) is the whole story of the 23.6 ms dot floor, so halving
    outputs halves the floor.  Epilogue: extract both mismatch fields
    (c_p = core & 63, c_q = core >> 6 — both fields are >= 0 so no
    borrows), run the packed-value max per field, and write the two
    half-tiles side by side.  Padded token columns are all-zero rows with
    pcol 0: core 0 -> val 0, absorbed by the final max-with-0.

    Tables from :func:`build_pallas_matcher` (bfilt/pcol); gated by
    ``use_bits`` (max_len <= 12 — canonical ECG tokenizers measure
    max_len ~12 at 3.5k merges; longer vocabularies fall back to
    :func:`_match_kernel_inker`).
    """
    tn = cur_ref.shape[1]
    half = tn // 2
    ext = jnp.concatenate(
        [cur_ref[:, :], nxt_ref[:, :128]], axis=1
    ).astype(jnp.int32)
    planes = jnp.concatenate(
        [
            jnp.bitwise_and(jax.lax.shift_right_logical(ext, k), 1)
            for k in range(5)
        ],
        axis=0,
    )  # (5, X) int32 bit planes (Mosaic rotates are 32-bit only)
    x = planes.shape[1]
    pieces_p = []
    pieces_q = []
    for j in range(width):
        # ONE roll serves both packed positions: rp[l] holds position
        # l + j, so the q slot's window (position l + half + j) is the
        # SAME rolled array sliced at lane offset `half` — a multiple of
        # 256/2 >= 128, so the slice is lane-tile aligned and Mosaic
        # keeps it canonical (unaligned offsets j would not be).
        # Hardware-validated (not just interpret mode): 16x30000 rows
        # token-exact vs the native trie encoder under real Mosaic
        # lowering on TPU v5 lite, scripts/hw_parity.py, 2026-08-19.
        rp = pltpu.roll(planes, x - j, 1) if j else planes
        pieces_p.append(jax.lax.slice(rp, (0, 0), (5, half)))
        pieces_q.append(jax.lax.slice(rp, (0, half), (5, 2 * half)))
    wp = jnp.concatenate(pieces_p, axis=0).astype(jnp.int8)
    wq = (jnp.concatenate(pieces_q, axis=0) * 64).astype(jnp.int8)
    const = jnp.ones((1, half), jnp.int8)
    windows = jnp.concatenate(
        [wp, wq, const, const * jnp.int8(64)], axis=0
    )  # (10W+2, TN/2)

    t_total = filt_ref.shape[1]
    strip = min(strip, t_total)
    best_p = None
    best_q = None
    for t0 in range(0, t_total, strip):
        core = jax.lax.dot_general(
            filt_ref[:, t0 : t0 + strip], windows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (strip, TN/2): c_p + 64*c_q, both fields in [0, 60]
        pc = pcol_ref[t0 : t0 + strip, :]
        vp = pc - jnp.bitwise_and(core, 63) * _VAL_SCALE
        vq = pc - jax.lax.shift_right_logical(core, 6) * _VAL_SCALE
        mp = jnp.max(vp, axis=0, keepdims=True)
        mq = jnp.max(vq, axis=0, keepdims=True)
        best_p = mp if best_p is None else jnp.maximum(best_p, mp)
        best_q = mq if best_q is None else jnp.maximum(best_q, mq)
    out_ref[:] = jnp.maximum(
        jnp.concatenate([best_p, best_q], axis=1), 0
    )


def _match_kernel_inker(cur_ref, nxt_ref, filt_ref, pcol_ref, out_ref, *,
                        strip: int, width: int):
    """Packed-value-max kernel with IN-KERNEL Toeplitz construction.

    Inputs are two pipelined views of the raw int8 symbol stream — the
    current (1, TN) tile and the next tile (whose first ``width`` lanes
    complete the windows that straddle the tile border) — instead of the
    XLA-prebuilt (3W+3, TN) window block (measured 15.6 ms per 256x30k
    batch to build; see module docstring).  The (3, X) feature stack
    [sym | sq>>4 | sq&15] is rotated once per window offset j with
    ``pltpu.roll`` (rotations land in canonical lane layout, which makes
    the row concatenation legal in Mosaic; lane-offset *slices* do not),
    building the (3W+3, TN) int8 window matrix directly in VMEM.
    Requires the INTERLEAVED filt row order (sym_j, hi_j, lo_j per
    offset, consts last) produced by :func:`_interleave_rows`.

    Epilogue: ONE fused multiply-add and ONE max-reduce per score element

        val[t, p] = P[t] - _VAL_SCALE * core[t, p]
        out[p]    = max_t val[t, p]

    where ``P[t] = len_t * _VAL_PACK + id_t`` (the pcol column).  A hit
    has core == 0 so val == P > 0; any miss has core >= 1 so
    val <= P_max - _VAL_SCALE < 0.  The max over tokens therefore
    returns the LONGEST match's packed value directly — no (strip, TN)
    int8 hit materialization, no id dot, no per-length unpack loop.
    int32 safety (enforced in build_pallas_matcher): id < _VAL_PACK and
    len <= 16 give P_max = 69,631 < _VAL_SCALE; core <= 16 * 26^2 =
    10,816 gives _VAL_SCALE * core <= 1.42e9 < 2^31.
    """
    tn = cur_ref.shape[1]
    ext = jnp.concatenate(
        [cur_ref[:, :], nxt_ref[:, :128]], axis=1
    ).astype(jnp.int32)
    sq = ext * ext
    trio = jnp.concatenate(
        [ext, jax.lax.shift_right_logical(sq, 4), jnp.bitwise_and(sq, 15)],
        axis=0,
    )  # (3, X) int32
    x = trio.shape[1]
    pieces = []
    for j in range(width):
        r = pltpu.roll(trio, x - j, 1) if j else trio
        pieces.append(jax.lax.slice(r, (0, 0), (3, tn)))
    windows = jnp.concatenate(pieces, axis=0).astype(jnp.int8)
    const = jnp.ones((1, tn), jnp.int8)
    windows = jnp.concatenate(
        [windows, const * jnp.int8(64), const * jnp.int8(64), const], axis=0
    )  # (3W+3, TN)

    t_total = filt_ref.shape[1]
    strip = min(strip, t_total)
    best = None
    for t0 in range(0, t_total, strip):
        core = jax.lax.dot_general(
            filt_ref[:, t0 : t0 + strip], windows, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        val = pcol_ref[t0 : t0 + strip, :] - core * _VAL_SCALE
        m = jnp.max(val, axis=0, keepdims=True)
        best = m if best is None else jnp.maximum(best, m)
    out_ref[:] = jnp.maximum(best, 0)


def _interleave_rows(width: int):
    """Row permutation taking block-ordered filt (sym rows, hi rows, lo
    rows, consts) to the in-kernel construction order (sym_j, hi_j, lo_j
    per offset j, consts last)."""
    perm = []
    for j in range(width):
        perm += [j, width + j, 2 * width + j]
    perm += [3 * width, 3 * width + 1, 3 * width + 2]
    return np.asarray(perm)


def _build_windows(q, width: int):
    """XLA-side Toeplitz construction: (B, N) symbols -> (B, 3W+3, N) int8.

    Row c*W+j of the window matrix holds feature c of the symbol j ahead —
    XLA lowers the stack of shifted slices to strided copies (~1 ms per
    256x30k batch at int8), which is far cheaper than lane-rolling the
    streams inside the kernel (the round-2 kernel's dominant cost).
    Features are [sym | sq>>4 | sq&15]: int8-exact, and with weights
    [-2t | 16 | 1] their dot reproduces ``sum (sym-t)^2`` per the module
    docstring; three trailing CONSTANT rows [64 | 64 | 1] fold each
    token's ``sum t^2`` into the same dot (see PallasMatcher.filt).
    PAD_SYMBOL (26) never equals a token symbol, so windows running past
    the record end cannot complete a match.
    """
    b, n = q.shape
    sym = jnp.pad(q.astype(jnp.int32), ((0, 0), (0, width)),
                  constant_values=PAD_SYMBOL)
    sq = sym * sym
    feats = (
        sym.astype(jnp.int8),
        jax.lax.shift_right_logical(sq, 4).astype(jnp.int8),
        jnp.bitwise_and(sq, 15).astype(jnp.int8),
    )
    rows = [f[:, j : j + n] for f in feats for j in range(width)]
    const = jnp.ones((b, n), jnp.int8)
    rows += [const * jnp.int8(64), const * jnp.int8(64), const]
    return jnp.stack(rows, axis=1)  # (B, 3W+3, N)


def longest_match(q, matcher: PallasMatcher, *, tile_n: int | None = None,
                  strip: int | None = None, interpret: bool = False,
                  bits: bool | None = None):
    """(B, N) symbols -> (match_tok, match_len) int32, longest dict token
    per position (single-symbol fallback, ops/bpe_encode semantics).

    tile_n/strip default per kernel: the packed-pair bits path and the
    in-kernel-Toeplitz val path run fastest at (8192, 3584) on v5e; the
    prebuilt-window id-dot fallback keeps its swept (2048, 1792).

    bits: force (True) or disable (False) the packed-pair bit-plane
    kernel; default auto (when the vocabulary qualifies and the tile
    splits into two lane-aligned halves).
    """
    b, n = q.shape
    q = q.astype(jnp.int32)
    if tile_n is None:
        tile_n = 8192 if matcher.use_val else 2048
    if strip is None:
        strip = 3584 if matcher.use_val else 1792
    tile_n = min(tile_n, -(-n // 128) * 128)
    if bits is None:
        bits = matcher.use_bits and tile_n % 256 == 0
    elif bits and not (matcher.use_bits and tile_n % 256 == 0):
        raise ValueError(
            "bits kernel requires use_bits tables and tile_n % 256 == 0"
        )
    # Records are concatenated into ONE position stream (grid and output
    # blocks then satisfy Mosaic's (8, 128)-or-full-dim tiling with a
    # (1, X) layout).  Per-record padding of >= width PAD symbols keeps
    # windows from leaking across record boundaries.
    n_pad = -(-n // tile_n) * tile_n
    if n_pad - n < matcher.width:
        n_pad += tile_n
    q_padded = jnp.pad(q, ((0, 0), (0, n_pad - n)), constant_values=PAD_SYMBOL)
    flat = q_padded.reshape(1, b * n_pad)
    nb = b * n_pad // tile_n

    common = dict(
        out_shape=jax.ShapeDtypeStruct((1, b * n_pad), jnp.int32),
        grid=(nb,),
        out_specs=pl.BlockSpec((1, tile_n), lambda i: (0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,  # v5e has 128 MB VMEM
        ),
        interpret=interpret,
    )
    if matcher.use_val:
        # in-kernel Toeplitz: ship the raw int8 symbols twice (current
        # tile + lookahead tile); one extra PAD tile keeps the lookahead
        # block index in bounds on the last tile
        sym8 = jnp.pad(
            flat.astype(jnp.int8), ((0, 0), (0, tile_n)),
            constant_values=PAD_SYMBOL,
        )
        if bits:
            filt_i = matcher.bfilt
            kernel = functools.partial(
                _match_kernel_bits, strip=strip, width=matcher.bwidth,
            )
        else:
            filt_i = matcher.filt[_interleave_rows(matcher.width)]
            kernel = functools.partial(
                _match_kernel_inker, strip=strip, width=matcher.width,
            )
        packed = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, tile_n), lambda i: (0, i)),
                pl.BlockSpec((1, tile_n), lambda i: (0, i + 1)),
                pl.BlockSpec(filt_i.shape, lambda i: (0, 0)),
                pl.BlockSpec(matcher.pcol.shape, lambda i: (0, 0)),
            ],
            **common,
        )(sym8, sym8, filt_i, matcher.pcol)
        pack = _VAL_PACK
    else:
        windows = _build_windows(flat, matcher.width)  # (1, 3W+3, B*n_pad)
        w3 = 3 * matcher.width + 3
        kernel = functools.partial(
            _match_kernel, strip=strip, lengths=matcher.lengths,
        )
        packed = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((1, w3, tile_n), lambda i: (0, 0, i)),
                pl.BlockSpec(matcher.filt.shape, lambda i: (0, 0)),
                pl.BlockSpec(matcher.digits.shape, lambda i: (0, 0)),
            ],
            **common,
        )(windows, matcher.filt, matcher.digits)
        pack = _PACK

    packed = packed.reshape(b, n_pad)[:, :n]
    match_tok = jnp.where(packed > 0, packed % pack, q + _BYTE_A)
    match_len = jnp.where(packed > 0, packed // pack, 1)
    return match_tok, match_len


# ---------------------------------------------------------------------------
# Greedy-chain kernel


def _chain_kernel(len_ref, out_ref, visit_buf, len_buf, *, tile_rows: int):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        visit_buf[:] = jnp.zeros_like(visit_buf)
        len_buf[:] = jnp.zeros_like(len_buf)

    lanes = out_ref.shape[1]
    # distance from the row in slot s to the current row i:
    # slot s holds absolute row r with r ≡ s (mod 16), r in [i-16, i)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (_WINDOW, lanes), 0)

    def body(r, _):
        i = gi * tile_rows + r
        d = jnp.mod(i - slot_iota - 1, _WINDOW) + 1  # (16, lanes)
        hit = (visit_buf[:] != 0) & (len_buf[:] == d)
        visited = jnp.any(hit, axis=0, keepdims=True).astype(jnp.int32)
        visited = jnp.where(i == 0, jnp.ones_like(visited), visited)
        out_ref[pl.ds(r, 1), :] = visited
        lv = len_ref[pl.ds(r, 1), :]
        slot = jnp.mod(i, _WINDOW)
        visit_buf[pl.ds(slot, 1), :] = visited
        len_buf[pl.ds(slot, 1), :] = lv
        return _

    jax.lax.fori_loop(0, tile_rows, body, 0)


def greedy_chain(match_len, *, tile_rows: int = 2048, interpret: bool = False):
    """(B, N) match lengths -> (B, N) bool visited mask of the greedy
    tokenization chain (positions 0, f(0), f(f(0)), ... per record)."""
    b, n = match_len.shape
    lanes = max(128, -(-b // 128) * 128)
    n_pad = -(-n // tile_rows) * tile_rows
    lt = jnp.pad(
        jnp.swapaxes(match_len.astype(jnp.int32), 0, 1),
        ((0, n_pad - n), (0, lanes - b)),
        constant_values=1,
    )  # (N_pad, lanes)
    kernel = functools.partial(_chain_kernel, tile_rows=tile_rows)
    visited = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, lanes), jnp.int32),
        grid=(n_pad // tile_rows,),
        in_specs=[pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_WINDOW, lanes), jnp.int32),
            pltpu.VMEM((_WINDOW, lanes), jnp.int32),
        ],
        interpret=interpret,
    )(lt)
    return jnp.swapaxes(visited[:n, :b], 0, 1) != 0


# ---------------------------------------------------------------------------
# Full encode


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "max_len", "lengths", "tile_n", "strip", "interpret",
        "use_val", "bwidth", "use_bits",
    ),
)
def _encode_impl(q, filt, digits, pcol, bfilt, width, max_len, lengths,
                 use_val, bwidth, use_bits, tile_n, strip, interpret):
    from ecg_byte_tpu.ops.bpe_encode import _compact

    matcher = PallasMatcher(
        width=width, filt=filt, digits=digits, lengths=lengths,
        max_len=max_len, pcol=pcol, use_val=use_val, bfilt=bfilt,
        bwidth=bwidth, use_bits=use_bits,
    )
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None]
    match_tok, match_len = longest_match(
        q, matcher, tile_n=tile_n, strip=strip, interpret=interpret
    )
    visited = greedy_chain(match_len, interpret=interpret)
    ids, counts = _compact(match_tok, visited)
    if squeeze:
        return ids[0], counts[0]
    return ids, counts


def encode(q, matcher: PallasMatcher, *, tile_n: int | None = None,
           strip: int | None = None, interpret: bool = False):
    """Encode symbol stream(s) to BPE ids on device via the Pallas path.

    Same contract as ops/bpe_encode.encode: ``q`` uint8 [N] or [B, N],
    returns (ids padded with PAD_TOKEN, counts).
    """
    q = jnp.asarray(q)
    return _encode_impl(
        q, matcher.filt, matcher.digits, matcher.pcol, matcher.bfilt,
        matcher.width, matcher.max_len, matcher.lengths, matcher.use_val,
        matcher.bwidth, matcher.use_bits, tile_n, strip, interpret
    )
