"""TPU-parallel greedy longest-match BPE encoding.

The reference encodes each ECG string sequentially on the host with a byte
trie (rust_bpe lib.rs:149-193).  Greedy longest-match tokenization looks
inherently serial, but it decomposes into three data-parallel stages:

1. **Longest match per position** -- the token dictionary is compiled into
   per-width *arithmetic filter banks* and matching becomes one MXU matmul
   per bank via the squared-difference identity

       sum_{j<L} (s[i+j] - t_j)^2 == 0   <=>   token t matches at position i

   expanded into an inner product: per window slot the features are
   ``[s, s^2 >> 4, s^2 & 15]`` (all integers <= 42, bf16-exact) and per
   token the weights are ``[-2*t_j, 16*m_j, m_j]`` with mask ``m_j = 1[j<L]``
   — so ``score = windows @ W`` equals ``sum m*s^2 - 2 sum s*t`` and a hit
   is the single f32-exact compare ``score == -sum t_j^2``.  The contraction
   is 3W instead of the 27W of a one-hot formulation (9x fewer FLOPs, 18x
   fewer im2col bytes); symbols are shifted to 1..26 so the 0-padding past
   the record end can never match.  (length, id) pairs pack into one
   f32-exact weight so a fused compare-select-max epilogue recovers the
   longest token and its id; position/token tiling bounds the transients at
   any record length.  (A gather-based automaton scan is kept as an
   alternative backend: TPU gathers run ~100x slower than this matmul
   formulation, but it is useful on CPU and for cross-checks.)

2. **Greedy chain** -- the tokenization visits ``0, f(0), f(f(0)), ...``
   with ``f(i) = i + match_len[i]``.  Because jumps are bounded by
   ``max_token_len``, reachability is a *banded* recurrence
   ``visit[i] = OR_d visit[i-d] & (match_len[i-d] == d)`` computed by a
   ``lax.scan`` carrying only the last ``max_len`` bits per record --
   thousands of batch records advance one position per step in lockstep.
   (Pointer doubling in ``log N`` scatter rounds is the alternative backend.)

3. **Stream compaction** -- cumsum over the visited mask scatters surviving
   token ids into a dense, left-aligned output plus a length.

All stages are jittable integer/matmul code batched over records.  Output
ids are byte-exact with the reference trie encoder (validated against
csrc/ecgbpe.cpp in tests), including trie-overwrite semantics for duplicate
expanded sequences (the later merge id wins).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ecg_byte_tpu.ops.quantize import NUM_SYMBOLS, _BYTE_A

PAD_SYMBOL = NUM_SYMBOLS  # 26: sentinel fed to the automaton past the end
PAD_TOKEN = -1  # padding value in encoded outputs


class Automaton(NamedTuple):
    """Dense longest-match automaton over the ECG symbol alphabet.

    Attributes:
      trans: int32 [num_states, 27]; ``trans[s, sym]`` is the next state
        (state 0 is the absorbing DEAD state, state 1 the root).
        Column 26 is the padding symbol and always leads to DEAD.
      token: int32 [num_states]; token id if the state is terminal else -1.
      max_len: python int, maximum token length (scan depth).
    """

    trans: jax.Array
    token: jax.Array
    max_len: int


def build_automaton(merges: Sequence[Tuple[Sequence[int], int]]) -> Automaton:
    """Compile reference-format merges into a dense trie automaton.

    Merge sequences are base *byte* values (rust_bpe lib.rs:106-110); only
    bytes in a..z can occur in quantized ECG strings, so tokens containing
    other bytes are unreachable and skipped.  All 26 single symbols are
    terminal with their byte value as token id, matching the single-byte
    fallback of the reference trie (lib.rs:155-157).
    """
    DEAD, ROOT = 0, 1
    trans_rows = [np.zeros(NUM_SYMBOLS + 1, np.int32)]  # DEAD -> DEAD
    trans_rows.append(np.zeros(NUM_SYMBOLS + 1, np.int32))  # ROOT, filled below
    token_list = [-1, -1]

    def new_state() -> int:
        trans_rows.append(np.zeros(NUM_SYMBOLS + 1, np.int32))
        token_list.append(-1)
        return len(trans_rows) - 1

    def insert(symbols: Sequence[int], token_id: int) -> None:
        node = ROOT
        for s in symbols:
            child = trans_rows[node][s]
            if child == DEAD:
                child = new_state()
                trans_rows[node][s] = child
            node = child
        token_list[node] = token_id

    for s in range(NUM_SYMBOLS):
        insert([s], s + _BYTE_A)

    max_len = 1
    for seq, token_id in merges:
        symbols = [int(b) - _BYTE_A for b in seq]
        if any(s < 0 or s >= NUM_SYMBOLS for s in symbols):
            continue  # token contains non-alphabet bytes: unreachable
        insert(symbols, int(token_id))
        max_len = max(max_len, len(symbols))

    trans = np.stack(trans_rows)
    trans[:, PAD_SYMBOL] = DEAD
    return Automaton(
        trans=jnp.asarray(trans),
        token=jnp.asarray(np.asarray(token_list, np.int32)),
        max_len=max_len,
    )


def _longest_match(q: jax.Array, automaton: Automaton) -> Tuple[jax.Array, jax.Array]:
    """For every position i, the longest token starting at i and its length.

    Args:
      q: uint8/int32 [N] symbol stream (values 0..25).
    Returns:
      (match_tok int32 [N], match_len int32 [N]); match_len >= 1 always
      (single symbols are tokens).
    """
    n = q.shape[0]
    trans_flat = automaton.trans.reshape(-1)
    width = automaton.trans.shape[1]

    q_padded = jnp.concatenate(
        [q.astype(jnp.int32), jnp.full((automaton.max_len,), PAD_SYMBOL, jnp.int32)]
    )

    def step(carry, j):
        states, match_tok, match_len = carry
        sym = jax.lax.dynamic_slice(q_padded, (j,), (n,))
        states = jnp.take(trans_flat, states * width + sym)
        tok = jnp.take(automaton.token, states)
        hit = tok >= 0
        match_tok = jnp.where(hit, tok, match_tok)
        match_len = jnp.where(hit, j + 1, match_len)
        return (states, match_tok, match_len), None

    init = (
        jnp.ones((n,), jnp.int32),  # ROOT
        jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), jnp.int32),
    )
    (_, match_tok, match_len), _ = jax.lax.scan(
        step, init, jnp.arange(automaton.max_len)
    )
    return match_tok, match_len


def _greedy_chain(match_len: jax.Array) -> jax.Array:
    """Boolean mask of positions visited by greedy left-to-right chaining.

    ``f(i) = i + match_len[i]``; visited = {0, f(0), f^2(0), ...}.  Computed
    with pointer doubling in ceil(log2(N+1)) rounds.
    """
    n = match_len.shape[0]
    # Extend with a fixpoint at index n so jumps terminate there.
    jump = jnp.minimum(jnp.arange(n, dtype=jnp.int32) + match_len, n)
    jump = jnp.concatenate([jump, jnp.array([n], jnp.int32)])
    reach = jnp.zeros((n + 1,), jnp.bool_).at[0].set(True)

    rounds = max(1, int(np.ceil(np.log2(n + 1))))

    def body(_, state):
        reach, jump = state
        # positions reachable in one more jump from the current reach set
        stepped = jnp.zeros_like(reach).at[jump].max(reach)
        return reach | stepped, jump[jump]

    reach, _ = jax.lax.fori_loop(0, rounds, body, (reach, jump))
    return reach[:n]


# ---------------------------------------------------------------------------
# Conv/MXU matcher backend (the fast path on TPU)


class ConvMatcher(NamedTuple):
    """Per-width arithmetic filter banks compiled from the merge dictionary.

    Attributes:
      banks: tuple of (width, wmat (3*width, T) bf16, negc (T,) f32,
        wpack (T,) f32).  ``wmat`` holds the squared-difference expansion
        weights ``[-2*(t_j+1), 16*m_j, m_j]`` interleaved per window slot;
        ``negc = -sum (t_j+1)^2`` is the per-token hit constant; ``wpack``
        packs ``len * 8192 + id`` (f32-exact for id < 8192, len < 2048).
      max_len: python int, maximum token length.
    """

    banks: Tuple
    max_len: int


def build_matcher(
    merges: Sequence[Tuple[Sequence[int], int]],
    group_widths: Sequence[int] = (4, 8, 16, 32, 64, 128),
) -> ConvMatcher:
    """Compile merges into grouped arithmetic (squared-difference) banks.

    Tokens are grouped by length into shared-width banks (each token
    mask-padded to the group width W): one MXU matmul per bank with
    contraction 3W scores every (position, token) pair exactly (see module
    docstring).  Masked slots carry zero weights so they contribute
    nothing, and windows running past the record end see symbol value 0
    (real symbols are shifted to 1..26), which can never equal a token
    symbol — a short token still matches exactly when (and only when) its
    own symbols agree.

    Duplicate expanded sequences keep the LAST token id, matching the trie's
    insert-overwrite semantics (rust_bpe lib.rs:140-147).
    """
    by_seq = {}
    for seq, token_id in merges:
        symbols = tuple(int(b) - _BYTE_A for b in seq)
        if any(s < 0 or s >= NUM_SYMBOLS for s in symbols):
            continue  # unreachable in quantized ECG strings
        if len(symbols) < 2:
            continue  # single symbols are handled implicitly
        if int(token_id) >= 8192:
            # the fused-max path packs ids into len*8192 + id (f32-exact)
            raise ValueError(
                f"token id {token_id} exceeds the conv matcher's 8191 limit; "
                "use the Automaton backend for vocabularies this large"
            )
        by_seq[symbols] = int(token_id)  # later merges overwrite

    widths = sorted(group_widths)
    longest = max((len(s) for s in by_seq), default=1)
    while widths and widths[-1] < longest:
        widths.append(widths[-1] * 2)

    groups: dict = {}
    max_len = 1
    for symbols, token_id in by_seq.items():
        width = next(w for w in widths if len(symbols) <= w)
        groups.setdefault(width, []).append((symbols, token_id))
        max_len = max(max_len, len(symbols))

    banks = []
    for width in sorted(groups):
        entries = sorted(groups[width], key=lambda e: len(e[0]))
        t = len(entries)
        wmat = np.zeros((3 * width, t), np.float32)
        negc = np.zeros((t,), np.float32)
        wpack = np.zeros((t,), np.float32)
        for col, (symbols, token_id) in enumerate(entries):
            for j, s in enumerate(symbols):
                v = s + 1  # shifted symbol: 1..26 (0 = past-the-end pad)
                wmat[3 * j, col] = -2.0 * v
                wmat[3 * j + 1, col] = 16.0
                wmat[3 * j + 2, col] = 1.0
            negc[col] = -float(sum((s + 1) ** 2 for s in symbols))
            wpack[col] = float(len(symbols) * 8192 + token_id)
        banks.append(
            (
                width,
                jnp.asarray(wmat, jnp.bfloat16),
                jnp.asarray(negc, jnp.float32),
                jnp.asarray(wpack, jnp.float32),
            )
        )
    return ConvMatcher(banks=tuple(banks), max_len=max_len)


def _longest_match_conv(q: jax.Array, matcher: ConvMatcher):
    """Batched longest match via MXU convolutions.

    q: int [B, N] symbols -> (match_tok (B, N) int32, match_len (B, N) int32).
    """
    b, n = q.shape
    max_width = max((bank[0] for bank in matcher.banks), default=1)
    # Shift symbols to 1..26 and zero-pad max_width-1 trailing positions:
    # (0 - t)^2 > 0 for every real token symbol, so windows running past the
    # record end can never complete a match.
    s = jnp.pad(q.astype(jnp.int32) + 1, ((0, 0), (0, max_width - 1)))
    sq = s * s
    # bf16-exact integer features (values <= 42); interleaved [s, hi, lo]
    # per slot to match the build_matcher weight-row order.
    feat = jnp.stack(
        [s, jax.lax.shift_right_logical(sq, 4), jnp.bitwise_and(sq, 15)],
        axis=-1,
    ).astype(jnp.bfloat16)  # (B, N + max_width - 1, 3)

    # Tile the position axis and slice the token axis so the transients
    # (windows im2col + f32 score) stay within a fixed memory budget
    # regardless of record length and vocab size.  "Longer match wins"
    # merging makes the result independent of tile/slice/bank order.
    tile_n = max(512, min(n, _MATCH_BYTES_BUDGET // max(b * 4 * 512, 1)))
    tok_parts = []
    len_parts = []
    for p0 in range(0, n, tile_n):
        pn = min(tile_n, n - p0)
        tok_run = q[:, p0 : p0 + pn].astype(jnp.int32) + _BYTE_A
        len_run = jnp.ones((b, pn), jnp.int32)
        for width, wmat, negc, wpack in matcher.banks:
            # im2col over this tile only: (B, pn, 3W) bf16 — 9x fewer
            # contraction rows and 18x fewer window bytes than a one-hot
            # filter-bank formulation of the same match.
            windows = jnp.concatenate(
                [feat[:, p0 + j : p0 + j + pn] for j in range(width)], axis=-1
            )
            t_total = wmat.shape[1]
            t_slice = max(256, _MATCH_BYTES_BUDGET // max(b * pn * 4, 1))
            for t0 in range(0, t_total, t_slice):
                w_sl = wmat[:, t0 : t0 + t_slice]
                score = jax.lax.dot_general(
                    windows, w_sl, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (B, pn, t) f32; exact integer sums (|score| < 2^24)
                hit = score == negc[None, None, t0 : t0 + t_slice]
                # packed (length, id) weight: len * 2^13 + id stays exactly
                # representable in f32, so ONE fused compare+select+max pass
                # recovers both the longest length and its token id
                val = jnp.max(
                    jnp.where(hit, wpack[None, None, t0 : t0 + t_slice], 0.0),
                    axis=-1,
                )  # (B, pn) f32: longest match's (len, id), 0 if none
                best_len = jnp.floor_divide(val, 8192.0).astype(jnp.int32)
                tok = jnp.mod(val, 8192.0).astype(jnp.int32)
                better = best_len > len_run
                tok_run = jnp.where(better, tok, tok_run)
                len_run = jnp.where(better, best_len, len_run)
        tok_parts.append(tok_run)
        len_parts.append(len_run)
    match_tok = jnp.concatenate(tok_parts, axis=1)
    match_len = jnp.concatenate(len_parts, axis=1)
    return match_tok, match_len


def _greedy_chain_scan(match_len: jax.Array, max_len: int) -> jax.Array:
    """Banded greedy-chain recurrence over the batch.

    match_len: (B, N) with values in [1, max_len].  visited[i] depends only
    on the previous ``max_len`` positions, so a scan over N carries a
    (B, max_len) window: visited[i] = OR_d window[d] & (len[i-d] == d).
    """
    b, n = match_len.shape
    w = max(int(max_len), 1)
    # len_window[d-1] holds match_len[i-d]; offsets constant per slot
    offsets = jnp.arange(1, w + 1, dtype=jnp.int32)  # (w,)

    def step(carry, ml_i):
        visit_win, len_win = carry  # (B, w) each; slot d-1 = position i-d
        visited_i = jnp.any(visit_win & (len_win == offsets[None, :]), axis=1)
        visit_win = jnp.concatenate([visited_i[:, None], visit_win[:, : w - 1]], 1)
        len_win = jnp.concatenate([ml_i[:, None], len_win[:, : w - 1]], 1)
        return (visit_win, len_win), visited_i

    # position 0 is always visited; seed the window as if position -1 jumped
    # to 0 — simpler: run the scan from position 1 with window holding pos 0.
    visit0 = jnp.ones((b,), jnp.bool_)
    visit_win = jnp.zeros((b, w), jnp.bool_).at[:, 0].set(True)
    len_win = jnp.zeros((b, w), jnp.int32).at[:, 0].set(match_len[:, 0])
    (_, _), visited_rest = jax.lax.scan(
        step, (visit_win, len_win), jnp.swapaxes(match_len[:, 1:], 0, 1),
        unroll=64,
    )
    visited = jnp.concatenate(
        [visit0[:, None], jnp.swapaxes(visited_rest, 0, 1)], axis=1
    )
    return visited


def _compact(match_tok, visited):
    """Left-align visited tokens; returns (ids, counts).

    Formulated as a PACKED single-array sort: token ids fit 13 bits
    (< 8192, the _PACK invariant) and the survivor-ordering key fits the
    remaining high bits, so ``pos << 13 | tok`` sorts by position with the
    payload riding along — ONE int32 stream through TPU's sort network
    instead of the (key, value) pair of ``sort_key_val``.  Halving the
    bytes per compare-exchange pass measured 15.3 -> ~8 ms per 256x30k
    batch on v5e (see _compact_sort_kv for the pair formulation and
    _compact_scan_gather for the round-4 prefix-sum+gather experiment —
    both kept for the measured comparison in BASELINE.md).

    Non-visited positions shift their key by N so survivors sort to the
    front in original order; keys are distinct, so the sort is
    deterministic and output-identical to the pair sort.
    """
    b, n = match_tok.shape
    if 2 * n << 13 <= 2**31:  # packed key fits int32 (n < 2^17)
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
        key = jnp.where(visited, pos, pos + n)
        packed = (key << 13) | match_tok.astype(jnp.int32)
        sorted_packed = jax.lax.sort(packed, dimension=1)
        sorted_tok = sorted_packed & 0x1FFF
    else:  # very long streams: fall back to the pair sort
        return _compact_sort_kv(match_tok, visited)
    counts = jnp.sum(visited.astype(jnp.int32), axis=1)
    ids = jnp.where(
        jnp.arange(n, dtype=jnp.int32)[None] < counts[:, None],
        sorted_tok,
        PAD_TOKEN,
    )
    return ids, counts


def _compact_sort_kv(match_tok, visited):
    """(key, value) pair-sort compaction — the round-3 formulation.

    15.7 ms per 256x30k batch vs 53.8 ms for cumsum+scatter (scatter is
    gather-class on TPU); superseded by the packed sort in :func:`_compact`
    but kept as the wide-stream fallback and measurement baseline.
    """
    b, n = match_tok.shape
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    key = jnp.where(visited, pos, pos + n)
    _, sorted_tok = jax.lax.sort_key_val(key, match_tok, dimension=1)
    counts = jnp.sum(visited.astype(jnp.int32), axis=1)
    ids = jnp.where(
        jnp.arange(n, dtype=jnp.int32)[None] < counts[:, None],
        sorted_tok,
        PAD_TOKEN,
    )
    return ids, counts


def _compact_scan_gather(match_tok, visited, block: int = 2048):
    """Prefix-sum + blocked gather compaction (round-4 experiment).

    Two-level: pack survivors to the front of each ``block``-wide tile
    with a SHORT sort (log(block) compare-exchange passes instead of
    log(N)), then assemble tiles with one take_along_axis whose indices
    come from a cumsum over per-tile survivor counts — the
    ``associative_scan`` formulation suggested in round 3's review.
    Output-identical to :func:`_compact`; kept for the recorded
    measurement either way.
    """
    b, n = match_tok.shape
    nb = -(-n // block)
    n_pad = nb * block
    tok = jnp.pad(match_tok, ((0, 0), (0, n_pad - n)))
    vis = jnp.pad(visited, ((0, 0), (0, n_pad - n)))
    tok_t = tok.reshape(b * nb, block)
    vis_t = vis.reshape(b * nb, block)
    # intra-tile compaction (short packed sort)
    pos = jnp.broadcast_to(
        jnp.arange(block, dtype=jnp.int32)[None], tok_t.shape
    )
    key = jnp.where(vis_t, pos, pos + block)
    packed = (key << 13) | tok_t.astype(jnp.int32)
    front = (jax.lax.sort(packed, dimension=1) & 0x1FFF).reshape(b, nb, block)
    # tile offsets: exclusive prefix over per-tile survivor counts
    tile_counts = jnp.sum(vis_t.astype(jnp.int32), axis=1).reshape(b, nb)
    prefix = jnp.cumsum(tile_counts, axis=1) - tile_counts  # (b, nb)
    # global index j reads tile k(j) at local offset j - prefix[k(j)]:
    # k(j) = #tiles whose prefix <= j, minus one — a broadcast compare-sum,
    # no gather needed to FIND the tile
    j = jnp.arange(n_pad, dtype=jnp.int32)[None, :]  # (1, N)
    k = jnp.sum(
        (prefix[:, :, None] <= j[:, None, :]), axis=1
    ).astype(jnp.int32) - 1  # (b, N)
    k = jnp.clip(k, 0, nb - 1)
    local = j - jnp.take_along_axis(prefix, k, axis=1)
    flat_idx = k * block + jnp.clip(local, 0, block - 1)
    gathered = jnp.take_along_axis(
        front.reshape(b, nb * block), flat_idx, axis=1
    )[:, :n]
    counts = jnp.sum(visited.astype(jnp.int32), axis=1)
    ids = jnp.where(
        jnp.arange(n, dtype=jnp.int32)[None] < counts[:, None],
        gathered,
        PAD_TOKEN,
    )
    return ids, counts


_MATCH_BYTES_BUDGET = 64 << 20  # cap the transient score tiles (64 MB swept fastest on v5e)


@functools.lru_cache(maxsize=1)
def _pallas_chain_available() -> bool:
    try:
        devs = jax.devices()
    except RuntimeError:
        return False
    return bool(devs) and devs[0].platform in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("matcher_max_len", "banks_meta"))
def _encode_conv_impl(q, bank_arrays, matcher_max_len, banks_meta):
    banks = tuple(
        (length,) + arrays for length, arrays in zip(banks_meta, bank_arrays)
    )
    matcher = ConvMatcher(banks=banks, max_len=matcher_max_len)
    squeeze = q.ndim == 1
    if squeeze:
        q = q[None]
    match_tok, match_len = _longest_match_conv(q, matcher)
    from ecg_byte_tpu.ops import bpe_match

    if _pallas_chain_available() and matcher.max_len <= bpe_match._WINDOW:
        # in-kernel rolling-window chain: 5.9 ms vs 9.4 ms for the XLA scan
        # per 256x30k batch on v5e (one hardware loop vs N scan steps)
        visited = bpe_match.greedy_chain(match_len)
    else:
        visited = _greedy_chain_scan(match_len, matcher.max_len)
    ids, counts = _compact(match_tok, visited)
    if squeeze:
        return ids[0], counts[0]
    return ids, counts


@functools.partial(jax.jit, static_argnames=("automaton_max_len",))
def _encode_impl(q, trans, token, automaton_max_len):
    automaton = Automaton(trans=trans, token=token, max_len=automaton_max_len)

    def one(qi):
        match_tok, match_len = _longest_match(qi, automaton)
        visited = _greedy_chain(match_len)
        return match_tok, visited

    # the automaton backend has no 8191 id cap, so the 13-bit packed
    # compaction cannot host it — use the pair sort
    if q.ndim == 1:
        match_tok, visited = one(q)
        ids, counts = _compact_sort_kv(match_tok[None], visited[None])
        return ids[0], counts[0]
    match_tok, visited = jax.vmap(one)(q)
    return _compact_sort_kv(match_tok, visited)


def build_best_matcher(merges: Sequence[Tuple[Sequence[int], int]]):
    """Fastest matcher this process can host: the Pallas arithmetic kernel
    on TPU when the vocabulary fits its window (its (N, T) score strip
    never touches HBM), else the XLA conv/arithmetic bank matcher."""
    if _pallas_chain_available():
        from ecg_byte_tpu.ops import bpe_match

        try:
            return bpe_match.build_pallas_matcher(merges)
        except ValueError:
            pass  # token too long / id too large for the kernel tables
    return build_matcher(merges)


def encode(q, matcher):
    """Encode symbol stream(s) into BPE token ids on device.

    Args:
      q: uint8 [N] or [B, N] quantized symbols (0..25).
      matcher: a :class:`bpe_match.PallasMatcher` (fastest on TPU), a
        :class:`ConvMatcher` (XLA MXU path), or :class:`Automaton`
        (gather-based alternative backend).

    Returns:
      ``(ids, counts)`` — ids int32 like ``q`` padded with ``PAD_TOKEN``;
      ``counts`` the number of valid tokens per stream.
    """
    q = jnp.asarray(q)
    if isinstance(matcher, ConvMatcher):
        banks_meta = tuple(b[0] for b in matcher.banks)
        bank_arrays = tuple(b[1:] for b in matcher.banks)
        return _encode_conv_impl(q, bank_arrays, matcher.max_len, banks_meta)
    if isinstance(matcher, Automaton):
        return _encode_impl(q, matcher.trans, matcher.token, matcher.max_len)
    from ecg_byte_tpu.ops import bpe_match

    return bpe_match.encode(q, matcher)


def quantize_and_encode(signal, p1, p99, matcher):
    """Fused preprocess headline op: float ECG -> BPE token ids, on device.

    ``signal``: float [B, 12, L] (or [12, L]).  Flattens leads row-major into
    one symbol stream per record (data_loader.py:74-76 semantics) and encodes.
    """
    from ecg_byte_tpu.ops.quantize import normalize_quantize

    signal = jnp.asarray(signal)
    batched = signal.ndim == 3
    _, q = normalize_quantize(signal, p1, p99)
    q = q.reshape((q.shape[0], -1) if batched else (-1,))
    return encode(q, matcher)
