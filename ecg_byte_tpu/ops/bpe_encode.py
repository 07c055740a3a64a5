"""TPU-parallel greedy longest-match BPE encoding.

The reference encodes each ECG string sequentially on the host with a byte
trie (rust_bpe lib.rs:149-193).  Greedy longest-match tokenization looks
inherently serial, but it decomposes into three data-parallel stages that map
cleanly onto the VPU:

1. **Longest match per position** — compile the merge trie into a dense
   automaton over the 26-letter ECG alphabet (+1 padding symbol) and advance
   all N positions' states simultaneously for ``max_token_len`` steps
   (a ``lax.scan`` of vectorized gathers).  After the scan, position ``i``
   knows the longest token starting at ``i`` and its id.

2. **Greedy chain via pointer doubling** — the tokenization visits positions
   ``0, f(0), f(f(0)), ...`` where ``f(i) = i + match_len[i]``.  The visited
   set is computed in ``ceil(log2 N)`` scatter/gather rounds instead of N
   sequential steps.

3. **Stream compaction** — a cumsum over the visited mask scatters the
   surviving token ids into a dense, left-aligned output with a length.

All stages are jittable, differentiable-free integer code, and ``vmap`` over
a batch of equal-length symbol streams.  Output ids are byte-exact with the
reference trie encoder (validated against csrc/ecgbpe.cpp in tests).
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


@functools.partial(jax.jit, static_argnames=("automaton_max_len",))
def _encode_impl(q, trans, token, automaton_max_len):
    automaton = Automaton(trans=trans, token=token, max_len=automaton_max_len)

    def one(qi):
        match_tok, match_len = _longest_match(qi, automaton)
        visited = _greedy_chain(match_len)
        n = qi.shape[0]
        #

        # Compact: scatter visited tokens to their output slot; everything
        # else lands in the scratch slot n (dropped).
        out_idx = jnp.where(visited, jnp.cumsum(visited) - 1, n)
        ids = (
            jnp.full((n + 1,), PAD_TOKEN, jnp.int32)
            .at[out_idx]
            .set(jnp.where(visited, match_tok, PAD_TOKEN))[:n]
        )
        count = jnp.sum(visited.astype(jnp.int32))
        return ids, count

    if q.ndim == 1:
        return one(q)
    return jax.vmap(one)(q)


def encode(q, automaton: Automaton):
    """Encode symbol stream(s) into BPE token ids on device.

    Args:
      q: uint8 [N] or [B, N] quantized symbols (0..25).
      automaton: from :func:`build_automaton`.

    Returns:
      ``(ids, counts)`` — ids int32 like ``q`` padded with ``PAD_TOKEN``;
      ``counts`` the number of valid tokens per stream.
    """
    return _encode_impl(
        jnp.asarray(q), automaton.trans, automaton.token, automaton.max_len
    )


def quantize_and_encode(signal, p1, p99, automaton: Automaton):
    """Fused preprocess headline op: float ECG -> BPE token ids, on device.

    ``signal``: float [B, 12, L] (or [12, L]).  Flattens leads row-major into
    one symbol stream per record (data_loader.py:74-76 semantics) and encodes.
    """
    from ecg_byte_tpu.ops.quantize import normalize_quantize

    signal = jnp.asarray(signal)
    batched = signal.ndim == 3
    _, q = normalize_quantize(signal, p1, p99)
    q = q.reshape((q.shape[0], -1) if batched else (-1,))
    return encode(q, automaton)
