"""Batched CTC prefix beam search on the TPU.

The reference decodes with host-side C++ (pyctcdecode + KenLM,
tone/decoder.py:108-133) — one phrase at a time, sequential in frames and
beams.  That architecture caps a serving host at a few thousand streams of
decode behind a chip that sustains ~18k streams (docs/performance.md).  This
op restructures the search TPU-first:

* all streams and all beams advance together — one jitted step per frame
  batch, vectorized over (B, W, V);
* prefix merging (the "prefix" in prefix beam search) is done by 64-bit
  rolling hashes of the collapsed text: candidates are sorted by hash and
  merged with a segmented log-sum-exp, all on device;
* hypotheses are recovered from per-frame backpointers; the host only
  assembles strings (and optionally rescores the n-best list with the word
  n-gram LM — see tone_tpu.decoding.rescore — the shallow-fusion α/β
  scoring applied per completed hypothesis instead of per frame).

Semantics match the host implementations (tone_tpu/decoding/beam.py and the
C++ decoder) run without an LM: the same expansion rules, the same
(text, partial, last_char) merge identity, the same ``token_min_logp``
pruning with the frame argmax always kept.  tests/test_beam_decode.py
asserts decoded-text equality against the host search.

The search state is an explicit pytree (like the model's streaming state),
so it can be carried across chunk boundaries: ``beam_advance`` consumes any
number of frames and is exactly chunk-split invariant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import BLANK_ID, LABELS

SPACE_ID = LABELS.index(" ")
NEG_INF = float("-inf")


class BeamState(NamedTuple):
    """Carried search state for a batch of streams.

    Shapes: (B, W) scalars per beam; ``tokens``/(B, W, L) holds the
    collapsed token ids of each hypothesis so far (L caps the phrase
    length; the splitter force-splits at 2000 frames so text can't grow
    unboundedly).
    """

    p_b: jnp.ndarray    # log P(prefix, ends in blank)
    p_nb: jnp.ndarray   # log P(prefix, ends in non-blank)
    h1: jnp.ndarray     # rolling hash of the collapsed text (two u32 words)
    h2: jnp.ndarray
    lc: jnp.ndarray     # last emitted char id; -1 = none yet
    tokens: jnp.ndarray
    lens: jnp.ndarray

    @property
    def totals(self) -> jnp.ndarray:
        return jnp.logaddexp(self.p_b, self.p_nb)


def init_beam_state(batch: int, beam_width: int, max_len: int = 2048) -> BeamState:
    """Fresh state: beam 0 is the empty hypothesis, the rest are -inf
    placeholders with distinct hashes (so they can never merge with a live
    beam)."""
    w = np.arange(beam_width, dtype=np.uint32)
    h1 = np.where(w == 0, np.uint32(0x811C9DC5), w * np.uint32(0x9E3779B9) + 7)
    h2 = np.where(w == 0, np.uint32(0x85EBCA6B), w * np.uint32(0xC2B2AE35) + 11)
    zeros = jnp.zeros((batch, beam_width), jnp.float32)
    first = (jnp.arange(beam_width) == 0)[None, :]
    return BeamState(
        p_b=jnp.where(first, 0.0, NEG_INF) + zeros,
        p_nb=jnp.full((batch, beam_width), NEG_INF, jnp.float32),
        h1=jnp.broadcast_to(jnp.asarray(h1), (batch, beam_width)),
        h2=jnp.broadcast_to(jnp.asarray(h2), (batch, beam_width)),
        lc=jnp.full((batch, beam_width), -1, jnp.int32),
        # int8: token ids are < 35; the default cap covers the longest
        # possible phrase (the splitter force-splits at 2000 frames, and a
        # phrase emits at most one token per frame)
        tokens=jnp.zeros((batch, beam_width, max_len), jnp.int8),
        lens=jnp.zeros((batch, beam_width), jnp.int32),
    )


def _mix(h1, h2, v):
    """Extend the rolling hash with token id ``v`` (content-addressed: equal
    collapsed texts always hash equal, independent of the search path)."""
    u = (v + 1).astype(jnp.uint32)
    return (h1 * jnp.uint32(1000003)) ^ u, (h2 * jnp.uint32(2654435761)) + u


def _hw_expand(hw, hw_node, hw_tent, hw_bias, is_space, lead_space):
    """Hotword automaton step for every (beam, char) expansion.  Exactly
    HotwordScorer.step (tone_tpu/decoding/hotwords.py) — including the
    Aho–Corasick word-aligned suffix rematch — which is possible as three
    dense per-(node, char) gathers because on any reachable active node
    the tentative boost is the precomputed ``tent_after`` value (the
    invariant documented in hotwords.py).  Parked (-1) until the next
    boundary; a collapsed (empty-word) space doesn't step.  Returns
    (node, tentative, bias) of shape (B, W, V-1)."""
    parked = (hw_node < 0)[:, :, None]                       # (B, W, 1)
    safe = jnp.clip(hw_node, 0, None)
    if hw.next_node.ndim == 3:
        # PER-ROW tables (B, n_nodes, n_char): each batch row runs its own
        # automaton — one device call serves many differently-biased
        # streams (stack_hotword_tables).  take_along_axis broadcasts the
        # (B, W, 1) node indices against the char axis.
        take = lambda t: jnp.take_along_axis(t, safe[:, :, None], axis=1)
        nxt, tnt, dlt = take(hw.next_node), take(hw.tent_after), take(hw.delta)
    else:
        nxt = jnp.take(hw.next_node, safe, axis=0)           # (B, W, n_char)
        tnt = jnp.take(hw.tent_after, safe, axis=0)
        dlt = jnp.take(hw.delta, safe, axis=0)
    t3 = hw_tent[:, :, None]
    node3 = hw_node[:, :, None]
    # parked: stay mid-word; a space rearms at the root
    exp_node = jnp.where(parked, jnp.where(is_space, 0, node3), nxt)
    exp_tent = jnp.where(parked, 0.0, tnt)
    exp_delta = jnp.where(parked, 0.0, dlt)
    # collapsed spaces (lead_space; space-after-space is dead anyway) emit
    # no text: no automaton step
    exp_node = jnp.where(lead_space, node3, exp_node)
    exp_tent = jnp.where(lead_space, t3, exp_tent)
    exp_delta = jnp.where(lead_space, 0.0, exp_delta)
    return exp_node, exp_tent, hw_bias[:, :, None] + exp_delta


def _frame_step(carry, xs, *, token_min_logp, hw=None):
    """One frame of prefix beam search for the whole batch.

    ``hw`` (a :class:`HotwordTables`) switches in contextual biasing: the
    carry grows (node, tentative, bias) per beam — the device twin of the
    host hotword automaton (tone_tpu/decoding/hotwords.py) — and ranking
    uses ``logaddexp(p_b, p_nb) + bias``.  The per-character boost must be
    in the ranking BEFORE pruning (that is the point of biasing), so the
    automaton steps for all (W, V-1) expansions via one dense-trie row
    gather per beam — unlike the fused LM path, whose expensive lookups are
    deferred to the W survivors."""
    if hw is None:
        p_b, p_nb, h1, h2, lc = carry
    else:
        p_b, p_nb, h1, h2, lc, hw_node, hw_tent, hw_bias = carry
    frame, active = xs                      # (B, V), (B,)
    b_sz, w = p_b.shape
    v_total = frame.shape[-1]
    n_char = v_total - 1                    # non-blank tokens 0..V-2

    ptot = jnp.logaddexp(p_b, p_nb)
    amax = jnp.argmax(frame, axis=-1)
    tokmask = (frame >= token_min_logp) | (
        jnp.arange(v_total)[None, :] == amax[:, None])
    p = jnp.where(tokmask, frame, NEG_INF)  # (B, V)

    # --- self candidates: identity unchanged (blank / run-extension) -------
    p_blank = p[:, BLANK_ID][:, None]
    p_at_lc = jnp.take_along_axis(p, jnp.clip(lc, 0, v_total - 1), axis=1)
    p_at_lc = jnp.where(lc >= 0, p_at_lc, NEG_INF)
    self_pb = ptot + p_blank
    # lc == space: the p_b-sourced re-space collapses into the same prefix
    # (empty word), so the whole mass moves: p_total + p[space].
    self_pnb = jnp.where(lc == SPACE_ID, ptot + p_at_lc, p_nb + p_at_lc)

    # --- expansion candidates: (B, W, V-1) ---------------------------------
    v_ids = jnp.arange(n_char, dtype=jnp.int32)
    pv = p[:, :n_char][:, None, :]                       # (B, 1, V-1)
    is_rep = v_ids[None, None, :] == lc[:, :, None]      # repeat char
    src = jnp.where(is_rep, p_b[:, :, None], ptot[:, :, None])
    exp_pnb = src + pv
    is_space = (v_ids == SPACE_ID)[None, None, :]
    lead_space = is_space & (lc == -1)[:, :, None]       # empty text + space
    h1x, h2x = _mix(h1[:, :, None], h2[:, :, None], v_ids[None, None, :])
    exp_h1 = jnp.where(lead_space, h1[:, :, None], h1x)
    exp_h2 = jnp.where(lead_space, h2[:, :, None], h2x)
    exp_lc = jnp.broadcast_to(v_ids[None, None, :], exp_pnb.shape)
    exp_e = jnp.where(lead_space, -1, exp_lc)
    # space-after-space already lives in the self candidate
    exp_pnb = jnp.where(is_space & (lc == SPACE_ID)[:, :, None],
                        NEG_INF, exp_pnb)

    if hw is not None:
        exp_node, exp_tent, exp_bias = _hw_expand(
            hw, hw_node, hw_tent, hw_bias, is_space, lead_space)

    # --- merge extensions that share a parent text -------------------------
    # Two live beams can carry the same collapsed text only when that text
    # is empty: identity = (hash(text), lc-is-space flag), and for any
    # non-empty text the flag is determined by the last character — so the
    # one possible "twin" pair is the empty beam (lc=-1) and the
    # leading-space beam (lc=space).  Their char extensions produce the
    # same new text and must merge (the host search's dict does); fold the
    # higher-indexed twin's extension mass into the lower's.
    same_h = ((h1[:, :, None] == h1[:, None, :])
              & (h2[:, :, None] == h2[:, None, :]))
    upper = jnp.arange(w)[None, :, None] < jnp.arange(w)[None, None, :]
    donates = same_h & upper                               # (B, Wj, Wi): i→j
    # At most one real twin pair can exist (only the empty text repeats),
    # so each receiver has at most one live donor — a gather suffices.
    has_donor = donates.any(axis=2)                        # (B, Wj)
    donor_idx = jnp.argmax(donates, axis=2)                # (B, Wj)
    donated = jnp.take_along_axis(exp_pnb, donor_idx[:, :, None], axis=1)
    donated = jnp.where(has_donor[:, :, None], donated, NEG_INF)
    char_ext = ~is_space                                   # space exts merge
    exp_pnb = jnp.where(char_ext,                          # via self/lead paths
                        jnp.logaddexp(exp_pnb, donated), exp_pnb)
    donor = donates.any(axis=1)                            # (B, Wi)
    exp_pnb = jnp.where(donor[:, :, None] & char_ext, NEG_INF, exp_pnb)

    # --- merge extensions into selves --------------------------------------
    # With twins folded, remaining beams have distinct texts, so two
    # extension candidates can never produce the same text, and an
    # extension can coincide with at most one *self* candidate (the beam
    # whose text already equals parent-text + char).  Merging therefore
    # reduces to a (W·(V-1)) × W identity match — no sort needed.
    n_ext = w * n_char
    flat = lambda a: a.reshape(b_sz, n_ext)
    e_h1, e_h2 = flat(exp_h1), flat(exp_h2)
    e_lc, e_e = flat(exp_lc), flat(exp_e)
    e_pnb = flat(exp_pnb)
    e_flag = e_lc == SPACE_ID
    s_flag = lc == SPACE_ID
    match = ((e_h1[:, None, :] == h1[:, :, None])
             & (e_h2[:, None, :] == h2[:, :, None])
             & (e_flag[:, None, :] == s_flag[:, :, None]))    # (B, W, E)
    contrib = jnp.where(match, e_pnb[:, None, :], NEG_INF)
    m_self_pnb = jnp.logaddexp(self_pnb, jax.nn.logsumexp(contrib, axis=-1))
    e_pnb = jnp.where(match.any(axis=1), NEG_INF, e_pnb)

    # --- flatten to C = W + W*(V-1) candidates (selves first) --------------
    iota_w32 = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                                (b_sz, w))
    e_parent = flat(jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.int32)[None, :, None], exp_pnb.shape))
    ccat = lambda s, e: jnp.concatenate([s, e], axis=1)
    c_h1, c_h2 = ccat(h1, e_h1), ccat(h2, e_h2)
    c_lc = ccat(lc, e_lc)
    c_pb = ccat(self_pb, jnp.full_like(e_pnb, NEG_INF))
    c_pnb = ccat(m_self_pnb, e_pnb)
    c_parent = ccat(iota_w32, e_parent)
    c_e = ccat(jnp.full((b_sz, w), -1, jnp.int32), e_e)
    tot = jnp.logaddexp(c_pb, c_pnb)
    if hw is not None:
        c_node = ccat(hw_node, flat(exp_node))
        c_tent = ccat(hw_tent, flat(exp_tent))
        c_bias = ccat(hw_bias, flat(exp_bias))
        tot = tot + c_bias
    m_pb, m_pnb = c_pb, c_pnb

    # --- keep the best W ---------------------------------------------------
    _, idx = jax.lax.top_k(tot, w)
    take = lambda a: jnp.take_along_axis(a, idx, axis=1)
    n_pb, n_pnb = take(m_pb), take(m_pnb)
    n_h1, n_h2, n_lc = take(c_h1), take(c_h2), take(c_lc)
    n_parent, n_e = take(c_parent), take(c_e)

    # inactive streams: state unchanged, identity backpointers
    keep = active[:, None]
    iota_w = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                              (b_sz, w))
    out_parent = jnp.where(keep, n_parent, iota_w)
    out_e = jnp.where(keep, n_e, -1)
    carry = (
        jnp.where(keep, n_pb, p_b),
        jnp.where(keep, n_pnb, p_nb),
        jnp.where(keep, n_h1, h1),
        jnp.where(keep, n_h2, h2),
        jnp.where(keep, n_lc, lc),
    )
    if hw is not None:
        carry = carry + (
            jnp.where(keep, take(c_node), hw_node),
            jnp.where(keep, take(c_tent), hw_tent),
            jnp.where(keep, take(c_bias), hw_bias),
        )
    return carry, (out_parent, out_e)


def _backtrack_and_splice(tokens0, lens0, parents, emits):
    """Recover each surviving beam's emitted tokens from the per-frame
    backpointers and splice them onto its origin beam's buffer.  Shared by
    the LM-free and fused advances (identical semantics)."""
    t_steps, b_sz, w = parents.shape
    l_max = tokens0.shape[-1]

    def back(w_cur, pe):
        parent_t, emit_t = pe
        e = jnp.take_along_axis(emit_t, w_cur, axis=1)
        return jnp.take_along_axis(parent_t, w_cur, axis=1), e

    iota_w = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                              (b_sz, w))
    w0, es = jax.lax.scan(back, iota_w, (parents, emits), reverse=True)

    base = jnp.take_along_axis(lens0, w0, axis=1)
    old = jnp.take_along_axis(tokens0, w0[:, :, None], axis=1)
    es = jnp.moveaxis(es, 0, 2)                                   # (B, W, T)
    emask = es >= 0
    offs = jnp.cumsum(emask, axis=2) - emask
    pos = base[:, :, None] + offs
    pos = jnp.where(emask & (pos < l_max), pos, l_max)            # drop OOB
    b_idx = jnp.arange(b_sz)[:, None, None]
    w_idx = jnp.arange(w)[None, :, None]
    tokens = old.at[b_idx, w_idx, pos].set(es.astype(jnp.int8), mode="drop")
    lens = jnp.minimum(base + emask.sum(axis=2), l_max).astype(jnp.int32)
    return tokens, lens


def _advance(state: BeamState, logprobs, active, token_min_logp) -> BeamState:
    b_sz, t_max, _ = logprobs.shape
    w = state.p_b.shape[1]

    carry = (state.p_b, state.p_nb, state.h1, state.h2, state.lc)
    step = lambda c, xs: _frame_step(c, xs, token_min_logp=token_min_logp)
    carry, (parents, emits) = jax.lax.scan(
        step, carry,
        (jnp.swapaxes(logprobs, 0, 1), jnp.swapaxes(active, 0, 1)))
    p_b, p_nb, h1, h2, lc = carry
    tokens, lens = _backtrack_and_splice(state.tokens, state.lens,
                                         parents, emits)
    return BeamState(p_b, p_nb, h1, h2, lc, tokens, lens)


_advance_jit = jax.jit(_advance)


def beam_advance(
    state: BeamState,
    logprobs,
    lengths=None,
    *,
    token_min_logp: float = -5.0,
) -> BeamState:
    """Consume (B, T, V) log-probability frames (natural log).

    ``lengths`` (B,) masks per-stream padding frames: frames at ``t >=
    lengths[b]`` leave that stream's state exactly unchanged, so a padded
    batch decodes identically to per-stream calls.
    """
    logprobs = jnp.asarray(logprobs, jnp.float32)
    b_sz, t_max, _ = logprobs.shape
    if lengths is None:
        active = jnp.ones((b_sz, t_max), bool)
    else:
        active = jnp.arange(t_max)[None, :] < jnp.asarray(lengths)[:, None]
    return _advance_jit(state, logprobs, active,
                        jnp.float32(token_min_logp))


def beam_nbest(state: BeamState, n: int = 1) -> list[list[tuple[str, float]]]:
    """Host-side readout: per stream, up to ``n`` (text, acoustic_logp)
    pairs, best first.  -inf placeholder beams are dropped."""
    totals = np.asarray(state.totals)
    tokens = np.asarray(state.tokens)
    lens = np.asarray(state.lens)
    out = []
    for b in range(totals.shape[0]):
        order = np.argsort(-totals[b], kind="stable")[:n]
        hyps = []
        for wi in order:
            if not np.isfinite(totals[b, wi]):
                continue
            ids = tokens[b, wi, :lens[b, wi]]
            hyps.append(("".join(LABELS[i] for i in ids).strip(),
                         float(totals[b, wi])))
        out.append(hyps)
    return out


def beam_search_decode(
    logprobs,
    lengths=None,
    *,
    beam_width: int = 16,
    token_min_logp: float = -5.0,
    max_len: int = 2048,
) -> list[str]:
    """Decode a batch of (B, T, V) logprobs to texts on device (the
    beam-search counterpart of :func:`batched_greedy_decode`)."""
    logprobs = jnp.asarray(logprobs, jnp.float32)
    state = init_beam_state(logprobs.shape[0], beam_width, max_len)
    state = beam_advance(state, logprobs, lengths,
                         token_min_logp=token_min_logp)
    return [hyps[0][0] if hyps else "" for hyps in beam_nbest(state, 1)]


# ---------------------------------------------------------------------------
# Carried-state serving primitives: per-slot reset + top-hypothesis readout.
# Together with beam_advance these make the search a device-resident arena
# alongside the acoustic state arena: the serving engine advances all slots'
# beams once per tick and resets slots at phrase boundaries, the TPU-native
# form of the per-stream host StreamingBeamSearch used for interim
# transcripts (tone_tpu/runtime/engine.py).
# ---------------------------------------------------------------------------


@jax.jit
def beam_reset(state: BeamState, mask) -> BeamState:
    """Reset masked streams to the fresh empty-hypothesis state (the
    device analog of ``StreamingBeamSearch.reset()``); others unchanged."""
    batch, w = state.p_b.shape
    fresh = init_beam_state(batch, w, state.tokens.shape[-1])
    mask = jnp.asarray(mask)
    m2 = mask[:, None]
    return BeamState(
        p_b=jnp.where(m2, fresh.p_b, state.p_b),
        p_nb=jnp.where(m2, fresh.p_nb, state.p_nb),
        h1=jnp.where(m2, fresh.h1, state.h1),
        h2=jnp.where(m2, fresh.h2, state.h2),
        lc=jnp.where(m2, fresh.lc, state.lc),
        tokens=jnp.where(m2[:, :, None], fresh.tokens, state.tokens),
        lens=jnp.where(m2, fresh.lens, state.lens),
    )


@jax.jit
def beam_top_tokens(state: BeamState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best hypothesis per stream as (tokens (B, L) int32, lens (B,)) — a
    device-side gather so only one hypothesis per stream crosses to the
    host each tick."""
    best = jnp.argmax(state.totals, axis=1)
    tokens = jnp.take_along_axis(
        state.tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(state.lens, best[:, None], axis=1)[:, 0]
    return tokens, lens


def top_texts(tokens, lens) -> list[str]:
    """Host-side string assembly for :func:`beam_top_tokens` output."""
    tokens, lens = np.asarray(tokens), np.asarray(lens)
    return ["".join(LABELS[i] for i in row[:n]).strip()
            for row, n in zip(tokens, lens)]


# ---------------------------------------------------------------------------
# Hotword (contextual-biasing) search on device: the host automaton
# (tone_tpu/decoding/hotwords.py) as dense trie arrays riding the beam
# state.  Per-character tentative boost with word-boundary commit/retract,
# stepped for all (W, V-1) expansions inside the jitted frame step so the
# bias steers pruning — FlexCTC-style contextual decoding, TPU-native.
# ---------------------------------------------------------------------------


class HotwordTables(NamedTuple):
    """Dense automaton step tables: for an active node n and emitted char
    c, row gathers give the full transition — next node (-1 = park), the
    tentative boost AT the new node, and the score delta (with
    word-boundary commits, retractions, and Aho–Corasick word-aligned
    suffix rematches all folded in at build time).  Node 0 is the root;
    node count is padded to a power of two so changing the phrase list
    rarely recompiles.

    Held as NUMPY arrays: a single table is a KB-sized jit argument (the
    per-call upload is noise), and keeping them host-side makes per-row
    stacking (:func:`stack_hotword_tables`) pure host work —
    device-resident rows would cost blocking device→host pulls per stacked
    call, which over a tunneled dev chip measurably dominated
    biased-serving latency.  STACKED tables scale as batch x nodes x chars
    (x3 arrays), so the serving engine bounds the stacked upload
    (MultiStreamEngine.MAX_STACKED_HOTWORD_BYTES) and routes pathologically
    large lists through per-stream decoders instead."""

    next_node: "np.ndarray"   # (n_nodes, n_char) int32, -1 = parked
    tent_after: "np.ndarray"  # (n_nodes, n_char) f32 tentative at next_node
    delta: "np.ndarray"       # (n_nodes, n_char) f32 score delta
    weight: "np.ndarray"      # () f32 boost per matching character


def make_hotword_tables(phrases, weight: float = 10.0,
                        pad_nodes: int | None = None) -> HotwordTables:
    """Build device tables from words/phrases (host-side, once per list):
    every (node, char) transition is one HotwordScorer.step simulation —
    sound because a reachable active node's tentative is always the
    scorer's precomputed per-node value (hotwords.py invariant).
    ``pad_nodes`` pads the node axis to a given count (>= the natural
    power-of-two pad) so differently-sized lists can share one stacked
    device program (:func:`stack_hotword_tables`)."""
    from tone_tpu.decoding.hotwords import HotwordScorer

    scorer = HotwordScorer(phrases, weight)
    n_char = len(LABELS)
    n_nodes = len(scorer._children)
    padded = 1 << (n_nodes - 1).bit_length() if n_nodes > 1 else 1
    if pad_nodes is not None:
        if pad_nodes < n_nodes:
            raise ValueError(f"pad_nodes={pad_nodes} < {n_nodes} trie nodes")
        padded = pad_nodes
    next_node = np.full((padded, n_char), -1, np.int32)
    tent_after = np.zeros((padded, n_char), np.float32)
    delta = np.zeros((padded, n_char), np.float32)
    for node, kids in enumerate(scorer._children):
        for ch in kids:
            if ch not in LABELS:
                raise ValueError(f"hotword character {ch!r} not in the label set")
        tent = scorer._tent_at[node]
        for cid, ch in enumerate(LABELS):
            (nxt, t_new), d = scorer.step((node, tent), ch)
            next_node[node, cid] = nxt
            tent_after[node, cid] = t_new
            delta[node, cid] = d
    return HotwordTables(next_node, tent_after, delta,
                         np.float32(weight))


def pad_hotword_tables(tables: HotwordTables, n_nodes: int) -> HotwordTables:
    """Pad the node axis to ``n_nodes`` (new nodes park every transition, so
    behavior is unchanged).  Used to warm the EXACT program shape a stacked
    call will compile when rows of different node counts mix in one batch
    (:func:`stack_hotword_tables` pads to the batch maximum)."""
    n = int(tables.next_node.shape[0])
    if n >= n_nodes:
        return tables
    pad = ((0, n_nodes - n), (0, 0))
    return HotwordTables(
        np.pad(tables.next_node, pad, constant_values=-1),
        np.pad(tables.tent_after, pad),
        np.pad(tables.delta, pad),
        tables.weight)


def stack_hotword_tables(rows: "list[HotwordTables | None]",
                         n_rows: int | None = None) -> HotwordTables:
    """Stack per-row tables into batched (B, n_nodes, n_char) tables so ONE
    device call decodes rows with DIFFERENT hotword lists (the serving
    engine's batched-finals path for per-request biasing).

    Rows are padded on the node axis to the power-of-two maximum across the
    batch, and ``None`` rows get the dead automaton (every transition
    parks, so their bias is identically zero — an unbiased search).
    ``n_rows`` pads the batch axis (extra rows are dead).  The node count
    is what keys the compiled program, so same-sized request lists share
    programs across ticks."""
    n_char = len(LABELS)
    n_nodes = max((int(r.next_node.shape[0]) for r in rows
                   if r is not None), default=1)
    n_nodes = 1 << (n_nodes - 1).bit_length() if n_nodes > 1 else 1
    b = max(n_rows or 0, len(rows))
    next_node = np.full((b, n_nodes, n_char), -1, np.int32)
    tent_after = np.zeros((b, n_nodes, n_char), np.float32)
    delta = np.zeros((b, n_nodes, n_char), np.float32)
    for i, r in enumerate(rows):
        if r is None:
            continue
        n = int(r.next_node.shape[0])
        # np.asarray is a no-op for freshly-built numpy tables and a
        # one-time pull for any caller still holding device arrays
        next_node[i, :n] = np.asarray(r.next_node)
        tent_after[i, :n] = np.asarray(r.tent_after)
        delta[i, :n] = np.asarray(r.delta)
    return HotwordTables(next_node, tent_after, delta, np.float32(0.0))


class HotBeamState(NamedTuple):
    """Beam state + per-beam automaton (node, tentative, bias)."""

    base: BeamState
    node: jnp.ndarray   # (B, W) int32
    tent: jnp.ndarray   # (B, W) f32 retractable boost
    bias: jnp.ndarray   # (B, W) f32 total applied boost

    @property
    def scores(self) -> jnp.ndarray:
        return self.base.totals + self.bias


def init_hot_beam_state(batch: int, beam_width: int,
                        max_len: int = 2048) -> HotBeamState:
    base = init_beam_state(batch, beam_width, max_len)
    zeros = jnp.zeros((batch, beam_width), jnp.float32)
    return HotBeamState(base, jnp.zeros_like(base.lc), zeros, zeros)


def _advance_hot(state: HotBeamState, logprobs, active, hw,
                 token_min_logp) -> HotBeamState:
    base = state.base
    carry = (base.p_b, base.p_nb, base.h1, base.h2, base.lc,
             state.node, state.tent, state.bias)
    step = lambda c, xs: _frame_step(c, xs, token_min_logp=token_min_logp,
                                     hw=hw)
    carry, (parents, emits) = jax.lax.scan(
        step, carry,
        (jnp.swapaxes(logprobs, 0, 1), jnp.swapaxes(active, 0, 1)))
    p_b, p_nb, h1, h2, lc, node, tent, bias = carry
    tokens, lens = _backtrack_and_splice(base.tokens, base.lens,
                                         parents, emits)
    return HotBeamState(BeamState(p_b, p_nb, h1, h2, lc, tokens, lens),
                        node, tent, bias)


_advance_hot_jit = jax.jit(_advance_hot)


def hot_beam_advance(
    state: HotBeamState,
    logprobs,
    lengths=None,
    *,
    hotwords: HotwordTables,
    token_min_logp: float = -5.0,
) -> HotBeamState:
    """:func:`beam_advance` with contextual biasing riding the state."""
    logprobs = jnp.asarray(logprobs, jnp.float32)
    b_sz, t_max, _ = logprobs.shape
    if lengths is None:
        active = jnp.ones((b_sz, t_max), bool)
    else:
        active = jnp.arange(t_max)[None, :] < jnp.asarray(lengths)[:, None]
    return _advance_hot_jit(state, logprobs, active, hotwords,
                            jnp.float32(token_min_logp))


@jax.jit
def hot_beam_reset(state: HotBeamState, mask) -> HotBeamState:
    """:func:`beam_reset` for the biased arena (serving interims)."""
    batch, w = state.base.p_b.shape
    fresh = init_hot_beam_state(batch, w, state.base.tokens.shape[-1])
    m2 = jnp.asarray(mask)[:, None]
    return HotBeamState(
        base=beam_reset.__wrapped__(state.base, jnp.asarray(mask)),
        node=jnp.where(m2, fresh.node, state.node),
        tent=jnp.where(m2, fresh.tent, state.tent),
        bias=jnp.where(m2, fresh.bias, state.bias),
    )


@jax.jit
def hot_beam_top_tokens(state: HotBeamState) -> tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`beam_top_tokens` ranking by the biased score."""
    best = jnp.argmax(state.scores, axis=1)
    tokens = jnp.take_along_axis(
        state.base.tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(state.base.lens, best[:, None], axis=1)[:, 0]
    return tokens, lens


def hot_beam_nbest(state: HotBeamState, n: int = 1) -> list[list[tuple[str, float]]]:
    """Per stream, up to ``n`` (text, acoustic_logp + bias) pairs — the
    ranking the host hotword search uses (biased totals)."""
    scores = np.asarray(state.scores)
    tokens = np.asarray(state.base.tokens)
    lens = np.asarray(state.base.lens)
    out = []
    for b in range(scores.shape[0]):
        order = np.argsort(-scores[b], kind="stable")[:n]
        hyps = []
        for wi in order:
            if not np.isfinite(scores[b, wi]):
                continue
            ids = tokens[b, wi, :lens[b, wi]]
            hyps.append(("".join(LABELS[i] for i in ids).strip(),
                         float(scores[b, wi])))
        out.append(hyps)
    return out


# ---------------------------------------------------------------------------
# Shallow fusion on device: the word n-gram LM (tone_tpu/decoding/device_lm)
# joins the search itself — per-beam word-context ids, a vocab-trie node for
# the in-progress word, and the accumulated fusion score ride the beam
# state; the space expansion scores its completed word with a Katz-backoff
# walk over the LM's hash arrays, entirely inside the jitted frame step.
# This is the full pyctcdecode-style fusion (the LM steers pruning), not
# just n-best rescoring.
# ---------------------------------------------------------------------------

LOG10_TO_LN = float(np.log(10.0))


class FusedBeamState(NamedTuple):
    base: BeamState
    ctx: jnp.ndarray    # (B, W, order-1) int32 word ids, -1 = missing
    node: jnp.ndarray   # (B, W) int32 vocab-trie node; 0 root, -1 dead
    wid: jnp.ndarray    # (B, W) int32 node_word[node] (-1 = not a word) —
                        # carried so no per-frame node_word gather is needed
    lm_sc: jnp.ndarray  # (B, W) f32 accumulated fusion score (natural log)
    # hotword automaton (None unless the search is hotword-biased)
    hw_node: jnp.ndarray | None = None   # (B, W) int32
    hw_tent: jnp.ndarray | None = None   # (B, W) f32 retractable boost
    hw_bias: jnp.ndarray | None = None   # (B, W) f32 total applied boost

    @property
    def scores(self) -> jnp.ndarray:
        s = self.base.totals + self.lm_sc
        return s if self.hw_bias is None else s + self.hw_bias


def init_fused_beam_state(batch: int, beam_width: int, lm,
                          max_len: int = 2048,
                          hotwords: HotwordTables | None = None) -> FusedBeamState:
    """``lm`` is a tone_tpu.decoding.device_lm.DeviceLM."""
    k = lm.order - 1
    ctx = np.full((batch, beam_width, k), -1, np.int32)
    if k:
        ctx[:, :, -1] = lm.bos_id  # host begin_context() == ("<s>",)
    zeros = jnp.zeros((batch, beam_width), jnp.float32)
    return FusedBeamState(
        base=init_beam_state(batch, beam_width, max_len),
        ctx=jnp.asarray(ctx),
        node=jnp.zeros((batch, beam_width), jnp.int32),
        wid=jnp.full((batch, beam_width), -1, jnp.int32),  # root: no word
        lm_sc=zeros,
        hw_node=(jnp.zeros((batch, beam_width), jnp.int32)
                 if hotwords is not None else None),
        hw_tent=zeros if hotwords is not None else None,
        hw_bias=zeros if hotwords is not None else None,
    )


def _lm_lookup(lm, h1, h2):
    """(found, prob, backoff) for query hashes of any shape — one
    contiguous-window ROW gather over the open-addressing table (bucket =
    h1 & mask, linear probe; tone_tpu/decoding/device_lm.py).  The fused
    search is gather-latency-bound, so a single bounded probe beats any
    log-round search, and the array-of-structs rows (k1, k2, prob,
    backoff packed as four u32) mean the payload comes out of the same
    gather as the key compare — the old separate keys1/keys2/probs/
    backoffs arrays cost four sequential gather rounds here."""
    size = lm.table.shape[0]
    mask = jnp.uint32(size - 1)
    shift = 32 - size.bit_length() + 1  # Fibonacci hashing (see device_lm)
    base = (h1 * jnp.uint32(0x9E3779B1)) >> shift
    j = base[..., None] + jnp.arange(lm.probe, dtype=jnp.uint32)
    j = (j & mask).astype(jnp.int32)
    rows = jnp.take(lm.table, j, axis=0)                 # (..., PROBE, 4)
    hit = (rows[..., 0] == h1[..., None]) & (rows[..., 1] == h2[..., None])
    found = hit.any(axis=-1)
    first = jnp.argmax(hit, axis=-1)
    sel = jnp.take_along_axis(rows, first[..., None, None], axis=-2)[..., 0, :]
    f32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.float32)
    prob = jnp.where(found, f32(sel[..., 2]), 0.0)
    bo = jnp.where(found, f32(sel[..., 3]), 0.0)
    return found, prob, bo


def _lm_score(lm, ctx, wid):
    """log10 P(wid | ctx) with Katz backoff; ctx (..., K-1) int32 (-1 =
    missing), wid (...).  Twin of DeviceLM.score_ids / ArpaLM.score:
    longest context first, accumulating dropped contexts' backoffs.  All
    (2K-1) gram/context queries go through ONE stacked lookup.

    Probing-binary arrays dispatch to the KenLM-semantics scorer (the
    table keys are the binary's own 64-bit chain hashes)."""
    from tone_tpu.decoding.device_lm import DeviceProbingLMArrays

    if isinstance(lm, DeviceProbingLMArrays):
        return _lm_score_probing(lm, ctx, wid)
    k_ctx = ctx.shape[-1]
    # chain hash per context suffix length L (ids hashed left to right)
    suffix_h = {}
    for level in range(1, k_ctx + 1):
        h1 = jnp.full(wid.shape, 0x811C9DC5, jnp.uint32)
        h2 = jnp.full(wid.shape, 0x85EBCA6B, jnp.uint32)
        for j in range(level):
            h1, h2 = _mix(h1, h2, ctx[..., k_ctx - level + j])
        suffix_h[level] = (h1, h2)
    g0 = _mix(jnp.full(wid.shape, 0x811C9DC5, jnp.uint32),
              jnp.full(wid.shape, 0x85EBCA6B, jnp.uint32), wid)
    gram_h = {0: g0}
    for level in range(1, k_ctx + 1):
        gram_h[level] = _mix(*suffix_h[level], wid)

    q1 = jnp.stack([gram_h[L][0] for L in range(k_ctx + 1)]
                   + [suffix_h[L][0] for L in range(1, k_ctx + 1)])
    q2 = jnp.stack([gram_h[L][1] for L in range(k_ctx + 1)]
                   + [suffix_h[L][1] for L in range(1, k_ctx + 1)])
    found, prob, bo = _lm_lookup(lm, q1, q2)

    done = jnp.zeros(wid.shape, bool)
    result = jnp.zeros(wid.shape, jnp.float32)
    backoff_sum = jnp.zeros(wid.shape, jnp.float32)
    for level in range(k_ctx, -1, -1):
        valid = jnp.ones(wid.shape, bool) if level == 0 \
            else ctx[..., k_ctx - level] >= 0
        hit = valid & found[level] & ~done
        result = jnp.where(hit, prob[level] + backoff_sum, result)
        done |= hit
        if level >= 1:
            ci = k_ctx + level  # suffix_h[level] position in the stack
            backoff_sum = jnp.where(valid & found[ci] & ~done,
                                    backoff_sum + bo[ci], backoff_sum)
    return result


# --- KenLM probing binaries: 64-bit chain-hash emulation --------------------
# A probing ``kenlm.bin`` stores grams only as 64-bit chained hashes
# (kenlm_binary.combine_word_hash).  JAX on TPU has no uint64, so the chain
# is computed in two uint32 limbs; multiplier constants are static, so each
# 64x64→low-64 multiply is one 32x32→64 (in 16-bit halves) plus two wrapping
# 32-bit multiplies.


def _umul32_wide(a, c32: int):
    """a (u32 array) * c32 (python int < 2^32) → (high u32, low u32)."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> jnp.uint32(16)
    b0, b1 = c32 & 0xFFFF, c32 >> 16
    ll = a0 * jnp.uint32(b0)
    lh = a0 * jnp.uint32(b1)
    hl = a1 * jnp.uint32(b0)
    hh = a1 * jnp.uint32(b1)
    mid = (ll >> jnp.uint32(16)) + (lh & jnp.uint32(0xFFFF)) \
        + (hl & jnp.uint32(0xFFFF))
    lo = (ll & jnp.uint32(0xFFFF)) | ((mid & jnp.uint32(0xFFFF))
                                      << jnp.uint32(16))
    hi = hh + (lh >> jnp.uint32(16)) + (hl >> jnp.uint32(16)) \
        + (mid >> jnp.uint32(16))
    return hi, lo


def _mul64_const(hi, lo, c: int):
    """(hi, lo) u64 * c (python int) mod 2^64 → (hi, lo)."""
    c_lo, c_hi = c & 0xFFFFFFFF, (c >> 32) & 0xFFFFFFFF
    p_hi, p_lo = _umul32_wide(lo, c_lo)
    out_hi = p_hi + lo * jnp.uint32(c_hi) + hi * jnp.uint32(c_lo)
    return out_hi, p_lo


_COMBINE_A = 8978948897894561157   # kenlm_binary.combine_word_hash constants
_COMBINE_B = 17894857484156487943


def _combine64(hi, lo, wid):
    """KenLM CombineWordHash: ``(h * A) ^ ((1 + w) * B)`` mod 2^64, with
    ``w`` a word id (int32; -1 chains garbage and must be masked by the
    caller's validity flag)."""
    ha_hi, ha_lo = _mul64_const(hi, lo, _COMBINE_A)
    w = (wid + 1).astype(jnp.uint32)
    wb_hi, wb_lo = _mul64_const(jnp.zeros_like(w), w, _COMBINE_B)
    return ha_hi ^ wb_hi, ha_lo ^ wb_lo


def _lm_score_probing(lm, ctx, wid):
    """log10 P(wid | ctx) against a probing binary's own tables —
    device twin of KenLMBinary.score_ids (short-to-long extension, then
    backoff weights of context grams at least as long as the match).  All
    ids are KenLM vocabulary ids (OOV = 0); ctx entries of -1 are missing.
    All (2·order − 3) gram/context probes go through ONE stacked lookup."""
    from tone_tpu.decoding.device_lm import _order_salt

    k_ctx = ctx.shape[-1]
    order = k_ctx + 1
    prob = jnp.take(lm.uni_prob, wid)
    if k_ctx == 0:
        return prob

    def salted(hi, lo, n):
        s = _order_salt(n)
        return (lo ^ jnp.uint32(s & 0xFFFFFFFF),
                hi ^ jnp.uint32(s >> 32))

    queries = []  # (k1, k2) per probe, extensions first
    node_hi = jnp.zeros(wid.shape, jnp.uint32)
    node_lo = wid.astype(jnp.uint32)
    for n in range(2, order + 1):
        node_hi, node_lo = _combine64(node_hi, node_lo,
                                      ctx[..., k_ctx - (n - 1)])
        queries.append(salted(node_hi, node_lo, n))
    n_ext = len(queries)
    b_hi = jnp.zeros(wid.shape, jnp.uint32)
    b_lo = jnp.clip(ctx[..., k_ctx - 1], 0).astype(jnp.uint32)
    for clen in range(2, order):
        b_hi, b_lo = _combine64(b_hi, b_lo, ctx[..., k_ctx - clen])
        queries.append(salted(b_hi, b_lo, clen))

    q1 = jnp.stack([q[0] for q in queries])
    q2 = jnp.stack([q[1] for q in queries])
    found, qprob, qbo = _lm_lookup(lm, q1, q2)

    matched = jnp.ones(wid.shape, jnp.int32)
    alive = jnp.ones(wid.shape, bool)
    for i, n in enumerate(range(2, order + 1)):
        valid = ctx[..., k_ctx - (n - 1)] >= 0
        hit = alive & valid & found[i]
        prob = jnp.where(hit, qprob[i], prob)
        matched = jnp.where(hit, n, matched)
        alive = hit

    cid1 = ctx[..., k_ctx - 1]
    ubo = jnp.take(lm.uni_backoff, jnp.clip(cid1, 0))
    backoff = jnp.where((cid1 >= 0) & (matched <= 1), ubo, 0.0)
    for j, clen in enumerate(range(2, order)):
        valid = ctx[..., k_ctx - clen] >= 0
        qi = n_ext + j
        backoff += jnp.where(valid & (matched <= clen) & found[qi],
                             qbo[qi], 0.0)
    return prob + backoff


def _trie_step(lm, node, char):
    """Vocab-trie transition via the edge hash table: (child, child's
    terminal word id) in ONE row gather — the edge rows are (key, child,
    node_word[child]).  -1 propagates (dead = not a vocab prefix)."""
    n_chars = len(LABELS)
    key = node.astype(jnp.uint32) * n_chars + char.astype(jnp.uint32)
    size = lm.edges.shape[0]
    mask = jnp.uint32(size - 1)
    shift = 32 - size.bit_length() + 1  # Fibonacci hashing (see device_lm)
    base = (key * jnp.uint32(0x9E3779B1)) >> shift
    j = base[..., None] + jnp.arange(lm.edge_probe, dtype=jnp.uint32)
    j = (j & mask).astype(jnp.int32)
    rows = jnp.take(lm.edges, j, axis=0)    # (..., PROBE, 3)
    hit = rows[..., 0] == key[..., None]
    found = hit.any(axis=-1) & (node >= 0)
    first = jnp.argmax(hit, axis=-1)
    sel = jnp.take_along_axis(rows, first[..., None, None], axis=-2)[..., 0, :]
    i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)
    return (jnp.where(found, i32(sel[..., 1]), -1),
            jnp.where(found, i32(sel[..., 2]), -1))


def _fused_frame_step(carry, xs, *, lm, alpha, beta, token_min_logp, hw=None):
    """One fused frame: the LM-free candidate construction and merging of
    _frame_step, plus the LM riding the beam state.

    Cost discipline (the fused path is gather-latency-bound): the only
    pre-prune LM work is ONE word score per beam (the space expansion needs
    it in the ranking); trie/context/score state transitions happen after
    top-k on the W survivors, reconstructed from (parent, emitted) — a
    single (B, W) trie lookup per frame instead of (B, W, V-1).  Merged
    candidates always carry identical LM fields (they are a function of the
    collapsed text alone), so reconstruction from any representative is
    sound."""
    if hw is None:
        p_b, p_nb, h1, h2, lc, ctx, node, nw, lm_sc = carry
    else:
        (p_b, p_nb, h1, h2, lc, ctx, node, nw, lm_sc,
         hw_node, hw_tent, hw_bias) = carry
    frame, active = xs
    b_sz, w = p_b.shape
    v_total = frame.shape[-1]
    n_char = v_total - 1
    k_ctx = ctx.shape[-1]

    ptot = jnp.logaddexp(p_b, p_nb)
    amax = jnp.argmax(frame, axis=-1)
    tokmask = (frame >= token_min_logp) | (
        jnp.arange(v_total)[None, :] == amax[:, None])
    p = jnp.where(tokmask, frame, NEG_INF)

    p_blank = p[:, BLANK_ID][:, None]
    p_at_lc = jnp.take_along_axis(p, jnp.clip(lc, 0, v_total - 1), axis=1)
    p_at_lc = jnp.where(lc >= 0, p_at_lc, NEG_INF)
    self_pb = ptot + p_blank
    self_pnb = jnp.where(lc == SPACE_ID, ptot + p_at_lc, p_nb + p_at_lc)

    v_ids = jnp.arange(n_char, dtype=jnp.int32)
    pv = p[:, :n_char][:, None, :]
    is_rep = v_ids[None, None, :] == lc[:, :, None]
    src = jnp.where(is_rep, p_b[:, :, None], ptot[:, :, None])
    exp_pnb = src + pv
    is_space = (v_ids == SPACE_ID)[None, None, :]
    lead_space = is_space & (lc == -1)[:, :, None]
    h1x, h2x = _mix(h1[:, :, None], h2[:, :, None], v_ids[None, None, :])
    exp_h1 = jnp.where(lead_space, h1[:, :, None], h1x)
    exp_h2 = jnp.where(lead_space, h2[:, :, None], h2x)
    exp_lc = jnp.broadcast_to(v_ids[None, None, :], exp_pnb.shape)
    exp_e = jnp.where(lead_space, -1, exp_lc)
    exp_pnb = jnp.where(is_space & (lc == SPACE_ID)[:, :, None],
                        NEG_INF, exp_pnb)

    # --- the one pre-prune LM computation: the space expansion's word ------
    word_event = (lc >= 0) & (lc != SPACE_ID)                # (B, W)
    # nw carries node_word[node] alongside the node (updated by the same
    # edge-row gather as the trie transition) — no per-frame gather here
    is_vocab = (node >= 0) & (nw >= 0)
    wid = jnp.where(is_vocab, nw, lm.unk_id)      # scored as <unk> (host parity)
    # the context keeps a never-matching id for OOV words: the host search
    # carries the literal unknown string, so later lookups/backoffs on it
    # miss — substituting <unk> would pick up <unk>'s backoff weight
    ctx_wid = jnp.where(is_vocab, wid, lm.oov_ctx_id)
    delta = (alpha * LOG10_TO_LN) * _lm_score(lm, ctx, wid) + beta
    exp_lm = lm_sc[:, :, None] + jnp.where(
        is_space & word_event[:, :, None], delta[:, :, None], 0.0)

    if hw is not None:
        exp_node_hw, exp_tent_hw, exp_bias_hw = _hw_expand(
            hw, hw_node, hw_tent, hw_bias, is_space, lead_space)

    # --- twin fold (probability only; twins share identical LM fields) ----
    same_h = ((h1[:, :, None] == h1[:, None, :])
              & (h2[:, :, None] == h2[:, None, :]))
    upper = jnp.arange(w)[None, :, None] < jnp.arange(w)[None, None, :]
    donates = same_h & upper
    has_donor = donates.any(axis=2)
    donor_idx = jnp.argmax(donates, axis=2)
    donated = jnp.take_along_axis(exp_pnb, donor_idx[:, :, None], axis=1)
    donated = jnp.where(has_donor[:, :, None], donated, NEG_INF)
    char_ext = ~is_space
    exp_pnb = jnp.where(char_ext,
                        jnp.logaddexp(exp_pnb, donated), exp_pnb)
    donor = donates.any(axis=1)
    exp_pnb = jnp.where(donor[:, :, None] & char_ext, NEG_INF, exp_pnb)

    # --- extension-to-self merge (probability only, as above) -------------
    n_ext = w * n_char
    flat = lambda a: a.reshape(b_sz, n_ext)
    e_h1, e_h2 = flat(exp_h1), flat(exp_h2)
    e_lc, e_e = flat(exp_lc), flat(exp_e)
    e_pnb = flat(exp_pnb)
    e_flag = e_lc == SPACE_ID
    s_flag = lc == SPACE_ID
    match = ((e_h1[:, None, :] == h1[:, :, None])
             & (e_h2[:, None, :] == h2[:, :, None])
             & (e_flag[:, None, :] == s_flag[:, :, None]))
    contrib = jnp.where(match, e_pnb[:, None, :], NEG_INF)
    m_self_pnb = jnp.logaddexp(self_pnb, jax.nn.logsumexp(contrib, axis=-1))
    e_pnb = jnp.where(match.any(axis=1), NEG_INF, e_pnb)

    # --- flatten, rank by acoustic + fusion score, keep best W ------------
    iota_w32 = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                                (b_sz, w))
    e_parent = flat(jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.int32)[None, :, None], exp_pnb.shape))
    ccat = lambda s, e: jnp.concatenate([s, e], axis=1)
    c_h1, c_h2 = ccat(h1, e_h1), ccat(h2, e_h2)
    c_lc = ccat(lc, e_lc)
    c_pb = ccat(self_pb, jnp.full_like(e_pnb, NEG_INF))
    c_pnb = ccat(m_self_pnb, e_pnb)
    c_parent = ccat(iota_w32, e_parent)
    c_e = ccat(jnp.full((b_sz, w), -1, jnp.int32), e_e)
    c_lm = ccat(lm_sc, flat(exp_lm))
    tot = jnp.logaddexp(c_pb, c_pnb) + c_lm
    if hw is not None:
        c_node_hw = ccat(hw_node, flat(exp_node_hw))
        c_tent_hw = ccat(hw_tent, flat(exp_tent_hw))
        c_bias_hw = ccat(hw_bias, flat(exp_bias_hw))
        tot = tot + c_bias_hw

    _, idx = jax.lax.top_k(tot, w)
    take = lambda a: jnp.take_along_axis(a, idx, axis=1)
    n_parent, n_e = take(c_parent), take(c_e)

    # --- post-prune LM state transitions on the W survivors ---------------
    takep = lambda a: jnp.take_along_axis(a, n_parent, axis=1)
    shifted = (jnp.concatenate([ctx[..., 1:], ctx_wid[..., None]], axis=-1)
               if k_ctx else ctx)
    completed = n_e == SPACE_ID        # space with a word event
    p_ctx = jnp.take_along_axis(ctx, n_parent[..., None], axis=1)
    p_shifted = jnp.take_along_axis(shifted, n_parent[..., None], axis=1)
    new_ctx = jnp.where(completed[..., None], p_shifted, p_ctx)
    p_node = takep(node)
    is_char = (n_e >= 0) & ~completed
    child, child_word = _trie_step(lm, p_node, jnp.clip(n_e, 0, None))
    new_node = jnp.where(completed, 0, jnp.where(is_char, child, p_node))
    new_nw = jnp.where(completed, -1,
                       jnp.where(is_char, child_word, takep(nw)))
    new_lm = takep(lm_sc) + jnp.where(completed, takep(delta), 0.0)

    keep = active[:, None]
    out_parent = jnp.where(keep, n_parent, iota_w32)
    out_e = jnp.where(keep, n_e, -1)
    carry = (
        jnp.where(keep, take(c_pb), p_b),
        jnp.where(keep, take(c_pnb), p_nb),
        jnp.where(keep, take(c_h1), h1),
        jnp.where(keep, take(c_h2), h2),
        jnp.where(keep, take(c_lc), lc),
        jnp.where(keep[..., None], new_ctx, ctx),
        jnp.where(keep, new_node, node),
        jnp.where(keep, new_nw, nw),
        jnp.where(keep, new_lm, lm_sc),
    )
    if hw is not None:
        carry = carry + (
            jnp.where(keep, take(c_node_hw), hw_node),
            jnp.where(keep, take(c_tent_hw), hw_tent),
            jnp.where(keep, take(c_bias_hw), hw_bias),
        )
    return carry, (out_parent, out_e)


def _advance_fused(state: FusedBeamState, logprobs, active, lm,
                   alpha, beta, token_min_logp, hw=None) -> FusedBeamState:
    base = state.base
    carry = (base.p_b, base.p_nb, base.h1, base.h2, base.lc,
             state.ctx, state.node, state.wid, state.lm_sc)
    if hw is not None:
        carry = carry + (state.hw_node, state.hw_tent, state.hw_bias)
    step = lambda c, xs: _fused_frame_step(
        c, xs, lm=lm, alpha=alpha, beta=beta, token_min_logp=token_min_logp,
        hw=hw)
    carry, (parents, emits) = jax.lax.scan(
        step, carry,
        (jnp.swapaxes(logprobs, 0, 1), jnp.swapaxes(active, 0, 1)))
    p_b, p_nb, h1, h2, lc, ctx, node, nw, lm_sc = carry[:9]
    tokens, lens = _backtrack_and_splice(base.tokens, base.lens,
                                         parents, emits)
    return FusedBeamState(
        base=BeamState(p_b, p_nb, h1, h2, lc, tokens, lens),
        ctx=ctx, node=node, wid=nw, lm_sc=lm_sc,
        hw_node=carry[9] if hw is not None else None,
        hw_tent=carry[10] if hw is not None else None,
        hw_bias=carry[11] if hw is not None else None)


_advance_fused_jit = jax.jit(_advance_fused)


def fused_beam_advance(
    state: FusedBeamState,
    logprobs,
    lm_arrays,
    lengths=None,
    *,
    alpha: float = 0.4,
    beta: float = 0.9,
    token_min_logp: float = -5.0,
    hotwords: HotwordTables | None = None,
) -> FusedBeamState:
    """Consume (B, T, V) frames with the LM fused into the search.

    ``lm_arrays`` is ``DeviceLM.arrays()``; one program is compiled per LM
    shape.  Same masking semantics as :func:`beam_advance`.  ``hotwords``
    adds contextual biasing on top of the fusion (the state must come from
    ``init_fused_beam_state(..., hotwords=...)``).
    """
    logprobs = jnp.asarray(logprobs, jnp.float32)
    b_sz, t_max, _ = logprobs.shape
    if lengths is None:
        active = jnp.ones((b_sz, t_max), bool)
    else:
        active = jnp.arange(t_max)[None, :] < jnp.asarray(lengths)[:, None]
    return _advance_fused_jit(state, logprobs, active, lm_arrays,
                              jnp.float32(alpha), jnp.float32(beta),
                              jnp.float32(token_min_logp), hotwords)


def fused_beam_nbest(
    state: FusedBeamState, lm, n: int = 1, *,
    alpha: float = 0.4, beta: float = 0.9,
) -> list[list[tuple[str, float]]]:
    """Host readout with the host search's final ranking: acoustic total +
    accumulated fusion score + the provisional score of the trailing
    in-progress word (beam.py StreamingBeamSearch.result())."""
    totals = np.asarray(state.base.totals)
    lm_sc = np.asarray(state.lm_sc)
    if state.hw_bias is not None:
        lm_sc = lm_sc + np.asarray(state.hw_bias)
    tokens = np.asarray(state.base.tokens)
    lens = np.asarray(state.base.lens)
    ctxs = np.asarray(state.ctx)
    out = []
    for b in range(totals.shape[0]):
        scored = []
        for wi in range(totals.shape[1]):
            if not np.isfinite(totals[b, wi]):
                continue
            text = "".join(LABELS[i] for i in tokens[b, wi, :lens[b, wi]])
            partial = text.rsplit(" ", 1)[-1]
            final = totals[b, wi] + lm_sc[b, wi]
            if partial:
                ctx_ids = [int(i) for i in ctxs[b, wi] if i >= 0]
                final += (alpha * LOG10_TO_LN
                          * lm.score_ids(ctx_ids, lm.word_id(partial))
                          + beta)
            scored.append((text.strip(), float(final)))
        # host final_key parity: score desc, then text asc on exact ties
        scored.sort(key=lambda p: (-p[1], p[0]))
        out.append(scored[:n])
    return out
