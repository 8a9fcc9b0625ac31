"""On-TPU batched prefix beam search vs the host reference search."""

from __future__ import annotations

import numpy as np
import pytest

from tone_tpu.config import BLANK_ID, LABELS
from tone_tpu.decoding.beam import StreamingBeamSearch, ctc_beam_search
from tone_tpu.ops.beam_decode import (
    BeamState,
    beam_advance,
    beam_nbest,
    beam_search_decode,
    init_beam_state,
)

V = len(LABELS) + 1  # 34 chars + blank


def _peaked_logprobs(rng, t, scale=3.0):
    logits = rng.normal(0.0, scale, (t, V))
    x = logits - logits.max(-1, keepdims=True)
    return (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)


@pytest.mark.slow
def test_matches_host_beam_search_random():
    rng = np.random.default_rng(0)
    batch = [_peaked_logprobs(rng, int(rng.integers(8, 48))) for _ in range(24)]
    t_max = max(lp.shape[0] for lp in batch)
    padded = np.stack([
        np.pad(lp, ((0, t_max - lp.shape[0]), (0, 0))) for lp in batch])
    lengths = np.array([lp.shape[0] for lp in batch])

    got = beam_search_decode(padded, lengths, beam_width=8)
    want = [ctc_beam_search(lp.astype(np.float64), LABELS, None, beam_width=8)
            for lp in batch]
    assert got == want


def test_matches_host_beam_search_flat_distributions():
    """Low peakedness stresses merging: many near-equal hypotheses."""
    rng = np.random.default_rng(1)
    batch = [_peaked_logprobs(rng, 20, scale=1.0) for _ in range(16)]
    got = beam_search_decode(np.stack(batch), beam_width=12)
    want = [ctc_beam_search(lp.astype(np.float64), LABELS, None, beam_width=12)
            for lp in batch]
    assert got == want


def test_merge_paths_leading_space_and_blank():
    """'space then а' and 'а directly' must merge into one beam, like the
    host search's dict does; the best total must match the host's."""
    sp, a = LABELS.index(" "), LABELS.index("а")
    frames = np.full((3, V), -12.0, np.float32)
    frames[0, [sp, a, BLANK_ID]] = np.log([0.4, 0.35, 0.2])
    frames[1, [a, BLANK_ID]] = np.log([0.55, 0.4])
    frames[2, [BLANK_ID]] = np.log(0.95)

    state = init_beam_state(1, 8)
    state = beam_advance(state, frames[None])
    hyps = beam_nbest(state, 8)[0]
    texts = [h[0] for h in hyps]
    assert texts.count("а") == 1  # merged, not duplicated

    host = StreamingBeamSearch(LABELS, None, beam_width=8)
    host.advance(frames.astype(np.float64))
    best = max(host._beams.values(), key=lambda b: b.total())
    assert (best.text + best.partial).strip() == hyps[0][0]
    assert hyps[0][1] == pytest.approx(best.total(), abs=1e-4)


def test_chunk_split_invariance():
    rng = np.random.default_rng(2)
    lp = _peaked_logprobs(rng, 30)[None]

    whole = beam_advance(init_beam_state(1, 8), lp)
    split = beam_advance(init_beam_state(1, 8), lp[:, :11])
    split = beam_advance(split, lp[:, 11:])

    np.testing.assert_allclose(np.asarray(whole.totals),
                               np.asarray(split.totals), rtol=1e-6)
    assert beam_nbest(whole, 3) == beam_nbest(split, 3)


def test_length_masking_equals_individual():
    rng = np.random.default_rng(3)
    a = _peaked_logprobs(rng, 25)
    b = _peaked_logprobs(rng, 13)
    padded = np.stack([a, np.pad(b, ((0, 12), (0, 0)))])

    batched = beam_search_decode(padded, np.array([25, 13]), beam_width=8)
    single = [beam_search_decode(a[None], beam_width=8)[0],
              beam_search_decode(b[None], beam_width=8)[0]]
    assert batched == single


def test_nbest_ordering_and_scores():
    rng = np.random.default_rng(4)
    state = init_beam_state(2, 8)
    state = beam_advance(state, np.stack([_peaked_logprobs(rng, 15)] * 2))
    for hyps in beam_nbest(state, 8):
        scores = [s for _, s in hyps]
        assert scores == sorted(scores, reverse=True)
        assert all(np.isfinite(s) for s in scores)


def test_token_buffer_overflow_truncates():
    """max_len caps hypothesis growth without corrupting state."""
    rng = np.random.default_rng(5)
    lp = _peaked_logprobs(rng, 40)[None]
    state = init_beam_state(1, 4, max_len=5)
    state = beam_advance(state, lp)
    hyps = beam_nbest(state, 1)[0]
    assert len(hyps[0][0]) <= 5
    full = beam_search_decode(lp, beam_width=4)[0]
    assert hyps[0][0] == full[:5].strip()


@pytest.mark.slow
def test_carried_arena_matches_host_streaming_with_resets():
    """Device beam state as a serving arena: per-tick advance with per-slot
    activity masks and phrase-boundary resets must match one host
    StreamingBeamSearch per slot fed the same frames/resets."""
    from tone_tpu.ops.beam_decode import beam_reset, beam_top_tokens, top_texts

    rng = np.random.default_rng(8)
    slots, ticks, frames = 5, 12, 10
    state = init_beam_state(slots, 8, max_len=256)
    hosts = [StreamingBeamSearch(LABELS, None, beam_width=8)
             for _ in range(slots)]

    for _ in range(ticks):
        chunk = np.stack([_peaked_logprobs(rng, frames) for _ in range(slots)])
        resets = rng.random(slots) < 0.2
        advance = rng.random(slots) < 0.8
        state = beam_reset(state, resets)
        state = beam_advance(state, chunk,
                             np.where(advance, frames, 0))
        for s in range(slots):
            if resets[s]:
                hosts[s].reset()
            if advance[s]:
                hosts[s].advance(chunk[s].astype(np.float64))

        got = top_texts(*beam_top_tokens(state))
        want = [h.result() for h in hosts]
        assert got == want


@pytest.mark.slow
def test_matches_host_with_leading_silence():
    """Leading space/blank-heavy frames create the one legal 'twin' pair —
    the empty beam and the leading-space beam share the empty text — whose
    char extensions must merge exactly as the host search's dict merges
    them (regression: the extension-to-self match alone split this mass)."""
    sp = LABELS.index(" ")
    rng = np.random.default_rng(17)
    for _ in range(40):
        t = int(rng.integers(10, 30))
        logits = rng.normal(0.0, 3.0, (t, V))
        logits[0, sp] += 6.0
        logits[0, BLANK_ID] += 6.0
        x = logits - logits.max(-1, keepdims=True)
        lp = (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)
        got = beam_search_decode(lp[None], beam_width=16)[0]
        want = ctc_beam_search(lp.astype(np.float64), LABELS, None,
                               beam_width=16)
        assert got == want
