"""Splitter tests: behavior + parity with the reference numpy splitter."""

import importlib.util

import numpy as np
import pytest

from tone_tpu.splitter import StreamingLogprobSplitter, StreamingLogprobSplitterState

V = 35  # vocab + blank


def make_logprobs(pattern: str) -> np.ndarray:
    """Build a logprob stream from a pattern string: 's' = speech frame,
    '.' = silence frame."""
    out = np.full((len(pattern), V), -20.0, dtype=np.float32)
    for i, ch in enumerate(pattern):
        if ch == "s":
            out[i, 0] = -0.01  # 'а'
            out[i, -1] = -8.0
        else:
            out[i, -1] = -0.01  # blank
    # normalize
    out -= np.log(np.exp(out).sum(-1, keepdims=True))
    return out


def test_basic_phrase_detection():
    sp = StreamingLogprobSplitter()
    # 30 silence, 50 speech, 30 silence, trailing speech (unfinished)
    pattern = "." * 30 + "s" * 50 + "." * 30 + "s" * 10
    phrases, state = sp.forward(make_logprobs(pattern), None)
    assert len(phrases) == 1
    p = phrases[0]
    assert p.start_frame == 30
    assert p.end_frame == 80
    # logprobs expanded by 3 frames each side
    assert p.logprobs.shape[0] == 50 + 6


def test_short_silence_not_a_boundary():
    sp = StreamingLogprobSplitter()
    pattern = "." * 30 + "s" * 20 + "." * 10 + "s" * 20 + "." * 25
    phrases, _ = sp.forward(make_logprobs(pattern), None)
    # 10-frame silence < MIN_SILENCE_DURATION: one merged phrase
    assert len(phrases) == 1
    assert phrases[0].start_frame == 30
    assert phrases[0].end_frame == 80


def test_is_last_flushes():
    sp = StreamingLogprobSplitter()
    pattern = "." * 25 + "s" * 15
    phrases, _ = sp.forward(make_logprobs(pattern), None, is_last=True)
    assert len(phrases) == 1
    assert (phrases[0].start_frame, phrases[0].end_frame) == (25, 40)


def test_chunked_equals_oneshot():
    """Feeding chunk-by-chunk must produce the same phrases as one shot."""
    rng = np.random.default_rng(0)
    pattern = "".join(rng.choice([".", "s"], p=[0.6, 0.4]) for _ in range(400))
    lp = make_logprobs(pattern)

    sp = StreamingLogprobSplitter()
    oneshot, _ = sp.forward(lp, None, is_last=True)

    state = None
    chunked = []
    for i in range(0, 400, 10):
        phrases, state = sp.forward(lp[i:i + 10], state, is_last=(i + 10 >= 400))
        chunked.extend(phrases)

    assert len(oneshot) == len(chunked)
    for a, b in zip(oneshot, chunked):
        assert (a.start_frame, a.end_frame) == (b.start_frame, b.end_frame)
        np.testing.assert_allclose(a.logprobs, b.logprobs)


def test_force_split_long_phrase():
    sp = StreamingLogprobSplitter()
    pattern = "." * 25 + "s" * 4100 + "." * 25
    phrases, _ = sp.forward(make_logprobs(pattern), None)
    # 4100 speech frames -> 2 forced 2000-frame phrases + 100-frame tail
    assert len(phrases) == 3
    assert phrases[0].end_frame - phrases[0].start_frame == 2000
    assert phrases[1].end_frame - phrases[1].start_frame == 2000
    assert phrases[2].end_frame - phrases[2].start_frame == 100


def test_validation():
    sp = StreamingLogprobSplitter()
    with pytest.raises(TypeError):
        sp.forward([[0.0] * V], None)
    with pytest.raises(ValueError):
        sp.forward(np.zeros((5, 10), np.float32), None)
    with pytest.raises(ValueError):
        sp.forward(np.zeros((5, V), np.float64), None)


# -- parity against the reference splitter (pure numpy, imported directly) --

_ref_spec = importlib.util.spec_from_file_location(
    "ref_logprob_splitter", "/root/reference/tone/logprob_splitter.py")
if _ref_spec is not None:
    try:
        import sys

        _ref = importlib.util.module_from_spec(_ref_spec)
        sys.modules[_ref_spec.name] = _ref  # dataclasses need the module registered
        _ref_spec.loader.exec_module(_ref)
    except FileNotFoundError:
        _ref = None
else:  # pragma: no cover
    _ref = None


@pytest.mark.skipif(_ref is None, reason="reference splitter unavailable")
@pytest.mark.parametrize("seed", range(5))
def test_reference_parity_random_streams(seed):
    """Chunked random streams through ours and the reference must emit
    identical phrases and carry identical state."""
    rng = np.random.default_rng(seed)
    n = 600
    pattern = "".join(rng.choice([".", "s"], p=[0.5, 0.5]) for _ in range(n))
    lp = make_logprobs(pattern) + rng.normal(0, 0.3, (n, V)).astype(np.float32)
    lp = (lp - np.log(np.exp(lp).sum(-1, keepdims=True))).astype(np.float32)

    ours, theirs = StreamingLogprobSplitter(), _ref.StreamingLogprobSplitter()
    s_a = s_b = None
    for i in range(0, n, 10):
        is_last = i + 10 >= n
        pa, s_a = ours.forward(lp[i:i + 10], s_a, is_last=is_last)
        pb, s_b = theirs.forward(lp[i:i + 10], s_b, is_last=is_last)
        assert len(pa) == len(pb)
        for x, y in zip(pa, pb):
            assert (x.start_frame, x.end_frame) == (y.start_frame, y.end_frame)
            np.testing.assert_array_equal(x.logprobs, y.logprobs)
        assert s_a.offset == s_b.offset
        np.testing.assert_array_equal(s_a.past_logprobs, s_b.past_logprobs)


# -- BatchLogprobSplitter: vectorized multi-stream parity --------------------


@pytest.mark.parametrize("seed", range(3))
def test_batch_splitter_equals_per_stream(seed):
    """The batched slot splitter must emit exactly what per-slot
    StreamingLogprobSplitter instances emit for the same chunk sequence
    (random speech/silence mixes, staggered is_last, slot reuse)."""
    from tone_tpu.splitter import BatchLogprobSplitter

    rng = np.random.default_rng(seed)
    n_slots, t, n_ticks = 16, 10, 60
    batch = BatchLogprobSplitter(n_slots)
    refs = [StreamingLogprobSplitter() for _ in range(n_slots)]
    states = [None] * n_slots
    # each slot ends at a different tick, then is reused
    end_tick = rng.integers(20, n_ticks - 1, n_slots)

    for tick in range(n_ticks):
        ticking = [s for s in range(n_slots) if rng.random() < 0.8]
        if not ticking:
            continue
        k = len(ticking)
        pattern = rng.choice([".", "s"], p=[0.6, 0.4], size=(k, t))
        lp = np.stack([make_logprobs("".join(row)) for row in pattern])
        lp += rng.normal(0, 0.2, lp.shape).astype(np.float32)
        lp = (lp - np.log(np.exp(lp).sum(-1, keepdims=True))).astype(np.float32)
        lasts = np.array([tick == end_tick[s] for s in ticking], bool)

        got = batch.forward_batch(lp, np.asarray(ticking, np.int64), lasts)
        for i, slot in enumerate(ticking):
            want, states[slot] = refs[slot].forward(
                lp[i], states[slot], is_last=bool(lasts[i]))
            have = got.get(slot, [])
            assert len(want) == len(have), (tick, slot)
            for x, y in zip(have, want):
                assert (x.start_frame, x.end_frame) == (y.start_frame, y.end_frame)
                np.testing.assert_array_equal(x.logprobs, y.logprobs)
            if lasts[i]:  # slot released + reacquired
                batch.reset(slot)
                refs[slot] = StreamingLogprobSplitter()
                states[slot] = None
                end_tick[slot] = n_ticks + 1


def test_batch_splitter_force_split_long_phrase():
    from tone_tpu.splitter import BatchLogprobSplitter

    batch = BatchLogprobSplitter(2)
    ref = StreamingLogprobSplitter()
    state = None
    lp_all = make_logprobs("s" * 2300 + "." * 40)
    got_frames, want_frames = [], []
    for i in range(0, len(lp_all), 10):
        lp = lp_all[i:i + 10][None]
        got = batch.forward_batch(lp, np.array([1], np.int64), np.array([False]))
        for p in got.get(1, []):
            got_frames.append((p.start_frame, p.end_frame, p.logprobs.shape[0]))
        want, state = ref.forward(lp[0], state)
        for p in want:
            want_frames.append((p.start_frame, p.end_frame, p.logprobs.shape[0]))
    assert got_frames == want_frames
    assert any(e - s == 2000 for s, e, _ in got_frames)  # force-split fired
