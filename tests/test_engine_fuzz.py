"""Engine lifecycle property test: randomized interleavings of
open/feed/tick/close/suspend/resume/candidate-bind/evict with invariants
checked after every operation.

Models Triton's sequence-batcher robustness contract
(reference triton/model/config.pbtxt:30-76): slots are never
double-assigned, candidates queue FIFO, and every accepted stream ends in
exactly one of {finished, evicted, suspended}."""

from __future__ import annotations

import random

import jax
import numpy as np
import pytest

from tone_tpu.config import EncoderConfig, ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.decoder import GreedyCTCDecoder
from tone_tpu.runtime.engine import MultiStreamEngine, UnknownStreamError

N_SLOTS = 3
MAX_CANDIDATES = 3


@pytest.fixture(scope="module")
def tiny():
    enc = EncoderConfig(
        n_layers=2, d_model=64, n_heads=4, rope_dim=16, ff_expansion_factor=2,
        conv_kernel_size=7, subsampling_conv_channels=(4, 8),
        mhsa_stateless_layers=1, reduction_position=0, upsample_position=1,
        should_recompute_att_scores=(True, True))
    cfg = ToneConfig(encoder=enc, compute_dtype="float32")
    return cfg, init_model_params(jax.random.PRNGKey(0), cfg)


def _check_invariants(engine: MultiStreamEngine) -> None:
    with engine._lock:
        slotted = [s.slot for s in engine._streams.values()
                   if s.slot is not None]
        # no slot double-assignment, no slot both free and assigned,
        # accounting sums to the arena size
        assert len(slotted) == len(set(slotted)), "slot double-assigned"
        assert set(slotted).isdisjoint(engine._free_slots), \
            "slot simultaneously free and assigned"
        assert len(slotted) + len(engine._free_slots) == N_SLOTS
        # candidates are exactly the slotless live streams, FIFO-unique
        pending = list(engine._pending_bind)
        assert len(pending) == len(set(pending))
        slotless = {sid for sid, s in engine._streams.items()
                    if s.slot is None}
        assert slotless == {sid for sid in pending
                            if sid in engine._streams}
        # a free slot with candidates waiting would mean the binder stalled
        if engine._free_slots and not engine._inflight:
            assert not any(sid in engine._streams for sid in pending), \
                "free slot while candidates wait"


def test_engine_lifecycle_fuzz(tiny):
    cfg, variables = tiny
    rng = random.Random(20260819)
    nprng = np.random.default_rng(0)
    engine = MultiStreamEngine(
        variables, cfg, n_slots=N_SLOTS, decoder=GreedyCTCDecoder(),
        max_candidates=MAX_CANDIDATES, candidate_buffer_chunks=8,
        idle_evict_seconds=3600.0,  # only pressure-evict, deterministically
        force_evict_grace=0.0)
    n = cfg.audio_chunk_samples

    live: set[int] = set()        # sids we believe are alive
    opened: set[int] = set()
    finished: set[int] = set()
    evicted: set[int] = set()
    suspended: set[int] = set()
    snapshots: list[dict] = []
    futures = []

    def poll():
        for sid in engine.pop_finished():
            assert sid not in finished, "stream finished twice"
            finished.add(sid)
            live.discard(sid)
        for sid in engine.pop_evicted():
            assert sid not in evicted, "stream evicted twice"
            assert sid not in finished, "finished stream evicted"
            evicted.add(sid)
            live.discard(sid)

    ops = ["open", "feed", "feed", "tick", "tick", "close",
           "suspend", "resume"]
    for step in range(400):
        op = rng.choice(ops)
        try:
            if op == "open":
                sid = engine.open_stream()
                live.add(sid)
                opened.add(sid)
            elif op == "feed" and live:
                sid = rng.choice(sorted(live))
                chunk = nprng.integers(-20000, 20000,
                                       rng.randrange(1, n + 1)).astype(np.int16)
                engine.feed(sid, chunk, is_last=rng.random() < 0.1)
            elif op == "tick":
                for sid, futs in engine.tick().items():
                    futures.extend(futs)
            elif op == "close" and live:
                engine.close_stream(rng.choice(sorted(live)))
            elif op == "suspend" and live:
                sid = rng.choice(sorted(live))
                snapshots.append(engine.suspend_stream(sid))
                suspended.add(sid)
                live.discard(sid)
            elif op == "resume" and snapshots:
                sid = engine.resume_stream(
                    snapshots.pop(rng.randrange(len(snapshots))))
                live.add(sid)
                opened.add(sid)
        except UnknownStreamError:
            pass  # stream ended (eviction/finish) before the op landed
        except RuntimeError as e:
            # legal refusals only: capacity, undrained suspend, candidate
            # suspend, mid-suspend race
            assert any(t in str(e) for t in (
                "no free stream slots", "in flight", "waiting candidate",
                "mid-suspend")), e
        poll()
        _check_invariants(engine)

    # Drain: close everything and tick until the engine is quiet.
    for sid in sorted(live):
        engine.close_stream(sid)
    for _ in range(200):
        for sid, futs in engine.tick().items():
            futures.extend(futs)
        poll()
        _check_invariants(engine)
        if not live and not engine.has_backlog():
            break
    assert not live, f"streams never terminated: {live}"

    # Every opened stream ended in exactly one terminal state.
    assert opened == (finished | evicted | suspended)
    assert not (finished & evicted)
    assert not (finished & suspended)
    # (suspended & evicted can only overlap if a suspended sid were later
    # evicted — impossible, its slot was released at suspend time)
    assert not (suspended & evicted)

    # No future leaks: every decode the engine handed out completes.
    for fut in futures:
        phrase = fut.result(timeout=30) if hasattr(fut, "result") else fut
        assert hasattr(phrase, "text")

    engine.shutdown()


def test_engine_lifecycle_fuzz_flagship_config(tiny):
    """The SAME randomized lifecycle interleavings, but against the
    flagship serving configuration: device-beam batched finals, interim
    device beams, per-request hotwords and n-best overrides as fuzz ops.
    The greedy fuzz above already paid for itself (freed-slot stall); this
    one covers the interactions of the production path nobody targeted.

    Extra invariants over the greedy fuzz:
    * a reused/new/resumed slot's FIRST tick always resets its interim
      beam-arena row (no beam state leaks across slot reuse);
    * every batched device final equals a replay of its phrase on a
      DEDICATED decoder built with that stream's hotword/n-best settings
      (text and alternatives both).
    """
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder

    cfg, variables = tiny
    rng = random.Random(20260820)
    nprng = np.random.default_rng(2)
    BEAM_W = 4
    engine = MultiStreamEngine(
        variables, cfg, n_slots=N_SLOTS,
        decoder=DeviceBeamSearchCTCDecoder(beam_width=BEAM_W),
        interim_device_beam=True, interim_beam_width=4,
        final_decode_batch=4,
        max_candidates=MAX_CANDIDATES, candidate_buffer_chunks=8,
        idle_evict_seconds=3600.0, force_evict_grace=0.0,
        hotword_warmup_buckets=())
    # The lazy hotword warm compiles a full frame-bucket ladder per node
    # bucket — perf infrastructure tested elsewhere (test_hotwords); no-op
    # it here so the fuzz exercises semantics, not compiles.
    engine._warm_decode_buckets = lambda *a, **k: None
    n = cfg.audio_chunk_samples

    # -- invariant hooks ----------------------------------------------------
    captured: list[tuple] = []  # (future, logprobs, nbest, hotword key)
    orig_decode_batch = engine._decode_batch

    def capturing_decode_batch(items):
        for fut, phrase, nb, hw in items:
            captured.append((fut, np.array(phrase.logprobs, np.float32),
                             nb, None if hw is None else id(hw)))
        orig_decode_batch(items)

    engine._decode_batch = capturing_decode_batch

    orig_beam_tick = engine._tick_device_beams

    def reset_checking_beam_tick(logprobs, ticking, by_slot, beam_reset):
        for sid, stream, _ in ticking:
            if stream.ticks == 0:  # first tick after open/bind/resume
                assert beam_reset[stream.slot], (
                    f"slot {stream.slot} reused without an interim beam "
                    f"reset (sid {sid})")
        return orig_beam_tick(logprobs, ticking, by_slot, beam_reset)

    engine._tick_device_beams = reset_checking_beam_tick

    HOTWORD_LISTS = [["мир"], ["дом", "лес"], ["привет"]]
    hw_words: dict[int, tuple[list, float]] = {}  # id(tables) -> settings

    live: set[int] = set()
    opened: set[int] = set()
    finished: set[int] = set()
    evicted: set[int] = set()
    suspended: set[int] = set()
    snapshots: list[dict] = []
    futures = []

    def poll():
        for sid in engine.pop_finished():
            assert sid not in finished, "stream finished twice"
            finished.add(sid)
            live.discard(sid)
        for sid in engine.pop_evicted():
            assert sid not in evicted, "stream evicted twice"
            assert sid not in finished, "finished stream evicted"
            evicted.add(sid)
            live.discard(sid)

    def note_tables(sid, words, weight):
        tables = engine._streams[sid].hotword_tables
        if tables is not None:
            hw_words[id(tables)] = (words, weight)

    ops = ["open", "feed", "feed", "tick", "tick", "close",
           "suspend", "resume", "hotwords", "nbest"]
    for step in range(300):
        op = rng.choice(ops)
        try:
            if op == "open":
                sid = engine.open_stream()
                live.add(sid)
                opened.add(sid)
            elif op == "feed" and live:
                sid = rng.choice(sorted(live))
                chunk = nprng.integers(-20000, 20000,
                                       rng.randrange(1, n + 1)).astype(np.int16)
                engine.feed(sid, chunk, is_last=rng.random() < 0.1)
            elif op == "tick":
                for sid, futs in engine.tick().items():
                    futures.extend(futs)
            elif op == "close" and live:
                engine.close_stream(rng.choice(sorted(live)))
            elif op == "suspend" and live:
                sid = rng.choice(sorted(live))
                snapshots.append(engine.suspend_stream(sid))
                suspended.add(sid)
                live.discard(sid)
            elif op == "resume" and snapshots:
                sid = engine.resume_stream(
                    snapshots.pop(rng.randrange(len(snapshots))))
                live.add(sid)
                opened.add(sid)
                if sid in engine._streams:  # re-applied biasing at resume
                    s = engine._streams[sid]
                    if s.hotwords:
                        note_tables(sid, list(s.hotwords[0]), s.hotwords[1])
            elif op == "hotwords" and live:
                sid = rng.choice(sorted(live))
                if rng.random() < 0.25:
                    engine.set_stream_hotwords(sid, [])  # clear
                else:
                    words = rng.choice(HOTWORD_LISTS)
                    engine.set_stream_hotwords(sid, words, 2.0)
                    note_tables(sid, words, 2.0)
            elif op == "nbest" and live:
                sid = rng.choice(sorted(live))
                engine.set_stream_nbest(sid, rng.choice([0, 2, 3]))
        except UnknownStreamError:
            pass  # stream ended (eviction/finish) before the op landed
        except RuntimeError as e:
            assert any(t in str(e) for t in (
                "no free stream slots", "in flight", "waiting candidate",
                "mid-suspend")), e
        poll()
        _check_invariants(engine)
        # interims only ever surface for streams that were live this tick
        assert not (set(engine.last_interims) - opened)

    for sid in sorted(live):
        engine.close_stream(sid)
    for _ in range(200):
        for sid, futs in engine.tick().items():
            futures.extend(futs)
        poll()
        _check_invariants(engine)
        if not live and not engine.has_backlog():
            break
    assert not live, f"streams never terminated: {live}"
    assert opened == (finished | evicted | suspended)

    for fut in futures:
        phrase = fut.result(timeout=60) if hasattr(fut, "result") else fut
        assert hasattr(phrase, "text")

    engine.shutdown()

    # -- replay: every batched final vs a dedicated decoder ------------------
    assert captured, "fuzz never exercised the batched finals path"
    assert any(hw is not None for _, _, _, hw in captured), \
        "fuzz never exercised a biased batched final"
    assert any(nb > 1 for _, _, nb, _ in captured), \
        "fuzz never exercised an n-best batched final"
    plain = DeviceBeamSearchCTCDecoder(beam_width=BEAM_W)
    dedicated: dict = {None: plain}
    for fut, logprobs, nb, hw_key in captured:
        if hw_key not in dedicated:
            words, weight = hw_words[hw_key]
            dedicated[hw_key] = DeviceBeamSearchCTCDecoder(
                beam_width=BEAM_W, hotwords=words, hotword_weight=weight)
        dec = dedicated[hw_key]
        got = fut.result(timeout=60)
        if nb > 1:
            expect = dec.nbest(logprobs, nb)
            assert got.text == (expect[0][0] if expect else "")
            assert list(got.nbest) == expect
        else:
            assert got.text == dec.forward(logprobs)


def test_engine_fuzz_with_candidates_churn(tiny):
    """Heavier candidate pressure: more streams than slots+queue, constant
    feeding — exercises the buffer cap and force-evict paths."""
    cfg, variables = tiny
    rng = random.Random(7)
    nprng = np.random.default_rng(1)
    engine = MultiStreamEngine(
        variables, cfg, n_slots=2, decoder=GreedyCTCDecoder(),
        max_candidates=2, candidate_buffer_chunks=3,
        idle_evict_seconds=3600.0, force_evict_grace=0.0)
    n = cfg.audio_chunk_samples

    live: list[int] = []
    opened = finished = evicted = 0
    for step in range(250):
        r = rng.random()
        try:
            if r < 0.3:
                live.append(engine.open_stream())
                opened += 1
            elif r < 0.8 and live:
                sid = rng.choice(live)
                engine.feed(sid, nprng.integers(-100, 100, n).astype(np.int16),
                            is_last=rng.random() < 0.15)
            else:
                engine.tick()
        except UnknownStreamError:
            pass
        except RuntimeError as e:
            assert "no free stream slots" in str(e), e
        finished += len(engine.pop_finished())
        ev = engine.pop_evicted()
        evicted += len(ev)
        live = [s for s in live if s in engine._streams]
        with engine._lock:
            slotted = [s.slot for s in engine._streams.values()
                       if s.slot is not None]
            assert len(slotted) == len(set(slotted))
            assert len(slotted) + len(engine._free_slots) == 2

    for sid in list(live):
        engine.close_stream(sid)
    for _ in range(100):
        engine.tick()
        finished += len(engine.pop_finished())
        evicted += len(engine.pop_evicted())
        if not engine._streams and not engine.has_backlog():
            break
    assert not engine._streams
    assert finished + evicted == opened
    engine.shutdown()
