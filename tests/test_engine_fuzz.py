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
