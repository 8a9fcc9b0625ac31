"""Hotword (contextual-biasing) beam search.

The reference decodes via pyctcdecode, whose API supports hotword boosting
(unused by the reference itself); this is the tone_tpu equivalent wired
into the host beam search — aimed at the reference's weakest measured
category, named entities (reference README.md:153).
"""

import numpy as np
import pytest

from tone_tpu.config import LABELS
from tone_tpu.decoder import BeamSearchCTCDecoder, build_decoder
from tone_tpu.decoding.beam import StreamingBeamSearch, ctc_beam_search
from tone_tpu.decoding.hotwords import HotwordScorer

BLANK = len(LABELS)


def _logprobs(spec, T=None, gap=-9.0):
    """Build (T, V) logprobs: spec = list of {char: logit} per frame."""
    T = T or len(spec)
    logits = np.full((T, len(LABELS) + 1), gap, np.float64)
    for t, frame in enumerate(spec):
        for ch, v in frame.items():
            tok = BLANK if ch == "_" else LABELS.index(ch)
            logits[t, tok] = v
    for t in range(len(spec), T):
        logits[t, BLANK] = 0.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def _ambiguous(final_a, final_b, margin=0.05):
    """'ми' + ambiguous third char slightly favoring final_b."""
    return _logprobs([
        {"м": 0.0}, {"и": 0.0},
        {final_a: -0.5 - margin, final_b: -0.5},
        {"_": 0.0}, {"_": 0.0},
    ])


def test_hotword_flips_ambiguous_decode():
    lp = _ambiguous("р", "г")
    assert ctc_beam_search(lp, LABELS, beam_width=16) == "миг"
    hw = HotwordScorer(["мир"], weight=3.0)
    assert ctc_beam_search(lp, LABELS, beam_width=16, hotwords=hw) == "мир"


def test_boost_retracts_on_mismatch():
    """A hotword prefix that completes as a different word keeps the
    baseline result: tentative boost is retracted at the word boundary."""
    # Audio says clearly "мигание" — "мираж" shares only the "ми" prefix.
    spec = [{c: 0.0} for c in "мигание"]
    lp = _logprobs(spec, T=10)
    base = ctc_beam_search(lp, LABELS, beam_width=32)
    hw = HotwordScorer(["мираж"], weight=5.0)
    boosted = ctc_beam_search(lp, LABELS, beam_width=32, hotwords=hw)
    assert boosted == base == "мигание"


def test_phrase_hotword_spans_word_boundary():
    """Multi-word phrase: the first word's match carries across the space
    and biases the second word."""
    spec = [{c: 0.0} for c in "сан "]
    # Second word ambiguous between "дата" and "д?та" variants; phrase
    # hotword "сан дата" must pull the full phrase through.
    spec += [{"д": 0.0}, {"а": -0.5, "о": -0.45}, {"т": 0.0}, {"а": 0.0}]
    lp = _logprobs(spec, T=12)
    assert ctc_beam_search(lp, LABELS, beam_width=16) == "сан дота"
    hw = HotwordScorer(["сан дата"], weight=3.0)
    assert ctc_beam_search(lp, LABELS, beam_width=16, hotwords=hw) == "сан дата"
    # A phrase whose first word doesn't match gives no cross-boundary boost.
    hw2 = HotwordScorer(["зал дата"], weight=3.0)
    assert ctc_beam_search(lp, LABELS, beam_width=16, hotwords=hw2) == "сан дота"


def test_streaming_equals_batch_with_hotwords():
    """Chunked advance == one batch pass (the carried-state invariant holds
    with the hotword automaton on the beams)."""
    rng = np.random.default_rng(0)
    logits = rng.normal(0.0, 2.0, (30, len(LABELS) + 1))
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    hw = HotwordScorer(["привет", "сан дата"], weight=2.0)

    batch = ctc_beam_search(lp, LABELS, beam_width=12, hotwords=hw)
    search = StreamingBeamSearch(LABELS, beam_width=12, hotwords=hw)
    for start in (0, 7, 19):
        search.advance(lp[start:start + (7 if start == 0 else 12)])
    assert search.result() == batch


def test_interim_prefix_credit():
    """Mid-stream, an in-progress hotword prefix is already boosted — the
    property that makes biasing effective for interim transcripts."""
    spec = [{"м": 0.0}, {"и": -0.5, "н": -0.45}]
    lp = _logprobs(spec, T=2)
    search = StreamingBeamSearch(LABELS, beam_width=8,
                                 hotwords=HotwordScorer(["мир"], weight=3.0))
    search.advance(lp)
    assert search.result() == "ми"  # "мн..." would win without the boost


def test_facade_and_cli_dispatch():
    lp = _ambiguous("р", "г")
    dec = BeamSearchCTCDecoder(hotwords=["мир"], hotword_weight=3.0,
                               beam_width=16)
    assert dec.forward(lp.astype(np.float32)) == "мир"

    dec2 = build_decoder("beam", hotwords=["мир"], hotword_weight=3.0,
                         beam_width=16)
    assert dec2.forward(lp.astype(np.float32)) == "мир"

    with pytest.raises(ValueError, match="hotwords"):
        build_decoder("greedy", hotwords=["мир"])
    with pytest.raises(ValueError, match="no hotwords"):
        HotwordScorer([])
    with pytest.raises(ValueError, match="label set"):
        BeamSearchCTCDecoder(hotwords=["labs"])  # latin chars not in LABELS

    # A pre-built HotwordScorer keeps the fast native path (its phrase
    # list and weight rebuild the native automaton).
    from tone_tpu.decoding.native.beamsearch import native_available

    pre = BeamSearchCTCDecoder(hotwords=HotwordScorer(["мир"], 3.0),
                               beam_width=16)
    if native_available():
        assert pre._use_native and pre._native_hotwords is not None
    assert pre.forward(lp.astype(np.float32)) == "мир"


def test_device_search_equals_host_with_hotwords():
    """The on-TPU search with the automaton riding the beam state decodes
    exactly like the host hotword search — random logprobs, random
    phrase lists, batched with ragged lengths."""
    from tone_tpu.ops.beam_decode import (
        hot_beam_advance, hot_beam_nbest, init_hot_beam_state,
        make_hotword_tables)

    words = ["мир", "сан дата", "привет", "дом", "та", "дата дом"]
    rng = np.random.default_rng(7)
    for trial in range(4):
        B, T = 3, 30
        logits = rng.normal(0.0, 2.5, (B, T, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        lengths = rng.integers(8, T + 1, B)
        picks = list(rng.choice(len(words), 3, replace=False))
        phrases = [words[i] for i in picks]
        weight = float(rng.uniform(0.5, 3.0))

        tables = make_hotword_tables(phrases, weight)
        state = init_hot_beam_state(B, 16, max_len=64)
        state = hot_beam_advance(state, lp, lengths, hotwords=tables)
        dev = [h[0][0] if h else "" for h in hot_beam_nbest(state, 1)]
        host = [ctc_beam_search(lp[b, :lengths[b]], LABELS, beam_width=16,
                                hotwords=HotwordScorer(phrases, weight))
                for b in range(B)]
        assert dev == host, (trial, phrases, weight, lengths)


def test_device_decoder_facade_with_hotwords():
    """DeviceBeamSearchCTCDecoder(hotwords=...) biases forward/forward_batch
    and composes with host n-best LM rescoring."""
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder

    lp = _ambiguous("р", "г").astype(np.float32)
    plain = DeviceBeamSearchCTCDecoder(beam_width=16)
    assert plain.forward(lp) == "миг"
    dec = DeviceBeamSearchCTCDecoder(beam_width=16,
                                     hotwords=["мир"], hotword_weight=3.0)
    assert dec.forward(lp) == "мир"
    assert dec.forward_batch([lp, lp]) == ["мир", "мир"]

    dec2 = build_decoder("device-beam", hotwords=["мир"], hotword_weight=3.0,
                         beam_width=16)
    assert dec2.forward(lp) == "мир"


def test_engine_interim_device_beam_uses_hotword_arena():
    """A serving engine whose final decoder carries device hotword tables
    runs the interim arena through the biased variants — partials bias
    exactly like finals."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.ops import beam_decode as bd
    from tone_tpu.runtime.engine import MultiStreamEngine

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    dec = DeviceBeamSearchCTCDecoder(beam_width=8, hotwords=["мир"],
                                     hotword_weight=2.0)
    engine = MultiStreamEngine(variables, cfg, n_slots=2, decoder=dec,
                               interim_device_beam=True,
                               interim_beam_width=4)
    try:
        assert engine._interim_beam_ops()[0] is bd.init_hot_beam_state
        sid = engine.open_stream()
        rng = np.random.default_rng(0)
        interims = []
        for i in range(4):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            engine.feed(sid, chunk, is_last=(i == 3))
            engine.tick()
            interims.extend(engine.last_interims.values())
        assert isinstance(engine._device_beams, bd.HotBeamState)
        assert all(isinstance(t, str) for t in interims)
    finally:
        engine.shutdown()


def test_per_request_hotwords_engine():
    """With a device engine decoder, set_stream_hotwords stores the
    request's automaton TABLES on the stream (no decoder override object):
    the biased stream stays on the batched device-finals path, its rows
    decoding with their own stacked tables; results still flow for both
    streams."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.runtime.engine import MultiStreamEngine, UnknownStreamError

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    engine = MultiStreamEngine(variables, cfg, n_slots=2,
                               decoder=DeviceBeamSearchCTCDecoder(beam_width=8))
    try:
        biased = engine.open_stream()
        plain = engine.open_stream()
        engine.set_stream_hotwords(biased, ["мир"], 2.0)
        # Tables, not a decoder override: the stream keeps the batched path.
        assert engine._streams[biased].decoder is None
        assert engine._streams[biased].hotword_tables is not None
        assert engine._streams[plain].hotword_tables is None

        rng = np.random.default_rng(0)
        finals = {biased: [], plain: []}
        for i in range(4):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            last = i == 3
            engine.feed(biased, chunk, is_last=last)
            engine.feed(plain, chunk, is_last=last)
            for sid, futures in engine.tick().items():
                finals[sid].extend(f.result() for f in futures)
        assert finals[biased] and finals[plain]

        with pytest.raises(UnknownStreamError):
            engine.set_stream_hotwords(12345, ["мир"])
    finally:
        engine.shutdown()


def test_per_request_hotwords_keep_fused_lm():
    """With a fused-LM engine decoder, per-request hotwords become stacked
    table rows inside the SAME fused batched call — the biased stream keeps
    full shallow-fusion quality AND the batched-finals path (pre-rematch
    behavior dropped to LM-free host decode; pre-round-4 behavior dropped
    to per-phrase device calls)."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.device_lm import DeviceLM
    from tone_tpu.decoding.estimate import estimate_ngram_lm
    from tone_tpu.runtime.engine import MultiStreamEngine

    tables = estimate_ngram_lm([["мир", "дом"], ["дом"], ["мир"]], order=2)
    base = DeviceBeamSearchCTCDecoder(DeviceLM.from_ngrams(tables),
                                      beam_width=8, fusion=True)
    cfg = tiny_config()
    engine = MultiStreamEngine(init_model_params(jax.random.PRNGKey(0), cfg),
                               cfg, n_slots=2, decoder=base)
    try:
        sid = engine.open_stream()
        engine.set_stream_hotwords(sid, ["мир"], 2.0)
        assert engine._streams[sid].decoder is None
        assert engine._streams[sid].hotword_tables is not None
        assert engine.decoder.fusion  # finals decode through the fused LM

        rng = np.random.default_rng(0)
        finals = []
        for i in range(3):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            engine.feed(sid, chunk, is_last=(i == 2))
            for _, futures in engine.tick().items():
                finals.extend(f.result() for f in futures)
        assert finals and all(isinstance(p.text, str) for p in finals)
    finally:
        engine.shutdown()


def _tiny_device_engine(engine_hotwords=None, **engine_kwargs):
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.runtime.engine import MultiStreamEngine

    cfg = tiny_config()
    dec = DeviceBeamSearchCTCDecoder(beam_width=8, hotwords=engine_hotwords)
    return MultiStreamEngine(init_model_params(jax.random.PRNGKey(0), cfg),
                             cfg, n_slots=2, decoder=dec, **engine_kwargs)


def test_hotword_warm_targets_effective_bucket():
    """When the ENGINE decoder has its own hotword tables with a larger
    node count than a request's list, every mixed serving batch stacks at
    the engine tables' bucket (unbiased rows inherit them in
    _decode_bucket) — so the warm must compile THAT bucket, padded request
    tables and all, or the first biased final pays the compile inline."""
    from tone_tpu.ops.beam_decode import make_hotword_tables

    # ~40 chars of engine-wide hotwords -> tables pad past any 1-word request
    engine = _tiny_device_engine(
        engine_hotwords=["туманное утро", "железная дорога", "перрон"])
    try:
        engine_bucket = int(engine.decoder.hotword_tables.next_node.shape[0])
        small = make_hotword_tables(["мир"], 2.0)
        small_bucket = int(small.next_node.shape[0])
        assert small_bucket < engine_bucket  # the premise of the bug
        assert engine._effective_hotword_bucket(small) == engine_bucket

        warmed_with = []
        engine._warm_decode_buckets = (  # record instead of compiling
            lambda decoder, live=None, hotwords=None:
                warmed_with.append(hotwords))
        sid = engine.open_stream()
        engine.set_stream_hotwords(sid, ["мир"], 2.0)
        engine._decode_pool.shutdown(wait=True)  # flush the warm task
        assert engine_bucket in engine._warmed_hotword_buckets
        assert small_bucket not in engine._warmed_hotword_buckets
        assert len(warmed_with) == 1
        # the warm ran with the request tables PADDED to the serving bucket
        assert int(warmed_with[0].next_node.shape[0]) == engine_bucket
    finally:
        engine.shutdown()


def test_oversized_hotword_list_falls_back_to_per_stream_decoder():
    """A request list whose STACKED tables would blow the per-tick upload
    bound gets a per-stream device decoder override (per-phrase decodes)
    instead of riding the batched stacked-table path — correctness kept,
    the 100 MB-per-tick upload avoided."""
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder

    engine = _tiny_device_engine()
    try:
        engine.MAX_STACKED_HOTWORD_BYTES = 1  # force the bound for the test
        sid = engine.open_stream()
        engine.set_stream_hotwords(sid, ["мир"], 2.0)
        s = engine._streams[sid]
        assert s.hotword_tables is None
        assert isinstance(s.decoder, DeviceBeamSearchCTCDecoder)
        assert s.decoder.hotword_tables is not None
        assert not engine._warmed_hotword_buckets  # no stacked warm queued

        rng = np.random.default_rng(0)
        finals = []
        for i in range(3):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            engine.feed(sid, chunk, is_last=(i == 2))
            for _, futs in engine.tick().items():
                finals.extend(f.result(timeout=60) for f in futs)
        assert finals and all(isinstance(p.text, str) for p in finals)
        # the per-phrase result matches a dedicated decoder exactly
        # (the override IS a dedicated decoder sharing the engine LM)
    finally:
        engine.shutdown()


def test_hotword_warm_failure_unmarks_bucket():
    """A warm that dies (transient device error) must not permanently
    disable warming for its bucket: the next same-sized request retries."""
    engine = _tiny_device_engine()
    try:
        calls = {"n": 0}

        def flaky_warm(decoder, live=None, hotwords=None):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected warm failure")

        engine._warm_decode_buckets = flaky_warm
        s1 = engine.open_stream()
        engine.set_stream_hotwords(s1, ["мир"], 2.0)
        # wait for the (failing) warm task without shutting the pool down
        import time

        for _ in range(200):
            with engine._lock:
                if not engine._warmed_hotword_buckets:
                    break
            time.sleep(0.01)
        assert not engine._warmed_hotword_buckets  # un-marked on failure
        s2 = engine.open_stream()
        engine.set_stream_hotwords(s2, ["дом"], 2.0)  # same node bucket
        engine._decode_pool.shutdown(wait=True)
        assert calls["n"] == 2  # the second request retried the warm
        assert engine._warmed_hotword_buckets  # and it stuck this time
    finally:
        engine.shutdown()


def test_warmup_prewarms_hotword_buckets():
    """warmup() compiles the per-request-biased program family for the
    configured node buckets (default 32), so the FIRST biased request of a
    warmed size triggers no lazy warm at all."""
    engine = _tiny_device_engine(hotword_warmup_buckets=(32,))
    try:
        warmed_with = []
        engine._warm_decode_buckets = (
            lambda decoder, live=None, hotwords=None:
                warmed_with.append(hotwords))
        engine.arena.warmup = lambda: None  # not under test (slow)
        engine.warmup()
        assert 32 in engine._warmed_hotword_buckets
        # one plain warm (hotwords=None) + one biased warm at bucket 32
        assert [h.next_node.shape[0] for h in warmed_with
                if h is not None] == [32]
        # a typical 3-word request pads to exactly that bucket: no new warm
        n_warms = len(warmed_with)
        sid = engine.open_stream()
        engine.set_stream_hotwords(sid, ["абонент", "тариф", "адрес"], 10.0)
        engine._decode_pool.shutdown(wait=True)
        assert len(warmed_with) == n_warms  # bucket already covered
    finally:
        engine.shutdown()


def test_hotwords_reject_lone_string_and_clear():
    """A lone string is a type error everywhere (it would iterate into
    per-character hotwords); an empty list clears an engine override."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.runtime.engine import MultiStreamEngine

    with pytest.raises(TypeError, match="string"):
        HotwordScorer("мир")
    with pytest.raises(TypeError, match="string"):
        BeamSearchCTCDecoder(hotwords="мир")

    cfg = tiny_config()
    engine = MultiStreamEngine(init_model_params(jax.random.PRNGKey(0), cfg),
                               cfg, n_slots=1)
    try:
        sid = engine.open_stream()
        engine.set_stream_hotwords(sid, ["мир"])
        assert engine._streams[sid].decoder is not None
        engine.set_stream_hotwords(sid, [])
        assert engine._streams[sid].decoder is None
    finally:
        engine.shutdown()


def test_batched_hotword_rows_match_dedicated_decoders():
    """One batched call with per-row stacked tables decodes each row exactly
    as a dedicated decoder built with that row's hotwords — in both the
    rescoring and fused-LM modes.  This is the serving path that keeps
    hundreds of differently-biased streams on the batched finals call."""
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.device_lm import DeviceLM
    from tone_tpu.decoding.estimate import estimate_ngram_lm
    from tone_tpu.ops.beam_decode import make_hotword_tables

    lp_a = _ambiguous("р", "г").astype(np.float32)   # 'мир' needs the boost
    lp_b = _ambiguous("г", "р").astype(np.float32)   # 'миг' needs the boost
    rows = [lp_a, lp_b, lp_a]
    hw_rows = [make_hotword_tables(["мир"], 3.0),
               make_hotword_tables(["миг"], 3.0),
               None]

    def check(base_kwargs):
        batched = DeviceBeamSearchCTCDecoder(beam_width=8, **base_kwargs)
        got = batched.forward_batch(rows, hotword_rows=hw_rows)
        want = []
        for lp, hws in zip(rows, [["мир"], ["миг"], None]):
            dec = DeviceBeamSearchCTCDecoder(beam_width=8, hotwords=hws,
                                             hotword_weight=3.0,
                                             **base_kwargs)
            want.append(dec.forward(lp))
        assert got == want, (got, want)
        assert got[0] == "мир" and got[1] == "миг"

    check({})  # LM-free device search
    tables = estimate_ngram_lm([["мир", "миг"], ["миг"], ["мир"]], order=2)
    check({"lm": DeviceLM.from_ngrams(tables), "fusion": True})


def test_ws_config_frame_sets_hotwords():
    """A JSON text frame configures per-request hotwords over the wire;
    binary-only (reference) clients are unaffected."""
    import asyncio
    import json as _json
    import sys
    from pathlib import Path

    import jax

    websockets = pytest.importorskip("websockets")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.runtime.engine import MultiStreamEngine
    from tone_tpu.runtime.server import TranscriptionServer

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=2)
        server = TranscriptionServer(engine, tick_seconds=0.02)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
                port = srv.sockets[0].getsockname()[1]
                async with websockets.connect(
                        f"ws://127.0.0.1:{port}/api/ws") as ws:
                    assert _json.loads(await ws.recv())["event"] == "ready"
                    await ws.send(_json.dumps(
                        {"hotwords": ["мир"], "hotword_weight": 2.0}))
                    ack = _json.loads(await ws.recv())
                    assert ack == {"event": "config", "hotwords": 1}
                    await ws.send(_json.dumps({"hotwords": 5}))  # bad type
                    err = _json.loads(await ws.recv())
                    assert err["event"] == "error"
                    rng = np.random.default_rng(0)
                    pcm = rng.integers(-20000, 20000, 2400 * 3).astype("<i2")
                    await ws.send(pcm.tobytes())
                    await ws.send(b"")
                    events = []
                    try:
                        while True:
                            events.append(_json.loads(
                                await asyncio.wait_for(ws.recv(), timeout=20)))
                    except (asyncio.TimeoutError,
                            websockets.ConnectionClosed):
                        pass
                    assert any(e["event"] == "transcript" for e in events)
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_fused_device_search_with_hotwords_equals_host():
    """Full on-TPU shallow fusion + hotword biasing together == the host
    search running the same LM fusion and the same automaton.  The LM is
    built by the in-framework estimator (dogfooding estimate.py)."""
    from tone_tpu.decoding.device_lm import DeviceLM
    from tone_tpu.decoding.estimate import estimate_ngram_lm
    from tone_tpu.decoding.lm import ArpaLM
    from tone_tpu.ops.beam_decode import (
        fused_beam_advance, fused_beam_nbest, init_fused_beam_state,
        make_hotword_tables)

    rng = np.random.default_rng(11)
    corpus = [["мир", "дом"], ["дом", "та"], ["мир"], ["та", "мир", "дом"]]
    tables = estimate_ngram_lm(corpus, order=2)
    arpa, dev_lm = ArpaLM(tables), DeviceLM.from_ngrams(tables)
    arrs = dev_lm.arrays()

    for trial in range(4):
        B, T = 2, 24
        logits = rng.normal(0.0, 2.5, (B, T, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        phrases = ["дом", "сан дата"]
        weight = float(rng.uniform(0.5, 2.5))

        hw_tables = make_hotword_tables(phrases, weight)
        st = init_fused_beam_state(B, 12, dev_lm, max_len=64,
                                   hotwords=hw_tables)
        st = fused_beam_advance(st, lp, arrs, hotwords=hw_tables)
        got = [h[0][0] if h else "" for h in fused_beam_nbest(st, dev_lm, 1)]

        want = [ctc_beam_search(lp[b].astype(np.float64), LABELS, arpa,
                                beam_width=12,
                                hotwords=HotwordScorer(phrases, weight))
                for b in range(B)]
        assert got == want, (trial, weight)


def test_native_equals_python_with_hotwords():
    """The C++ twin implements the identical automaton: random logprobs,
    random hotword lists — decodes must match the Python search exactly."""
    from tone_tpu.decoding.native.beamsearch import (
        NativeHotwords, NativeStreamingBeam, ctc_beam_search_native,
        native_available)

    if not native_available():
        pytest.skip("no C++ toolchain")

    words = ["мир", "сан дата", "привет", "дом", "та", "а", "дата дом",
             "дом мир"]
    rng = np.random.default_rng(1)
    for trial in range(8):
        logits = rng.normal(0.0, 2.5, (40, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        picks = list(rng.choice(len(words), size=rng.integers(1, 5),
                                replace=False))
        phrases = [words[i] for i in picks]
        weight = float(rng.uniform(0.5, 4.0))

        py = ctc_beam_search(lp, LABELS, beam_width=16,
                             hotwords=HotwordScorer(phrases, weight))
        nat = ctc_beam_search_native(
            lp.astype(np.float32), LABELS, beam_width=16,
            hotwords=NativeHotwords(LABELS, phrases, weight))
        assert nat == py, (trial, phrases, weight)

        # carried-state twin too
        stream = NativeStreamingBeam(LABELS, beam_width=16,
                                     hotwords=NativeHotwords(
                                         LABELS, phrases, weight))
        stream.advance(lp[:17].astype(np.float32))
        stream.advance(lp[17:].astype(np.float32))
        assert stream.result() == py


def test_scorer_parks_after_mismatch():
    """Falling off the trie parks the automaton until the next word
    boundary — matches can only begin at word starts."""
    hw = HotwordScorer(["мир"], weight=1.0)
    state, d1 = hw.step((0, 0.0), "м")
    assert d1 == 1.0
    state, d2 = hw.step(state, "я")  # off-trie: retract and park
    assert d2 == -1.0 and state == (-1, 0.0)
    state, d3 = hw.step(state, "м")  # mid-word "м" must NOT restart a match
    assert d3 == 0.0 and state == (-1, 0.0)
    state, d4 = hw.step(state, " ")  # boundary rearms
    assert d4 == 0.0 and state == (0, 0.0)
    state, d5 = hw.step(state, "м")
    assert d5 == 1.0


def test_no_boost_for_suffix_matching_words():
    """A word merely ENDING with a hotword gets zero net boost."""
    hw = HotwordScorer(["мир"], weight=2.0)
    state, total = (0, 0.0), 0.0
    for ch in "владимир ":
        state, d = hw.step(state, ch)
        total += d
    assert total == 0.0
    # ...while the hotword itself commits in full
    state, total = (0, 0.0), 0.0
    for ch in "мир ":
        state, d = hw.step(state, ch)
        total += d
    assert total == 6.0


def test_rematch_overlapping_phrases():
    """Aho–Corasick word-aligned rematch: a phrase starting inside another
    phrase's consumed words still matches — each overlapping phrase earns
    its full boost."""

    def total(hw, text):
        state, acc = (0, 0.0), 0.0
        for ch in text:
            state, d = hw.step(state, ch)
            acc += d
        return acc

    w = 1.0
    # commit-then-rematch: "сан дата" commits, "дата центр" picks up "дата"
    hw = HotwordScorer(["сан дата", "дата центр"], weight=w)
    assert total(hw, "сан дата центр ") == 8.0 + 10.0
    # falloff-then-rematch: "аб вгх" dies at the boundary, "вг дж" takes over
    hw2 = HotwordScorer(["аб вгх", "вг дж"], weight=w)
    assert total(hw2, "аб вг дж ") == 5.0
    # rematch only at word-aligned suffixes: "вг" inside the word "авг"
    # stays unmatched even while "ав" is being followed
    hw3 = HotwordScorer(["ав", "вг"], weight=w)
    assert total(hw3, "авг ") == 0.0
    # self-overlap: two occurrences of "дата дата" in "дата дата дата"
    hw4 = HotwordScorer(["дата дата"], weight=w)
    assert total(hw4, "дата дата дата ") == 18.0 + 5.0  # +in-progress prefix


def test_rematch_flips_decode_all_engines():
    """Decode-level: with overlapping phrase hotwords the second phrase's
    ambiguous word is pulled through in every search engine (the case the
    pre-rematch automaton missed)."""
    spec = [{c: 0.0} for c in "сан дата "]
    spec += [{"ц": 0.0}, {"е": -0.5, "и": -0.45}, {"н": 0.0}, {"т": 0.0},
             {"р": 0.0}]
    lp = _logprobs(spec, T=17)
    assert ctc_beam_search(lp, LABELS, beam_width=16) == "сан дата цинтр"
    hw = HotwordScorer(["сан дата", "дата центр"], weight=3.0)
    want = "сан дата центр"
    assert ctc_beam_search(lp, LABELS, beam_width=16, hotwords=hw) == want

    from tone_tpu.decoding.native.beamsearch import (
        NativeHotwords, ctc_beam_search_native, native_available)
    if native_available():
        nat = ctc_beam_search_native(
            lp.astype(np.float32), LABELS, beam_width=16,
            hotwords=NativeHotwords(LABELS, ["сан дата", "дата центр"], 3.0))
        assert nat == want

    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    dev = DeviceBeamSearchCTCDecoder(
        beam_width=16, hotwords=["сан дата", "дата центр"], hotword_weight=3.0)
    assert dev.forward(lp.astype(np.float32)) == want


def test_short_hotword_commits_under_longer_phrase():
    """A completed hotword that is also a prefix of a longer phrase commits
    at its boundary; only the continuation stays tentative."""
    hw = HotwordScorer(["сан", "сан дата"], weight=2.0)
    state, total = (0, 0.0), 0.0
    for ch in "сан дом ":  # phrase continuation fails at "д-о"
        state, d = hw.step(state, ch)
        total += d
    # "сан" (3 chars) committed; the space + "д" tentatives retracted.
    assert total == 6.0
    # and the full phrase still accrues everything when it completes
    state, total = (0, 0.0), 0.0
    for ch in "сан дата ":
        state, d = hw.step(state, ch)
        total += d
    assert total == 2.0 * len("сан дата")


def test_terminal_suffix_commits_when_longer_match_dies():
    """A word-aligned suffix that is itself a complete hotword commits its
    full value at a boundary where the longer match dies — with or without
    a rematch continuation (the case the single-path automaton previously
    dropped: ["аб в", "в"] on "аб в " gave "в" nothing)."""

    def total(hw, text):
        state, acc = (0, 0.0), 0.0
        for ch in text:
            state, d = hw.step(state, ch)
            acc += d
        return acc

    # no-rematch boundary: "аб в" commits AND its suffix word "в" commits
    hw = HotwordScorer(["аб в", "в"], weight=1.0)
    assert total(hw, "аб в ") == 4.0 + 1.0
    # top node not terminal: the dying prefix retracts, the completed
    # suffix word still commits
    hw2 = HotwordScorer(["аб вг", "в"], weight=1.0)
    assert total(hw2, "аб в ") == 1.0
    # rematch boundary: suffixes longer than the rematch target commit as
    # a bonus ("б в"); the rematch ("в г") carries its own fresh value
    hw3 = HotwordScorer(["а б в", "б в", "в г"], weight=1.0)
    assert total(hw3, "а б в г ") == 5.0 + 3.0 + 3.0


def test_suffix_commit_flips_decode_all_engines():
    """Decode-level: the terminal-suffix commit decides an ambiguous word
    in every search engine (host Python, native C++, device)."""
    spec = [{c: 0.0} for c in "аб "]
    spec += [{"в": -0.55, "з": -0.5}, {" ": 0.0}]
    spec += [{c: 0.0} for c in "да"]
    lp = _logprobs(spec, T=12)
    assert ctc_beam_search(lp, LABELS, beam_width=16) == "аб з да"
    hw = HotwordScorer(["аб вг", "в"], weight=3.0)
    want = "аб в да"
    assert ctc_beam_search(lp, LABELS, beam_width=16, hotwords=hw) == want

    from tone_tpu.decoding.native.beamsearch import (
        NativeHotwords, ctc_beam_search_native, native_available)
    if native_available():
        nat = ctc_beam_search_native(
            lp.astype(np.float32), LABELS, beam_width=16,
            hotwords=NativeHotwords(LABELS, ["аб вг", "в"], 3.0))
        assert nat == want

    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    dev = DeviceBeamSearchCTCDecoder(
        beam_width=16, hotwords=["аб вг", "в"], hotword_weight=3.0)
    assert dev.forward(lp.astype(np.float32)) == want
