"""N-best hypothesis lists (pyctcdecode decode_beams parity) across the
host (Python + C++) and device decoders."""

import numpy as np
import pytest

from tone_tpu.config import LABELS
from tone_tpu.decoder import BeamSearchCTCDecoder, DeviceBeamSearchCTCDecoder
from tone_tpu.decoding.beam import StreamingBeamSearch

V = len(LABELS) + 1


def _random_lp(rng, t=25):
    logits = rng.normal(0.0, 2.5, (t, V))
    return (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            ).astype(np.float32)


def test_python_nbest_ranking_and_dedup():
    rng = np.random.default_rng(0)
    lp = _random_lp(rng).astype(np.float64)
    search = StreamingBeamSearch(LABELS, beam_width=16)
    search.advance(lp)
    hyps = search.nbest(8)
    assert hyps[0][0] == search.result()
    scores = [s for _, s in hyps]
    assert scores == sorted(scores, reverse=True)
    texts = [t for t, _ in hyps]
    assert len(set(texts)) == len(texts)
    assert 1 <= len(hyps) <= 8


def test_native_nbest_matches_python():
    from tone_tpu.decoding.native.beamsearch import (
        NativeStreamingBeam, native_available)

    if not native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(1)
    for _ in range(4):
        lp = _random_lp(rng, 30)
        py = StreamingBeamSearch(LABELS, beam_width=12)
        py.advance(lp.astype(np.float64))
        nat = NativeStreamingBeam(LABELS, beam_width=12)
        nat.advance(lp)
        want = py.nbest(6)
        got = nat.nbest(6)
        assert [t for t, _ in got] == [t for t, _ in want]
        np.testing.assert_allclose([s for _, s in got],
                                   [s for _, s in want], rtol=1e-5)


def test_facade_nbest():
    rng = np.random.default_rng(2)
    lp = _random_lp(rng)
    dec = BeamSearchCTCDecoder(beam_width=16)
    hyps = dec.nbest(lp, 5)
    assert hyps[0][0] == dec.forward(lp)
    assert len(hyps) <= 5

    # hotworded facade nbest ranks the boosted text first
    hw = BeamSearchCTCDecoder(beam_width=16, hotwords=["мир"],
                              hotword_weight=4.0)
    hyps_hw = hw.nbest(lp, 5)
    assert hyps_hw[0][0] == hw.forward(lp)


def test_device_nbest():
    rng = np.random.default_rng(3)
    lp = _random_lp(rng)
    dec = DeviceBeamSearchCTCDecoder(beam_width=16, nbest=6)
    hyps = dec.nbest(lp)
    assert hyps and hyps[0][0] == dec.forward(lp)
    scores = [s for _, s in hyps]
    assert scores == sorted(scores, reverse=True)

    hot = DeviceBeamSearchCTCDecoder(beam_width=16, nbest=6,
                                     hotwords=["мир"], hotword_weight=2.0)
    hyps_hot = hot.nbest(lp, 4)
    assert hyps_hot and hyps_hot[0][0] == hot.forward(lp)


def test_device_nbest_dedup_and_top1_with_rescoring():
    """Device nbest collapses stripped-text twins and, for n below the
    decoder's pool, still rescoring-ranks the FULL pool so top-1 agrees
    with forward()."""
    from tone_tpu.decoding.estimate import estimate_ngram_lm
    from tone_tpu.decoding.lm import ArpaLM

    tables = estimate_ngram_lm([["мир", "дом"], ["дом"], ["мир"]], order=2)
    dec = DeviceBeamSearchCTCDecoder(ArpaLM(tables), beam_width=16, nbest=8)
    rng = np.random.default_rng(6)
    for _ in range(4):
        lp = _random_lp(rng)
        hyps = dec.nbest(lp, 2)
        assert hyps[0][0] == dec.forward(lp)
        texts = [t for t, _ in dec.nbest(lp, 8)]
        assert len(set(texts)) == len(texts)


def test_device_align_infeasible_raises():
    from tone_tpu.ops.align_device import align_words_batch

    lp = np.full((2, V), np.log(1.0 / V), np.float32)
    with pytest.raises(ValueError, match="cannot align"):
        align_words_batch([lp], ["мир"])


def _tiny_engine(**kwargs):
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.runtime.engine import MultiStreamEngine

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    return MultiStreamEngine(variables, cfg, n_slots=2, **kwargs)


def test_engine_per_stream_nbest():
    """set_stream_nbest makes that stream's finals carry scored
    alternatives (top-1 == text) while other streams stay top-1-only;
    greedy decoders are rejected; 0 clears."""
    from tone_tpu.runtime.engine import UnknownStreamError

    engine = _tiny_engine(decoder=DeviceBeamSearchCTCDecoder(beam_width=8))
    try:
        rich = engine.open_stream()
        plain = engine.open_stream()
        engine.set_stream_nbest(rich, 4)
        with pytest.raises(UnknownStreamError):
            engine.set_stream_nbest(12345, 4)
        with pytest.raises(ValueError, match="0..32"):
            engine.set_stream_nbest(rich, 99)

        rng = np.random.default_rng(0)
        finals = {rich: [], plain: []}
        for i in range(4):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            last = i == 3
            engine.feed(rich, chunk, is_last=last)
            engine.feed(plain, chunk, is_last=last)
            for sid, futures in engine.tick().items():
                finals[sid].extend(f.result() for f in futures)
        assert finals[rich] and finals[plain]
        for p in finals[rich]:
            assert p.nbest is not None and 1 <= len(p.nbest) <= 4
            assert p.nbest[0][0] == p.text
            scores = [s for _, s in p.nbest]
            assert scores == sorted(scores, reverse=True)
        assert all(p.nbest is None for p in finals[plain])

        fresh = engine.open_stream()
        engine.set_stream_nbest(fresh, 4)
        assert engine._streams[fresh].nbest == 4
        engine.set_stream_nbest(fresh, 0)  # clears
        assert engine._streams[fresh].nbest == 0
    finally:
        engine.shutdown()


def test_engine_deployment_nbest_stays_batched():
    """Deployment-wide nbest with a device decoder rides the batched
    device_finals path (forward_batch_nbest) — never per-phrase
    decoder.nbest host-pool calls (the measured throughput ceiling,
    docs/serving.md)."""
    engine = _tiny_engine(decoder=DeviceBeamSearchCTCDecoder(beam_width=8),
                          nbest=3, final_decode_batch=2)
    calls = {"batched": 0}
    real = engine.decoder.forward_batch_nbest

    def counting(lps, n, hotword_rows=None):
        calls["batched"] += 1
        return real(lps, n, hotword_rows)

    engine.decoder.forward_batch_nbest = counting

    def forbidden(*a, **k):
        raise AssertionError("per-phrase nbest used on the batched path")

    engine.decoder.nbest = forbidden
    try:
        assert engine.device_nbest
        sid = engine.open_stream()
        rng = np.random.default_rng(0)
        finals = []
        for i in range(4):
            chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
            engine.feed(sid, chunk, is_last=i == 3)
            for futures in engine.tick().values():
                finals.extend(f.result() for f in futures)
        assert finals and calls["batched"] >= 1
        for p in finals:
            assert p.nbest is not None and 1 <= len(p.nbest) <= 3
            assert p.nbest[0][0] == p.text
            scores = [s for _, s in p.nbest]
            assert scores == sorted(scores, reverse=True)
    finally:
        engine.shutdown()


def test_engine_does_not_mutate_callers_decoder():
    """The engine pins ITS OWN copy of the decoder to the serving batch
    bucket; the caller's instance (maybe shared with a pipeline or a
    second engine) keeps its bucketing."""
    decoder = DeviceBeamSearchCTCDecoder(beam_width=8)
    before = (decoder.batch_floor, decoder.max_batch)
    rng = np.random.default_rng(5)
    lp = _random_lp(rng)
    want = decoder.forward(lp)
    engine = _tiny_engine(decoder=decoder, final_decode_batch=4)
    try:
        assert engine.decoder is not decoder
        assert engine.decoder.batch_floor == engine.decoder.max_batch == 4
        assert (decoder.batch_floor, decoder.max_batch) == before
        assert decoder.forward(lp) == want  # pipeline-side behavior intact
    finally:
        engine.shutdown()


def test_nbest_one_rejected():
    """nbest=1 is ambiguous ('up to 1 alternative' == the text field) —
    the pipeline and the engine both reject it with a clear message
    instead of silently clamping to 0."""
    from tone_tpu.runtime.engine import MultiStreamEngine  # noqa: F401

    with pytest.raises(ValueError, match="nbest=1"):
        _tiny_engine(decoder=DeviceBeamSearchCTCDecoder(beam_width=8),
                     nbest=1).shutdown()

    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.core.model import init_model_params
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    cfg = tiny_config()
    model = StreamingCTCModel(
        init_model_params(jax.random.PRNGKey(0), cfg), cfg)
    with pytest.raises(ValueError, match="nbest=1"):
        StreamingCTCPipeline(model, StreamingLogprobSplitter(),
                             BeamSearchCTCDecoder(beam_width=8), nbest=1)


def test_engine_nbest_needs_beam_decoder():
    from tone_tpu.runtime.engine import MultiStreamEngine  # noqa: F401

    engine = _tiny_engine()  # default greedy decoder
    try:
        sid = engine.open_stream()
        with pytest.raises(ValueError, match="n-best"):
            engine.set_stream_nbest(sid, 4)
    finally:
        engine.shutdown()
    with pytest.raises(ValueError, match="beam decoder"):
        _tiny_engine(nbest=4).shutdown()


def test_ws_config_frame_nbest():
    """{'nbest': N} over the wire: transcript events carry scored
    alternatives whose best entry equals the text field."""
    import asyncio
    import json as _json

    websockets = pytest.importorskip("websockets")

    from tone_tpu.runtime.server import TranscriptionServer

    engine = _tiny_engine(decoder=BeamSearchCTCDecoder(beam_width=16))
    server = TranscriptionServer(engine, tick_seconds=0.02)

    async def main():
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as srv:
                port = srv.sockets[0].getsockname()[1]
                async with websockets.connect(
                        f"ws://127.0.0.1:{port}/api/ws") as ws:
                    assert _json.loads(await ws.recv())["event"] == "ready"
                    await ws.send(_json.dumps({"nbest": 3}))
                    ack = _json.loads(await ws.recv())
                    assert ack == {"event": "config", "nbest": 3}
                    await ws.send(_json.dumps({"nbest": "three"}))
                    assert _json.loads(await ws.recv())["event"] == "error"
                    rng = np.random.default_rng(0)
                    pcm = rng.integers(-20000, 20000, 2400 * 3).astype("<i2")
                    await ws.send(pcm.tobytes())
                    await ws.send(b"")
                    events = []
                    try:
                        while True:
                            events.append(_json.loads(
                                await asyncio.wait_for(ws.recv(), timeout=20)))
                    except (asyncio.TimeoutError, websockets.ConnectionClosed):
                        pass
                    finals = [e for e in events if e["event"] == "transcript"]
                    assert finals
                    for e in finals:
                        assert 1 <= len(e["nbest"]) <= 3
                        assert e["nbest"][0]["text"] == e["text"]
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_device_nbest_fusion():
    from tone_tpu.decoding.device_lm import DeviceLM
    from tone_tpu.decoding.estimate import estimate_ngram_lm

    tables = estimate_ngram_lm([["мир", "дом"], ["дом"], ["мир"]], order=2)
    dec = DeviceBeamSearchCTCDecoder(DeviceLM.from_ngrams(tables),
                                     beam_width=12, fusion=True)
    rng = np.random.default_rng(4)
    lp = _random_lp(rng)
    hyps = dec.nbest(lp, 4)
    assert hyps and hyps[0][0] == dec.forward(lp)


def test_pipeline_nbest():
    """StreamingCTCPipeline(nbest=N) attaches alternatives to its phrases
    (transcribe --nbest): top alternative == text, greedy rejected."""
    import jax

    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.config import EncoderConfig, ToneConfig
    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import GreedyCTCDecoder
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    enc = EncoderConfig(
        n_layers=2, d_model=64, n_heads=4, rope_dim=16, ff_expansion_factor=2,
        conv_kernel_size=7, subsampling_conv_channels=(4, 8),
        mhsa_stateless_layers=1, reduction_position=0, upsample_position=1,
        should_recompute_att_scores=(True, True))
    cfg = ToneConfig(encoder=enc, compute_dtype="float32")
    model = StreamingCTCModel(init_model_params(jax.random.PRNGKey(0), cfg), cfg)

    with pytest.raises(ValueError, match="beam decoder"):
        StreamingCTCPipeline(model, StreamingLogprobSplitter(),
                             GreedyCTCDecoder(), nbest=3)

    pipe = StreamingCTCPipeline(model, StreamingLogprobSplitter(),
                                BeamSearchCTCDecoder(beam_width=8), nbest=3)
    rng = np.random.default_rng(0)
    audio = rng.integers(-20000, 20000, 2400 * 4).astype(np.int32)
    phrases = pipe.forward_offline(audio)
    assert phrases, "expected at least one phrase from random audio"
    for p in phrases:
        assert p.nbest is not None and 1 <= len(p.nbest) <= 3
        assert p.nbest[0][0] == p.text
        scores = [s for _, s in p.nbest]
        assert scores == sorted(scores, reverse=True)
