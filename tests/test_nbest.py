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
