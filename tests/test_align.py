"""CTC forced alignment: word-level timestamps + confidences."""

import numpy as np
import pytest

from tone_tpu.align import align_words, viterbi_align
from tone_tpu.config import BLANK_ID, LABELS


def _peaked(frames):
    """(T, V) logprobs peaked at the given token per frame ('_' = blank)."""
    V = len(LABELS) + 1
    logits = np.full((len(frames), V), -8.0, np.float32)
    for t, ch in enumerate(frames):
        tok = BLANK_ID if ch == "_" else LABELS.index(ch)
        logits[t, tok] = 0.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def test_viterbi_exact_alignment():
    """Peaked logprobs align each char to exactly its emission frames,
    including a repeated char separated by blank."""
    lp = _peaked(["_", "м", "м", "и", "_", "и", "р", "_"])
    spans = viterbi_align(lp, [LABELS.index(c) for c in "миир"])
    assert spans[0][:2] == (1, 2)   # "м" spans its repeat frames
    assert spans[1][:2] == (3, 3)   # first "и"
    assert spans[2][:2] == (5, 5)   # second "и" (after the blank gap)
    assert spans[3][:2] == (6, 6)   # "р"


def test_align_words_frames_and_confidence():
    lp = _peaked(["м", "и", "р", " ", "д", "о", "м", "_"])
    words = align_words(lp, "мир дом")
    assert [w[0] for w in words] == ["мир", "дом"]
    (w1, s1, e1, c1), (w2, s2, e2, c2) = words
    assert (s1, e1) == (0, 2) and (s2, e2) == (4, 6)
    assert c1 > 0.95 and c2 > 0.95  # peaked => near-certain

    # Ambiguity lowers confidence: halve the peak of one char.
    lp2 = lp.copy()
    lp2[1] = np.log(np.ones(lp.shape[1]) / lp.shape[1])  # uniform frame
    words2 = align_words(lp2, "мир дом")
    assert words2[0][3] < c1 and words2[1][3] == pytest.approx(c2, abs=1e-6)


def test_align_words_empty_and_errors():
    lp = _peaked(["_", "_"])
    assert align_words(lp, "") == []
    with pytest.raises(ValueError, match="cannot align"):
        viterbi_align(lp, [LABELS.index(c) for c in "мир"])


def test_alignment_matches_any_decoder_text():
    """Beam-decoded text (even LM/hotword-steered) aligns without error and
    covers the whole transcript."""
    from tone_tpu.decoding.beam import ctc_beam_search
    from tone_tpu.decoding.hotwords import HotwordScorer

    rng = np.random.default_rng(0)
    for _ in range(5):
        logits = rng.normal(0, 2.5, (30, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True)))
        text = ctc_beam_search(lp, LABELS, beam_width=8,
                               hotwords=HotwordScorer(["мир"], 2.0))
        words = align_words(lp.astype(np.float32), text)
        assert [w[0] for w in words] == text.split()
        for _, f0, f1, conf in words:
            assert 0 <= f0 <= f1 < 30 and 0.0 < conf <= 1.0


def test_offline_logprobs_accessor():
    """OfflineTranscriber.logprobs == the streaming scan's valid frames
    (the acoustic front half the `align` CLI consumes)."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.acoustic import cast_params_for_inference
    from tone_tpu.core.model import (
        apply_streaming, init_model_params, init_streaming_state)
    from tone_tpu.offline import OfflineTranscriber

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    audios = [rng.integers(-20000, 20000, n).astype(np.int32)
              for n in (5000, 2400 * 2 + 7)]

    tr = OfflineTranscriber(variables, cfg, batch_size=2)
    got = tr.logprobs(audios)

    cast = cast_params_for_inference(variables, cfg)
    for audio, lp in zip(audios, got):
        padded = np.pad(audio, (cfg.padding, cfg.padding))
        padded = np.pad(padded, (0, -len(padded) % cfg.audio_chunk_samples))
        state = init_streaming_state(cfg, 1)
        outs = []
        for k in range(len(padded) // cfg.audio_chunk_samples):
            o, state = apply_streaming(
                cast, cfg,
                jnp.asarray(padded[None, k * cfg.audio_chunk_samples:
                                   (k + 1) * cfg.audio_chunk_samples]), state)
            outs.append(np.asarray(o)[0])
        want = np.concatenate(outs, axis=0)
        np.testing.assert_allclose(lp, want, atol=1e-5)


def test_device_batch_alignment_equals_host():
    """The on-device batched aligner returns the exact host spans and
    confidences — mixed phrase lengths across (T, S) buckets, beam-decoded
    texts, one device call per bucket."""
    from tone_tpu.decoding.beam import ctc_beam_search
    from tone_tpu.ops.align_device import align_words_batch

    rng = np.random.default_rng(5)
    lps, texts = [], []
    for t in (12, 30, 75, 30, 140, 12):
        logits = rng.normal(0, 2.5, (t, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        lps.append(lp)
        texts.append(ctc_beam_search(lp.astype(np.float64), LABELS,
                                     beam_width=6))
    texts[3] = ""  # empty-text row inside a batch

    got = align_words_batch(lps, texts)
    for lp, text, words in zip(lps, texts, got):
        want = align_words(lp, text)
        assert [w[:3] for w in words] == [w[:3] for w in want], text
        np.testing.assert_allclose([w[3] for w in words],
                                   [w[3] for w in want], rtol=1e-5)
    assert got[3] == []


def test_offline_transcriber_word_timestamps():
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.offline import OfflineTranscriber

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    audio = np.random.default_rng(0).integers(
        -20000, 20000, 8000).astype(np.int32)
    phrases = OfflineTranscriber(variables, cfg,
                                 word_timestamps=True).transcribe([audio])[0]
    assert any(p.text for p in phrases)
    for p in phrases:
        if p.text:
            assert p.words and " ".join(w.word for w in p.words) == p.text


def test_engine_word_timestamps():
    """MultiStreamEngine(word_timestamps=True) attaches words to final
    phrases (both the host-pool and batched-device decode paths)."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder
    from tone_tpu.runtime.engine import MultiStreamEngine

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    chunks = [rng.integers(-20000, 20000, 2400).astype(np.int32)
              for _ in range(4)]

    for decoder in (None, DeviceBeamSearchCTCDecoder(beam_width=8)):
        engine = MultiStreamEngine(variables, cfg, n_slots=2, decoder=decoder,
                                   word_timestamps=True)
        try:
            sid = engine.open_stream()
            phrases = []
            for i, chunk in enumerate(chunks):
                engine.feed(sid, chunk, is_last=(i == len(chunks) - 1))
                for futures in engine.tick().values():
                    phrases.extend(f.result() for f in futures)
            got_words = [p for p in phrases if p.text]
            assert got_words, "no non-empty phrase decoded"
            for p in got_words:
                assert p.words is not None
                assert " ".join(w.word for w in p.words) == p.text
        finally:
            engine.shutdown()


def test_pipeline_word_timestamps():
    """word_timestamps=True populates TextPhrase.words with absolute times
    inside the phrase bounds; default pipelines keep words=None."""
    import sys
    from pathlib import Path

    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.core.model import init_model_params
    from tone_tpu.decoder import GreedyCTCDecoder
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    audio = np.random.default_rng(0).integers(
        -20000, 20000, 8000).astype(np.int32)

    model = StreamingCTCModel(variables, cfg)
    plain = StreamingCTCPipeline(
        model, StreamingLogprobSplitter(), GreedyCTCDecoder())
    timed = StreamingCTCPipeline(
        model, StreamingLogprobSplitter(), GreedyCTCDecoder(),
        word_timestamps=True)

    base = plain.forward_offline(audio)
    rich = timed.forward_offline(audio)
    assert [p.text for p in base] == [p.text for p in rich]
    assert all(p.words is None for p in base)
    for p in rich:
        if not p.text:
            continue
        assert p.words and " ".join(w.word for w in p.words) == p.text
        for w in p.words:
            assert 0.0 <= w.start_time <= w.end_time
            assert 0.0 < w.confidence <= 1.0
        assert p.words[0].start_time >= p.start_time - 0.35  # time-bias slack
        assert p.words[-1].end_time <= p.end_time + 0.35
