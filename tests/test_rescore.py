"""Device beam search + n-best LM rescoring vs full shallow fusion."""

from __future__ import annotations

import math

import numpy as np
import pytest

from tone_tpu.config import BLANK_ID, LABELS
from tone_tpu.decoder import BeamSearchCTCDecoder, DeviceBeamSearchCTCDecoder
from tone_tpu.decoding.beam import ctc_beam_search
from tone_tpu.decoding.lm import ArpaLM
from tone_tpu.decoding.rescore import lm_hypothesis_score, rescore_nbest

V = len(LABELS) + 1


def _lm_over(words, favored):
    """Unigram+bigram LM that strongly favors ``favored`` words."""
    uni = {}
    for w in words:
        uni[(w,)] = (math.log10(0.5 if w in favored else 1e-4), -0.3)
    uni[("<s>",)] = (-99.0, -0.3)
    uni[("<unk>",)] = (-6.0, 0.0)
    bi = {("<s>", w): (math.log10(0.5 if w in favored else 1e-4), 0.0)
          for w in words}
    return ArpaLM([uni, bi])


def _emit(text, p_main=0.6, p_alt=None, alt_text=None):
    """Frames emitting ``text`` with an optional competing char per frame."""
    frames = np.full((2 * len(text), V), -14.0, np.float32)
    for i, ch in enumerate(text):
        frames[2 * i, LABELS.index(ch)] = math.log(p_main)
        if alt_text is not None:
            frames[2 * i, LABELS.index(alt_text[i])] = math.log(p_alt)
        frames[2 * i + 1, BLANK_ID] = math.log(0.9)
    # renormalize
    x = frames - frames.max(-1, keepdims=True)
    return (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32)


def test_lm_hypothesis_score_matches_fusion_accounting():
    lm = _lm_over(["да", "на"], {"да"})
    s = lm_hypothesis_score(lm, "да да", alpha=0.4, beta=0.9)
    # two words: two alpha-weighted scores + two betas
    ln10 = math.log(10.0)
    want = (0.4 * lm.score(("<s>",), "да") * ln10 + 0.9
            + 0.4 * lm.score(("<s>", "да"), "да") * ln10 + 0.9)
    assert s == pytest.approx(want)


def test_rescoring_picks_lm_favored_hypothesis():
    """Acoustically ambiguous 'да'/'на'; the LM decides — rescoring must
    agree with full shallow fusion."""
    lm = _lm_over(["да", "на"], {"да"})
    # acoustics slightly favor the LM-dispreferred word
    frames = _emit("на", p_main=0.5, p_alt=0.45, alt_text="да")

    fused = ctc_beam_search(frames.astype(np.float64), LABELS, lm,
                            beam_width=16)
    dev = DeviceBeamSearchCTCDecoder(lm, beam_width=16, nbest=8)
    assert dev.forward(frames) == fused == "да"

    # sanity: without the LM acoustics win
    assert DeviceBeamSearchCTCDecoder(None, beam_width=16).forward(frames) == "на"


def test_rescoring_multiword_agreement_with_fusion():
    lm = _lm_over(["да", "на", "ад"], {"да"})
    sp = " "
    text_a, text_b = "на" + sp + "на", "да" + sp + "да"
    frames = _emit(text_a, p_main=0.5, p_alt=0.46, alt_text=text_b)

    fused = ctc_beam_search(frames.astype(np.float64), LABELS, lm,
                            beam_width=32)
    dev = DeviceBeamSearchCTCDecoder(lm, beam_width=32, nbest=16)
    assert dev.forward(frames) == fused


def test_forward_batch_matches_forward():
    rng = np.random.default_rng(7)
    lm = _lm_over(["да", "на"], {"да"})
    dev = DeviceBeamSearchCTCDecoder(lm, beam_width=8, nbest=4)
    phrases = []
    for _ in range(6):
        logits = rng.normal(0, 3.0, (int(rng.integers(6, 30)), V))
        x = logits - logits.max(-1, keepdims=True)
        phrases.append(
            (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32))
    assert dev.forward_batch(phrases) == [dev.forward(p) for p in phrases]


def test_rescore_nbest_no_lm_is_identity():
    hyps = [("аб", -1.0), ("ба", -2.0)]
    assert rescore_nbest(hyps, None) == hyps


def test_decoder_validates_input():
    dev = DeviceBeamSearchCTCDecoder(None)
    with pytest.raises(TypeError):
        dev.forward([[0.0] * V])
    with pytest.raises(ValueError):
        dev.forward(np.zeros((5, V), np.float64))


def test_forward_batch_length_bucket_grouping():
    """Mixed-length batches decode per frame bucket (64·2^k groups) with
    optional batch_floor/max_batch serving pins — results must be
    identical to per-phrase decoding regardless of the grouping."""
    rng = np.random.default_rng(11)
    lm = _lm_over(["да", "на"], {"да"})
    dev = DeviceBeamSearchCTCDecoder(lm, beam_width=8, nbest=4)
    phrases = []
    for frames in (10, 70, 140, 300, 12, 65):
        logits = rng.normal(0, 3.0, (frames, V))
        x = logits - logits.max(-1, keepdims=True)
        phrases.append(
            (x - np.log(np.exp(x).sum(-1, keepdims=True))).astype(np.float32))
    singles = [dev.forward(p) for p in phrases]
    assert dev.forward_batch(phrases) == singles

    dev.batch_floor = dev.max_batch = 2   # serving pins: split + pad
    assert dev.forward_batch(phrases) == singles
