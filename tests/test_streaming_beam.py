"""Incremental (carried-state) CTC beam search tests.

The streaming decoder must produce exactly the batch decode for any split of
the frame stream — prefix beam search is frame-sequential, so this is an
algebraic identity the implementations (Python and C++) have to preserve.
"""

import math
import random
from collections import Counter

import numpy as np
import pytest

from tone_tpu.config import LABELS
from tone_tpu.decoding.beam import StreamingBeamSearch, ctc_beam_search
from tone_tpu.decoding.lm import ArpaLM


def _random_logprobs(rng, t, peaky=True):
    if peaky:
        # mostly-blank frames with occasional confident letters, like real CTC
        probs = rng.dirichlet(np.full(35, 0.05), size=t)
        blank_rows = rng.random(t) < 0.5
        probs[blank_rows] = 0.01 / 34
        probs[blank_rows, -1] = 0.99
    else:
        probs = rng.dirichlet(np.full(35, 0.3), size=t)
    return np.log(np.maximum(probs, 1e-30)).astype(np.float32)


def _word_lm(seed=0, order=2):
    rng = random.Random(seed)
    letters = [c for c in LABELS if c != " "]
    words = ["".join(rng.choice(letters) for _ in range(rng.randint(2, 4)))
             for _ in range(20)]
    counters = [Counter() for _ in range(order)]
    for _ in range(150):
        toks = ["<s>"] + [rng.choice(words) for _ in range(rng.randint(1, 5))] + ["</s>"]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                counters[n - 1][tuple(toks[i:i + n])] += 1
    counters[0][("<unk>",)] += 1
    ngrams = []
    for n, c in enumerate(counters, 1):
        tot = sum(c.values())
        ngrams.append({g: (math.log10(k / tot), -0.4 if n < order else 0.0)
                       for g, k in c.items()})
    return ArpaLM(ngrams)


@pytest.mark.parametrize("use_lm", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_equals_batch_python(seed, use_lm):
    rng = np.random.default_rng(seed)
    lp = _random_logprobs(rng, 60, peaky=(seed % 2 == 0))
    lm = _word_lm() if use_lm else None

    batch = ctc_beam_search(lp.astype(np.float64), LABELS, lm, beam_width=40)
    for splits in ([10, 25, 45], [1] * 5 + [55], [60], [30, 30]):
        s = StreamingBeamSearch(LABELS, lm, beam_width=40)
        start = 0
        for end in np.cumsum(splits):
            s.advance(lp[start:end].astype(np.float64))
            start = end
        s.advance(lp[start:].astype(np.float64))
        assert s.result() == batch, splits


def test_interim_results_are_nondestructive():
    rng = np.random.default_rng(3)
    lp = _random_logprobs(rng, 40)
    s = StreamingBeamSearch(LABELS, None, beam_width=40)
    s2 = StreamingBeamSearch(LABELS, None, beam_width=40)
    for t in range(0, 40, 10):
        s.advance(lp[t:t + 10])
        s.result()  # read every chunk
    s2.advance(lp)
    assert s.result() == s2.result()


def test_reset_restarts_the_search():
    rng = np.random.default_rng(4)
    a, b = _random_logprobs(rng, 30), _random_logprobs(rng, 30)
    s = StreamingBeamSearch(LABELS, None, beam_width=40)
    s.advance(a)
    s.reset()
    s.advance(b)
    assert s.result() == ctc_beam_search(b.astype(np.float64), LABELS, None,
                                         beam_width=40)


@pytest.mark.parametrize("use_lm", [False, True])
def test_incremental_equals_batch_native(use_lm, tmp_path):
    from tone_tpu.decoding.native.beamsearch import (
        NativeLM,
        NativeStreamingBeam,
        ctc_beam_search_native,
        native_available,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    lm = None
    if use_lm:
        arpa = _word_lm()
        path = tmp_path / "lm.arpa"
        with open(path, "w", encoding="utf-8") as f:
            f.write("\\data\\\n")
            for n, t in enumerate(arpa._ngrams, 1):
                f.write(f"ngram {n}={len(t)}\n")
            for n, t in enumerate(arpa._ngrams, 1):
                f.write(f"\n\\{n}-grams:\n")
                for gram, (p, b) in t.items():
                    f.write(f"{p}\t{' '.join(gram)}\t{b}\n")
            f.write("\n\\end\\\n")
        lm = NativeLM(path)

    rng = np.random.default_rng(7)
    lp = _random_logprobs(rng, 80)
    batch = ctc_beam_search_native(lp, LABELS, lm, beam_width=60)
    for splits in ([20, 40], [7] * 10, [80]):
        s = NativeStreamingBeam(LABELS, lm, beam_width=60)
        start = 0
        for end in np.cumsum(splits):
            s.advance(lp[start:end])
            s.result()  # interim reads must not perturb the search
            start = end
        s.advance(lp[start:])
        assert s.result() == batch, splits


def test_native_matches_python_streaming():
    from tone_tpu.decoding.native.beamsearch import (
        NativeStreamingBeam,
        native_available,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(11)
    lp = _random_logprobs(rng, 50)
    py = StreamingBeamSearch(LABELS, None, beam_width=50)
    cc = NativeStreamingBeam(LABELS, None, beam_width=50)
    for t in range(0, 50, 10):
        py.advance(lp[t:t + 10])
        cc.advance(lp[t:t + 10])
        assert py.result() == cc.result(), t


def test_decoder_streaming_equals_forward():
    """BeamSearchCTCDecoder.streaming() chunked == .forward() whole, on both
    the native and pure-Python paths."""
    from tone_tpu.decoder import BeamSearchCTCDecoder

    rng = np.random.default_rng(5)
    lp = _random_logprobs(rng, 70)
    dec = BeamSearchCTCDecoder()
    whole = dec.forward(lp)
    s = dec.streaming()
    for t in range(0, 70, 10):
        s.advance(lp[t:t + 10])
    assert s.result() == whole

    dec_py = BeamSearchCTCDecoder()
    dec_py._use_native = False
    whole_py = dec_py.forward(lp)
    s = dec_py.streaming()
    for t in range(0, 70, 7):
        s.advance(lp[t:t + 7])
    assert s.result() == whole_py
