"""Native (C++) decoder tests: exact equivalence with the Python beam search."""

import numpy as np
import pytest

from tone_tpu.config import LABELS
from tone_tpu.decoding.beam import ctc_beam_search
from tone_tpu.decoding.native.beamsearch import (
    NativeArpaLM,
    build_native,
    ctc_beam_search_native,
    native_available,
)

if not build_native():
    pytest.skip("C++ toolchain unavailable", allow_module_level=True)


ARPA = """\\data\\
ngram 1=8
ngram 2=3

\\1-grams:
-1.5\t<s>\t-0.5
-3.0\t<unk>
-1.0\tда\t-0.3
-1.2\tнет\t-0.3
-1.4\tпривет\t-0.3
-1.6\tмир\t-0.3
-1.8\tтест\t-0.3
-2.0\tхорошо\t-0.3

\\2-grams:
-0.2\t<s> привет
-0.4\tпривет мир
-0.5\tда нет

\\end\\
"""


@pytest.fixture(scope="module")
def arpa_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("lm") / "test.arpa"
    p.write_text(ARPA, encoding="utf-8")
    return p


def _random_logprobs(rng, t):
    lp = rng.normal(-2.5, 1.8, (t, 35))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    return lp.astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("beam_width", [5, 50])
def test_native_equals_python_no_lm(seed, beam_width):
    lp = _random_logprobs(np.random.default_rng(seed), 40)
    py = ctc_beam_search(lp.astype(np.float64), LABELS, None, beam_width=beam_width)
    na = ctc_beam_search_native(lp, LABELS, None, beam_width=beam_width)
    assert py == na


@pytest.mark.parametrize("seed", range(5))
def test_native_equals_python_with_lm(seed, arpa_file):
    from tone_tpu.decoding.lm import ArpaLM

    py_lm = ArpaLM.from_file(arpa_file)
    na_lm = NativeArpaLM(arpa_file)
    assert na_lm.order == py_lm.order == 2

    lp = _random_logprobs(np.random.default_rng(seed), 30)
    py = ctc_beam_search(lp.astype(np.float64), LABELS, py_lm,
                         alpha=0.4, beta=0.9, beam_width=30)
    na = ctc_beam_search_native(lp, LABELS, na_lm,
                                alpha=0.4, beta=0.9, beam_width=30)
    assert py == na


def test_decoder_facade_uses_native(arpa_file):
    from tone_tpu.decoder import BeamSearchCTCDecoder

    dec = BeamSearchCTCDecoder.from_local(arpa_file)
    assert native_available()
    assert dec._use_native
    lp = _random_logprobs(np.random.default_rng(0), 20)
    text = dec.forward(lp)
    assert isinstance(text, str)


def test_native_beam_faster_than_python():
    """The native decoder must actually be faster (sanity on the build)."""
    import time

    rng = np.random.default_rng(0)
    t = 150
    lp = np.full((t, 35), -12.0, np.float32)
    for i in range(t):
        lp[i, rng.integers(0, 35)] = np.log(0.9)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))

    t0 = time.perf_counter()
    na = ctc_beam_search_native(lp, LABELS, None, beam_width=100)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = ctc_beam_search(lp.astype(np.float64), LABELS, None, beam_width=100)
    t_python = time.perf_counter() - t0
    assert py == na
    assert t_native < t_python
