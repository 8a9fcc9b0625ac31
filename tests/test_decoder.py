"""Decoder tests: greedy, beam search, ARPA LM."""

import numpy as np
import pytest

from tone_tpu.config import LABELS
from tone_tpu.decoder import BeamSearchCTCDecoder, GreedyCTCDecoder
from tone_tpu.decoding.beam import ctc_beam_search
from tone_tpu.decoding.lm import ArpaLM

V = len(LABELS) + 1
BLANK = len(LABELS)


def logprobs_for(tokens: list[int], peak: float = 0.99) -> np.ndarray:
    out = np.full((len(tokens), V), np.log((1 - peak) / (V - 1)), dtype=np.float32)
    for i, t in enumerate(tokens):
        out[i, t] = np.log(peak)
    return out


def encode(text: str) -> list[int]:
    """CTC-encode text as alternating char/blank frames."""
    tokens = []
    for ch in text:
        tokens.extend([LABELS.index(ch), BLANK])
    return tokens


def test_greedy_collapse_and_blank():
    g = GreedyCTCDecoder()
    # 'д' 'д' blank 'а' -> "да"
    lp = logprobs_for([LABELS.index("д")] * 2 + [BLANK] + [LABELS.index("а")])
    assert g.forward(lp) == "да"


def test_greedy_strip_spaces():
    g = GreedyCTCDecoder()
    lp = logprobs_for(encode(" привет "))
    assert g.forward(lp) == "привет"


def test_greedy_validation():
    g = GreedyCTCDecoder()
    with pytest.raises(ValueError):
        g.forward(np.zeros((3, 10), np.float32))
    with pytest.raises(ValueError):
        g.forward(np.zeros((3, V), np.float64))


def test_beam_matches_greedy_on_peaked():
    lp = logprobs_for(encode("привет мир"))
    assert GreedyCTCDecoder().forward(lp) == "привет мир"
    assert BeamSearchCTCDecoder().forward(lp) == "привет мир"


def test_beam_sums_over_alignments():
    """Beam search should prefer a prefix whose total probability (summed
    over alignments) is higher even when greedy picks otherwise."""
    a, b = LABELS.index("а"), LABELS.index("б")
    lp = np.full((2, V), -15.0, dtype=np.float32)
    # frame0: a=0.45, b=0.55 ; frame1: a=0.45, blank=0.55
    # greedy: b, blank -> "б"
    # paths: "а"(а,а)=.2025 ... with CTC: P("а") = .45*.45 + .45*.55(a,blank)
    #        + .55(b)*... ; proper beam search sums alignments.
    lp[0, a], lp[0, b] = np.log(0.45), np.log(0.55)
    lp[1, a], lp[1, BLANK] = np.log(0.45), np.log(0.55)
    lp = (lp - np.log(np.exp(lp).sum(-1, keepdims=True))).astype(np.float32)
    assert GreedyCTCDecoder().forward(lp) == "б"
    # P(а) = P(aa) + P(a,blank) = .45*.45 + .45*.55 = .45 ; P(б) = .55*(.45+.55)...
    # P(б)=P(b,blank)+P(b,a->"ба" no) = .55*.55 = .3025 < P(а)=.45
    assert BeamSearchCTCDecoder().forward(lp) == "а"


def test_arpa_lm_scoring():
    arpa = """
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\tда\t-0.3
-1.5\tнет\t-0.2
-2.0\t<unk>

\\2-grams:
-0.3\t<s> да
-0.7\tда нет

\\end\\
"""
    import io

    lm = ArpaLM._parse(io.StringIO(arpa))
    assert lm.order == 2
    # Direct bigram hit.
    assert lm.score(("<s>",), "да") == pytest.approx(-0.3)
    # Backoff: P(да | нет) = backoff(нет) + P(да) = -0.2 + -1.2
    assert lm.score(("нет",), "да") == pytest.approx(-1.4)
    # Unknown word -> <unk> unigram.
    assert lm.score((), "может") == pytest.approx(-2.0)


def test_beam_with_lm_prefers_likely_word():
    """With an LM strongly favoring 'да', an acoustically ambiguous input
    should decode to 'да'."""
    arpa = """
\\data\\
ngram 1=4

\\1-grams:
-1.0\t<s>
-0.2\tда
-5.0\tта
-5.0\t<unk>

\\end\\
"""
    import io

    lm = ArpaLM._parse(io.StringIO(arpa))
    d, t, a, space = LABELS.index("д"), LABELS.index("т"), LABELS.index("а"), LABELS.index(" ")
    lp = np.full((3, V), -15.0, dtype=np.float32)
    lp[0, d], lp[0, t] = np.log(0.48), np.log(0.52)  # acoustics favor 'т'
    lp[1, a] = np.log(0.98)
    lp[2, space] = np.log(0.98)
    lp = (lp - np.log(np.exp(lp).sum(-1, keepdims=True))).astype(np.float32)

    no_lm = ctc_beam_search(lp.astype(np.float64), LABELS, None)
    with_lm = ctc_beam_search(lp.astype(np.float64), LABELS, lm, alpha=0.4, beta=0.9)
    assert no_lm == "та"
    assert with_lm == "да"
