"""CTC prefix beam search with optional word-level n-gram LM scoring.

A from-scratch implementation of the decoding capability the reference gets
from pyctcdecode + KenLM (tone/decoder.py:108-133): beam width 200, LM weight
``alpha`` applied to log10 word probabilities (converted to natural log),
word-insertion bonus ``beta`` per completed word — the same scoring scheme as
pyctcdecode's shallow-fusion defaults.

This pure-Python implementation is the reference/fallback path; the C++
scorer in ``tone_tpu/decoding/native`` implements the identical algorithm for
production throughput (host-side, decoupled from the TPU tick loop).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from tone_tpu.decoding.lm import LanguageModel

LOG10_TO_LN = math.log(10.0)
NEG_INF = -math.inf


@dataclass
class _Beam:
    """One beam hypothesis over collapsed text."""

    text: str  # full text including completed words
    partial: str  # chars of the in-progress word
    last_char: str  # last emitted (non-blank) char, for repeat-collapse
    p_b: float  # log prob of this prefix ending in blank
    p_nb: float  # log prob of this prefix ending in non-blank
    lm_score: float  # accumulated LM contribution (natural log)
    context: tuple[str, ...]  # word history for the LM

    def total(self) -> float:
        return np.logaddexp(self.p_b, self.p_nb) + self.lm_score


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def ctc_beam_search(
    logprobs: np.ndarray,
    labels: str,
    lm: "LanguageModel | None" = None,
    *,
    alpha: float = 0.4,
    beta: float = 0.9,
    beam_width: int = 200,
    token_min_logp: float = -5.0,
    blank_id: int | None = None,
) -> str:
    """Decode (T, V) logprobs into text.

    Args:
        logprobs: (T, vocab+1) natural-log probabilities; the blank is the
            last class unless ``blank_id`` is given.
        labels: string of characters for classes 0..len(labels)-1; the space
            character delimits words for LM scoring.
        lm: optional word LM scoring ``log10 P(word | context)``.
        alpha: LM weight (applied to ln-converted LM scores).
        beta: word-insertion bonus per completed word.
        beam_width: number of beams kept per frame.
        token_min_logp: per-frame tokens below this logprob are not expanded
            (except the best token of the frame).

    Returns:
        The decoded text (stripped).
    """
    t_max, n_classes = logprobs.shape
    if blank_id is None:
        blank_id = n_classes - 1

    def lm_word_score(context: tuple[str, ...], word: str) -> float:
        if lm is None or not word:
            return 0.0
        return alpha * lm.score(context, word) * LOG10_TO_LN + beta

    init_ctx = lm.begin_context() if lm is not None else ()
    beams: dict[tuple[str, str, str], _Beam] = {
        ("", "", ""): _Beam("", "", "", 0.0, NEG_INF, 0.0, init_ctx),
    }

    for t in range(t_max):
        frame = logprobs[t]
        best_tok = int(frame.argmax())
        tokens = np.flatnonzero(frame >= token_min_logp)
        if best_tok not in tokens:
            tokens = np.append(tokens, best_tok)

        next_beams: dict[tuple[str, str, str], _Beam] = {}

        def merge(key, text, partial, last_char, p_b, p_nb, lm_score, context):
            b = next_beams.get(key)
            if b is None:
                next_beams[key] = _Beam(text, partial, last_char, p_b, p_nb,
                                        lm_score, context)
            else:
                b.p_b = _logsumexp2(b.p_b, p_b)
                b.p_nb = _logsumexp2(b.p_nb, p_nb)

        for beam in beams.values():
            p_total = _logsumexp2(beam.p_b, beam.p_nb)
            for tok in tokens:
                p = float(frame[tok])
                if tok == blank_id:
                    merge((beam.text, beam.partial, beam.last_char),
                          beam.text, beam.partial, beam.last_char,
                          p_total + p, NEG_INF, beam.lm_score, beam.context)
                    continue
                char = labels[tok]
                if char == beam.last_char:
                    # Same char: extends the run (no new symbol) from p_nb...
                    merge((beam.text, beam.partial, beam.last_char),
                          beam.text, beam.partial, beam.last_char,
                          NEG_INF, beam.p_nb + p, beam.lm_score, beam.context)
                    # ...or a new symbol after an explicit blank.
                    src = beam.p_b
                else:
                    src = p_total
                if src == NEG_INF:
                    continue
                if char == " ":
                    # Word boundary: score the completed partial word.
                    # Consecutive spaces collapse (empty words are dropped).
                    word = beam.partial
                    new_text = beam.text + word + " " if word else beam.text
                    new_ctx = beam.context + (word,) if (lm is not None and word) else beam.context
                    merge((new_text, "", " "),
                          new_text, "", " ",
                          NEG_INF, src + p,
                          beam.lm_score + lm_word_score(beam.context, word),
                          new_ctx)
                else:
                    merge((beam.text, beam.partial + char, char),
                          beam.text, beam.partial + char, char,
                          NEG_INF, src + p, beam.lm_score, beam.context)

        # Deterministic prune: total desc, then prefix text asc as the tie
        # break (insertion-order-independent; matches the native decoder).
        pruned = sorted(next_beams.values(),
                        key=lambda b: (-b.total(), b.text + b.partial))[:beam_width]
        beams = {(b.text, b.partial, b.last_char): b for b in pruned}

    # Finalize: score trailing partial words, pick the best beam
    # (deterministic tie-break on the text, as in pruning).
    def final_key(b: _Beam):
        return (-(b.total() + lm_word_score(b.context, b.partial)),
                b.text + b.partial)

    best = min(beams.values(), key=final_key)
    return (best.text + best.partial).strip()
