"""Contextual biasing (hotwords) for the CTC beam search.

The reference decodes through pyctcdecode (tone/decoder.py:108-133), whose
``decode`` API supports hotword boosting even though the reference never
passes any.  Telephony deployments lean on it for exactly the reference's
weakest measured category — named entities (README.md:153) — so the
capability is first-class here: known words/phrases (client names, product
terms) get a per-character score boost while a hypothesis stays on a
matching path, with the boost retracted if the word completes as something
else.

Semantics (per emitted character, natural-log units):

* a match can only BEGIN at a word start — words merely *ending* with a
  hotword ("владимир" vs hotword "мир") are never boosted;
* while the current word (plus, for multi-word phrases, the matched tail
  of preceding words) is a prefix of some hotword, each matching character
  adds ``weight`` to the hypothesis score *tentatively*;
* a word boundary where the match is a complete hotword commits the
  tentative boost permanently — including when a longer phrase also
  continues through that boundary ("сан" commits even while "сан дата"
  keeps matching; only the continuation stays tentative);
* falling off every hotword path retracts the tentative boost and parks
  the automaton until the next word boundary;
* an in-progress prefix keeps its tentative credit in interim/final
  ranking — biasing is active mid-word, which is what makes it effective
  for streaming partial transcripts.

The automaton state is a pure function of a hypothesis's emitted text, so
beams merged by (text, partial) always agree on it.
"""

from __future__ import annotations

from typing import Iterable

# Automaton state carried on each beam: (node id, tentative boost).
# Node -1 = parked (mid-word after a mismatch) until the next word boundary.
START = (0, 0.0)


class HotwordScorer:
    """Character-trie hotword automaton.

    Args:
        hotwords: words or multi-word phrases (matched across word
            boundaries); casing is normalized to lowercase to match the
            label set (tone/decoder.py:23).
        weight: natural-log score added per matching character.
    """

    def __init__(self, hotwords: Iterable[str], weight: float = 10.0) -> None:
        if isinstance(hotwords, str):
            # a lone string would silently iterate into per-CHARACTER
            # hotwords — an easy config type confusion
            raise TypeError("hotwords must be a list of phrases, not a string")
        self.weight = float(weight)
        self._children: list[dict[str, int]] = [{}]
        self._terminal: list[bool] = [False]
        phrases = sorted({" ".join(str(h).lower().split()) for h in hotwords} - {""})
        if not phrases:
            raise ValueError("no hotwords given")
        for phrase in phrases:
            node = 0
            for ch in phrase:
                nxt = self._children[node].get(ch)
                if nxt is None:
                    nxt = len(self._children)
                    self._children[node][ch] = nxt
                    self._children.append({})
                    self._terminal.append(False)
                node = nxt
            self._terminal[node] = True
        self.phrases = phrases

    def step(self, state: tuple[int, float], char: str) -> tuple[tuple[int, float], float]:
        """Advance on one emitted character.

        Returns (new_state, score_delta).  The caller adds ``score_delta``
        to the hypothesis score; tentative boost bookkeeping is inside the
        state.  A space character commits a completed hotword (the word
        boundary) and/or continues a phrase whose next character is a
        space; a mismatch retracts and parks until the next boundary.
        """
        node, tentative = state
        w = self.weight
        if char == " ":
            if node >= 0 and self._terminal[node]:
                # Completed hotword: commit what's accrued.  A longer
                # phrase may continue through this boundary — only the
                # continuation (starting with this space) stays tentative.
                child = self._children[node].get(" ")
                if child is not None:
                    return (child, w), w
                return START, 0.0
            if node >= 0:
                child = self._children[node].get(" ")
                if child is not None:  # mid-phrase boundary, nothing to commit
                    return (child, tentative + w), w
            # failed or parked match: retract and rearm for the next word
            return START, -tentative
        if node < 0:  # parked: matches only begin at word starts
            return state, 0.0
        child = self._children[node].get(char)
        if child is not None:
            return (child, tentative + w), w
        return (-1, 0.0), -tentative
