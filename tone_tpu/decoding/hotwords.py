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

* while the current word (plus, for multi-word phrases, the matched tail
  of preceding words) is a prefix of some hotword, each matching character
  adds ``weight`` to the hypothesis score *tentatively*;
* a word boundary where the match is a complete hotword commits the
  tentative boost permanently;
* falling off every hotword path retracts the tentative boost (and
  restarts matching at the current character);
* an in-progress prefix keeps its tentative credit in interim/final
  ranking — biasing is active mid-word, which is what makes it effective
  for streaming partial transcripts.

The automaton state is a pure function of a hypothesis's emitted text, so
beams merged by (text, partial) always agree on it.  Mismatch restart is
single-step (retry the failing character from the root) rather than full
Aho–Corasick failure links: overlapping-suffix rematches
(e.g. hotwords "abcd"/"bcde" on text "abcde") are not chased — the same
simplification pyctcdecode makes.
"""

from __future__ import annotations

from typing import Iterable

# Automaton state carried on each beam: (node id, tentative boost).
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
        boundary) or continues a phrase whose next character is a space.
        """
        node, tentative = state
        w = self.weight
        child = self._children[node].get(char)
        if child is not None:
            return (child, tentative + w), w
        if char == " ":
            if self._terminal[node]:
                # Completed hotword at a word boundary: commit.
                return START, 0.0
            return START, -tentative
        delta = -tentative
        restart = self._children[0].get(char)
        if restart is not None:
            return (restart, w), delta + w
        return START, delta
