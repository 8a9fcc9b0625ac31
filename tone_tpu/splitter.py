"""Silence-based phrase segmentation over the streaming CTC logprob stream.

Behavioral parity with the reference ``StreamingLogprobSplitter``
(tone/logprob_splitter.py): a frame is speech iff P(blank) + P(space) <= 0.9;
a phrase ends after >= 20 consecutive silence frames (600 ms); phrases longer
than 2000 frames (60 s) are force-split; emitted phrase logprobs are expanded
by 3 frames on each side; unconsumed logprobs plus a global frame offset are
carried in the state.

Pure numpy, host-side: the per-chunk workload is ~10 frames of 35 logprobs —
not a TPU-shaped computation.  (A batched on-device speech-probability
reduction for the multi-stream server lives in tone_tpu/ops.)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from collections.abc import Iterator

    import numpy.typing as npt


@dataclass
class LogprobPhrase:
    """A finalized phrase: its logprobs and frame span.

    Attributes:
        logprobs: (L, vocab+1) float32 logprobs for the phrase (with the
            +-SPEECH_EXPAND_SIZE frame margin applied to ``logprobs`` only).
        start_frame: global start frame (not expanded).
        end_frame: global end frame (not expanded).
    """

    logprobs: "npt.NDArray[np.float32]"
    start_frame: int
    end_frame: int


@dataclass
class StreamingLogprobSplitterState:
    """Carried state: unconsumed logprobs + global frame offset."""

    past_logprobs: "npt.NDArray[np.float32]" = field(
        default_factory=lambda: np.zeros((0, 35), dtype=np.float32))
    offset: int = 0


class StreamingLogprobSplitter:
    """Splits the logprob stream into decodable phrases at silences."""

    InputType = "npt.NDArray[np.float32]"
    OutputType = "list[LogprobPhrase]"
    StateType = StreamingLogprobSplitterState

    SILENCE_THRESHOLD = 0.9  # probability
    MIN_SILENCE_DURATION = 20  # frames (600 ms)
    SPEECH_EXPAND_SIZE = 3  # frames
    MAX_PHRASE_DURATION = 2000  # frames (60 s)

    def _phrase_spans(self, is_speech: "npt.NDArray[np.bool_]", *,
                      is_last: bool = False) -> "Iterator[tuple[int, int]]":
        """Yield (start, end) spans of completed phrases.

        A span is complete when it is followed by a silence run of at least
        ``MIN_SILENCE_DURATION`` frames (the end of the stream counts via the
        synthetic trailing silence when ``is_last``).  Overlong spans are
        force-split into ``MAX_PHRASE_DURATION`` pieces even mid-speech.
        """
        min_sil = self.MIN_SILENCE_DURATION
        n = len(is_speech)
        # Synthetic leading silence guarantees the stream starts at a phrase
        # boundary; trailing silence flushes the final phrase on is_last.
        padded = np.pad(is_speech, (min_sil, min_sil if is_last else 0))

        silence = ~padded
        edges = np.diff(np.pad(silence, (1, 1)).astype(np.int8))
        starts = np.flatnonzero(edges == 1) - min_sil
        ends = np.flatnonzero(edges == -1) - min_sil
        long_enough = (ends - starts) >= min_sil
        starts, ends = starts[long_enough], ends[long_enough]

        # Speech span i runs from the end of qualifying silence i to the
        # start of qualifying silence i+1 (or the stream end for the last,
        # which is only emitted as force-split pieces).
        span_starts = ends.tolist()
        span_ends = starts.tolist()[1:] + [n]
        n_closed = len(ends) - 1
        for i, (start, end) in enumerate(zip(span_starts, span_ends)):
            while end - start >= self.MAX_PHRASE_DURATION:
                yield start, start + self.MAX_PHRASE_DURATION
                start += self.MAX_PHRASE_DURATION
            if i < n_closed:
                yield start, end

    def forward(
        self,
        logprobs: "npt.NDArray[np.float32]",
        state: StreamingLogprobSplitterState | None = None,
        *,
        is_last: bool = False,
    ) -> tuple[list[LogprobPhrase], StreamingLogprobSplitterState]:
        """Consume a chunk of logprobs; emit completed phrases + next state."""
        if not isinstance(logprobs, np.ndarray):
            raise TypeError(
                f"Incorrect 'logprobs' type: expected np.ndarray, but got {type(logprobs)}")
        if logprobs.shape[1:] != (35,):
            raise ValueError(
                f"Shape of 'logprobs' must be (L, 35), but got {logprobs.shape}")
        if logprobs.dtype != np.float32:
            raise ValueError(
                f"Incorrect dtype of 'logprobs': expected np.float32, but got {logprobs.dtype}")
        if state is None:
            state = StreamingLogprobSplitterState(
                past_logprobs=np.zeros((0, logprobs.shape[-1]), np.float32))
        if not isinstance(state, StreamingLogprobSplitterState):
            raise TypeError(
                "Incorrect 'state' type: expected StreamingLogprobSplitterState "
                f"or None, but got {type(state)}")

        expand = self.SPEECH_EXPAND_SIZE
        logprobs = np.concatenate((state.past_logprobs, logprobs), axis=-2)
        # Silence = high combined probability of the last two classes
        # (space, blank).
        is_speech = np.exp(logprobs[..., -2:]).sum(axis=-1) <= self.SILENCE_THRESHOLD

        if not is_last and not is_speech.any():
            # Fast path for all-silence windows (the common telephony case —
            # exact same result as the full span machinery: no phrases, keep
            # the trailing ``expand``-frame margin).
            consumed = max(0, len(logprobs) - expand)
            return [], StreamingLogprobSplitterState(
                past_logprobs=logprobs[consumed:],
                offset=state.offset + consumed,
            )

        phrases: list[LogprobPhrase] = []
        consumed = 0
        for start, end in self._phrase_spans(is_speech, is_last=is_last):
            phrases.append(LogprobPhrase(
                logprobs=logprobs[max(0, start - expand):end + expand],
                start_frame=start + state.offset,
                end_frame=end + state.offset,
            ))
            consumed = end

        # Drop consumed frames; if nothing after is speech, also drop the
        # trailing silence except an ``expand``-frame margin.
        if not is_speech[consumed:].any():
            consumed = max(consumed, len(logprobs) - expand)
        return phrases, StreamingLogprobSplitterState(
            past_logprobs=logprobs[consumed:],
            offset=state.offset + consumed,
        )
