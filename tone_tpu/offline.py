"""Batched offline transcription — bulk throughput beyond the reference.

The reference defines offline recognition as looped streaming over one
utterance at a time (tone/pipeline.py:174-203).  That is latency-shaped, not
throughput-shaped.  This module batches whole utterances through the offline
forward (whose chunk-simulating masks make it numerically equivalent to
streaming), splits and decodes per utterance — the right shape for corpus
evaluation and batch jobs on TPU.

Utterances are bucketed by padded length so XLA compiles one program per
bucket, not per shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import apply_offline
from tone_tpu.pipeline import TextPhrase
from tone_tpu.splitter import StreamingLogprobSplitter


@dataclass
class OfflineTranscriber:
    """Batched utterance transcription over the offline forward."""

    variables: dict
    config: ToneConfig
    decoder: object = None  # GreedyCTCDecoder-compatible; default greedy
    batch_size: int = 16
    bucket_samples: int = 8 * 2400  # pad lengths up to multiples of this

    def __post_init__(self):
        if self.decoder is None:
            from tone_tpu.decoder import GreedyCTCDecoder

            self.decoder = GreedyCTCDecoder()
        self.variables = jax.device_put(self.variables)
        cfg = self.config

        def forward(variables, audio, lengths):
            logprobs, out_lens, _ = apply_offline(variables, cfg, audio, lengths)
            return logprobs, out_lens

        self._forward = jax.jit(forward)
        self._splitter = StreamingLogprobSplitter()

    def transcribe(self, audios: Sequence[np.ndarray]) -> list[list[TextPhrase]]:
        """Transcribe utterances (int16-range int arrays); order preserved."""
        cfg = self.config
        pad = cfg.padding
        order = np.argsort([len(a) for a in audios], kind="stable")
        results: list[list[TextPhrase] | None] = [None] * len(audios)

        for start in range(0, len(order), self.batch_size):
            idx = order[start:start + self.batch_size]
            batch_audios = [np.pad(np.asarray(audios[i], np.int32), (pad, pad))
                            for i in idx]
            max_len = max(len(a) for a in batch_audios)
            max_len = -(-max_len // self.bucket_samples) * self.bucket_samples
            audio_arr = np.zeros((len(idx), max_len), np.int32)
            lens = np.zeros(len(idx), np.int32)
            for row, a in enumerate(batch_audios):
                audio_arr[row, :len(a)] = a
                lens[row] = len(a)

            logprobs, out_lens = self._forward(
                self.variables, jnp.asarray(audio_arr), jnp.asarray(lens))
            logprobs = np.asarray(logprobs, np.float32)
            out_lens = np.asarray(out_lens)

            for row, i in enumerate(idx):
                row_lp = logprobs[row, :out_lens[row]]
                phrases, _ = self._splitter.forward(row_lp, None, is_last=True)
                results[i] = [self._to_text_phrase(p) for p in phrases]
        return results  # type: ignore[return-value]

    def forward_offline(self, audio: np.ndarray) -> list[TextPhrase]:
        """Single-utterance convenience; duck-types ``StreamingCTCPipeline``
        (so e.g. ``tone_tpu.eval.evaluate_pipeline`` accepts a transcriber)."""
        return self.transcribe([audio])[0]

    def _to_text_phrase(self, logprob_phrase) -> TextPhrase:
        cfg = self.config
        text = self.decoder.forward(np.ascontiguousarray(logprob_phrase.logprobs))
        bias = cfg.mean_time_bias + cfg.padding / cfg.frontend.sample_rate
        start = max(0.0, round(logprob_phrase.start_frame * cfg.frame_size - bias, 2))
        end = max(start, round(logprob_phrase.end_frame * cfg.frame_size - bias, 2))
        return TextPhrase(text=text, start_time=start, end_time=end)
