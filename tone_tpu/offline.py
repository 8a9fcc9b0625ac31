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
    use_offline_forward: bool = False  # full-sequence graph instead of the scan
    mesh: object = None  # jax.sharding.Mesh: shard batches over its 'data' axis
    word_timestamps: bool = False  # per-word times + confidences on phrases

    def __post_init__(self):
        if self.decoder is None:
            from tone_tpu.decoder import GreedyCTCDecoder

            self.decoder = GreedyCTCDecoder()
        from tone_tpu.acoustic import cast_params_for_inference

        self.variables = cast_params_for_inference(self.variables, self.config)
        if self.mesh is not None:
            # Data-parallel bulk transcription: params replicated, utterance
            # rows sharded over the mesh's 'data' axis (SURVEY.md §2.3 —
            # batch parallelism on TPU meshes).  XLA's SPMD partitioner
            # splits the whole forward with zero collectives (the graph is
            # batch-pointwise).
            from tone_tpu.parallel.mesh import batch_sharding, replicated

            self._row_sharding = batch_sharding(self.mesh)
            self.variables = jax.device_put(self.variables, replicated(self.mesh))
            n_rows = self.mesh.shape["data"]
            if self.batch_size % n_rows:
                raise ValueError(
                    f"batch_size {self.batch_size} must be a multiple of the "
                    f"mesh 'data' axis size {n_rows}")
        else:
            self._row_sharding = None
            self.variables = jax.device_put(self.variables)
        cfg = self.config

        # Bulk transcription defaults to the *streaming* step over chunk
        # columns: chunk-local attention is O(T) in utterance length, while
        # the full-sequence offline forward with (T, T) masks measured ~60%
        # slower at 60 s utterances.  ``use_offline_forward`` switches to the
        # full-sequence graph (block-diagonal attention, also O(T) in score
        # surface) — numerics are identical either way (the offline masks
        # exactly simulate this chunking; tests/test_model_core.py,
        # tests/test_encoder_blocked.py).
        from tone_tpu.core.model import apply_streaming, init_streaming_state

        def chunk_scan(variables, chunks):  # chunks: (B, n_chunks, chunk_samples)
            state = init_streaming_state(cfg, chunks.shape[0])

            def step(state, chunk):
                logprobs, state = apply_streaming(variables, cfg, chunk, state)
                return state, logprobs

            _, logprobs = jax.lax.scan(step, state, jnp.swapaxes(chunks, 0, 1))
            # (n_chunks, B, frames, V) -> (B, n_chunks * frames, V)
            logprobs = jnp.swapaxes(logprobs, 0, 1)
            b, n, f, v = logprobs.shape
            return logprobs.reshape(b, n * f, v)

        def offline_forward(variables, chunks):
            b, n, c = chunks.shape
            # No lengths: padded-tail chunks are processed like the scan
            # processes them (as real zero audio), keeping the two paths
            # numerically interchangeable; callers slice valid frames.
            logprobs, _, _ = apply_offline(
                variables, cfg, chunks.reshape(b, n * c), training=False)
            return logprobs

        self._batch_forward = jax.jit(
            offline_forward if self.use_offline_forward else chunk_scan)
        self._splitter = StreamingLogprobSplitter()

    def transcribe(self, audios: Sequence[np.ndarray]) -> list[list[TextPhrase]]:
        """Transcribe utterances (int16-range int arrays); order preserved.

        Two-deep software pipeline: the device forward for batch ``i+1`` is
        dispatched (jax dispatch is async) before the host splits and decodes
        batch ``i``, so host-side work overlaps device compute.
        """
        order = np.argsort([len(a) for a in audios], kind="stable")
        results: list[list[TextPhrase] | None] = [None] * len(audios)

        pending = None
        for start in range(0, len(order), self.batch_size):
            launched = self._launch(order[start:start + self.batch_size], audios)
            if pending is not None:
                self._finish(pending, results)
            pending = launched
        if pending is not None:
            self._finish(pending, results)
        return results  # type: ignore[return-value]

    def _launch(self, idx, audios):
        """Dispatch one batch's device forward; returns (idx, row_chunks,
        device logprobs) without blocking on the result."""
        cfg = self.config
        pad = cfg.padding
        chunk = cfg.audio_chunk_samples
        bucket_chunks = max(self.bucket_samples // chunk, 1)
        batch_audios = [np.pad(np.asarray(audios[i], np.int32), (pad, pad))
                        for i in idx]
        # rows padded to a shared, bucketed chunk count (one compile per
        # (batch, bucket) shape)
        row_chunks = [-(-len(a) // chunk) for a in batch_audios]
        n_chunks = -(-max(row_chunks) // bucket_chunks) * bucket_chunks
        n_rows = len(idx)
        if self._row_sharding is not None:
            # Zero-row pad to a shard-even row count (extra rows are
            # dropped after the forward).
            div = self.mesh.shape["data"]
            n_rows = -(-n_rows // div) * div
        audio_arr = np.zeros((n_rows, n_chunks * chunk), np.int32)
        for row, a in enumerate(batch_audios):
            audio_arr[row, :len(a)] = a

        chunks = audio_arr.reshape(n_rows, n_chunks, chunk)
        # device_put straight from the numpy array: with a sharding this
        # distributes each row shard once, instead of committing the whole
        # batch to one device and resharding.
        chunks_dev = jax.device_put(
            chunks, self._row_sharding) if self._row_sharding is not None \
            else jnp.asarray(chunks)
        return idx, row_chunks, self._batch_forward(self.variables, chunks_dev)

    def _finish(self, launched, results) -> None:
        """Block on a launched batch's logprobs, split and decode them."""
        idx, row_chunks, logprobs_dev = launched
        frames = self.config.encoder.chunk_size
        logprobs = np.asarray(logprobs_dev, dtype=np.float32)

        split = []
        for row, i in enumerate(idx):
            row_lp = logprobs[row, :row_chunks[row] * frames]
            phrases, _ = self._splitter.forward(row_lp, None, is_last=True)
            split.append((i, phrases))

        flat = [p for _, phrases in split for p in phrases]
        forward_batch = getattr(self.decoder, "forward_batch", None)
        if forward_batch is not None:
            # Device decoder: all phrases of the batch in one call.
            texts = forward_batch([np.ascontiguousarray(p.logprobs)
                                   for p in flat])
        else:
            texts = [self.decoder.forward(np.ascontiguousarray(p.logprobs))
                     for p in flat]

        word_spans = [None] * len(flat)
        if self.word_timestamps:
            # All phrases of the batch align in one device call per (T, S)
            # bucket — the batched twin of tone_tpu/align.py.
            from tone_tpu.ops.align_device import align_words_batch

            word_spans = align_words_batch([p.logprobs for p in flat], texts)

        it = iter(zip(texts, word_spans))
        for i, phrases in split:
            results[i] = [self._to_text_phrase(p, *next(it)) for p in phrases]

    def forward_offline(self, audio: np.ndarray) -> list[TextPhrase]:
        """Single-utterance convenience; duck-types ``StreamingCTCPipeline``
        (so e.g. ``tone_tpu.eval.evaluate_pipeline`` accepts a transcriber)."""
        return self.transcribe([audio])[0]

    def logprobs(self, audios: Sequence[np.ndarray]) -> list[np.ndarray]:
        """Per-utterance (frames, vocab+1) logprobs, batched/bucketed like
        ``transcribe`` but without splitting or decoding — the acoustic
        front half for forced alignment (`tone_tpu align`) and analysis.
        Same two-deep pipeline as ``transcribe``: batch ``i+1`` dispatches
        before batch ``i``'s host transfer blocks."""
        frames = self.config.encoder.chunk_size
        order = np.argsort([len(a) for a in audios], kind="stable")
        out: list[np.ndarray | None] = [None] * len(audios)

        def finish(launched):
            idx, row_chunks, lp_dev = launched
            lp = np.asarray(lp_dev, dtype=np.float32)
            for row, i in enumerate(idx):
                out[i] = lp[row, :row_chunks[row] * frames]

        pending = None
        for start in range(0, len(order), self.batch_size):
            launched = self._launch(order[start:start + self.batch_size], audios)
            if pending is not None:
                finish(pending)
            pending = launched
        if pending is not None:
            finish(pending)
        return out  # type: ignore[return-value]

    def _to_text_phrase(self, logprob_phrase, text: str,
                        spans=None) -> TextPhrase:
        cfg = self.config
        bias = cfg.mean_time_bias + cfg.padding / cfg.frontend.sample_rate
        start = max(0.0, round(logprob_phrase.start_frame * cfg.frame_size - bias, 2))
        end = max(start, round(logprob_phrase.end_frame * cfg.frame_size - bias, 2))
        words = None
        if spans and self.word_timestamps:
            from tone_tpu.align import spans_to_word_timings

            words = spans_to_word_timings(
                spans, logprob_phrase.start_frame, cfg.frame_size, bias)
        return TextPhrase(text=text, start_time=start, end_time=end, words=words)
