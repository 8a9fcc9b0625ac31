"""The streaming ASR pipeline: acoustic model -> splitter -> decoder.

API parity with the reference ``StreamingCTCPipeline`` (tone/pipeline.py):
``forward`` / ``forward_offline`` / ``finalize``, the +-300 ms "magic
padding", and the identical timestamp math (frame_size 0.03 s, mean time
bias 0.33 s, padding correction — pipeline.py:151-164).

The pipeline state is ``(model_state, splitter_state)`` where
``model_state`` is the device-resident state pytree (fast path — nothing
round-trips through the host between chunks).  ``pack_state``/``unpack_state``
(tone_tpu.core.model) serialize it to the reference-compatible fp16 blob for
suspend/migrate.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import TYPE_CHECKING

import numpy as np

from tone_tpu.acoustic import StreamingCTCModel
from tone_tpu.decoder import BeamSearchCTCDecoder, DecoderType, GreedyCTCDecoder
from tone_tpu.splitter import StreamingLogprobSplitter

if TYPE_CHECKING:
    import numpy.typing as npt


@dataclass
class TextPhrase:
    """A decoded phrase with timestamps (seconds).

    ``words`` (None unless the pipeline was built with
    ``word_timestamps=True``) carries per-word times + confidences from CTC
    forced alignment (tone_tpu/align.py) — beyond the reference, which is
    phrase-level only (tone/pipeline.py:151-164).

    ``nbest`` (None unless n-best was requested — the pipeline's
    ``nbest=`` constructor arg / ``transcribe --nbest``, or the serving
    engine's per-stream ``set_stream_nbest``) carries up to N alternative
    ``(text, score)`` transcripts, best first; ``nbest[0][0] == text``."""

    text: str
    start_time: float
    end_time: float
    words: "tuple | None" = None
    nbest: "tuple | None" = None


class StreamingCTCPipeline:
    """Streaming CTC speech recognition over 300 ms chunks."""

    # The model was trained with left/right padding; adding it noticeably
    # improves recognition quality (reference pipeline.py:47-48).
    PADDING: int = 2400  # 300 ms * 8 kHz
    CHUNK_SIZE: int = StreamingCTCModel.AUDIO_CHUNK_SAMPLES

    def __init__(
        self,
        model: StreamingCTCModel,
        logprob_splitter: StreamingLogprobSplitter,
        decoder: GreedyCTCDecoder | BeamSearchCTCDecoder,
        *,
        word_timestamps: bool = False,
        nbest: int = 0,
    ) -> None:
        if nbest == 1:
            raise ValueError(
                "nbest=1 is ambiguous (phrases always carry the top "
                "hypothesis as .text): use 0 for no alternatives or N >= 2")
        if nbest > 1 and not hasattr(decoder, "nbest"):
            raise ValueError(
                "nbest > 1 needs a beam decoder (greedy has no alternatives)")
        self.nbest = int(nbest) if nbest > 1 else 0
        self.model = model
        self.logprob_splitter = logprob_splitter
        self.decoder = decoder
        self.word_timestamps = word_timestamps
        # Instance-level chunk/padding follow the model config (e.g. a 400 ms
        # variant built with ToneConfig.with_chunk_duration_ms) — the class
        # attributes are the standard 300 ms defaults.
        config = getattr(model, "config", None)
        if config is not None:
            self.CHUNK_SIZE = config.audio_chunk_samples
            self.PADDING = config.padding

    # -- factories ---------------------------------------------------------

    @classmethod
    def from_hugging_face(cls, *, decoder_type: DecoderType = DecoderType.BEAM_SEARCH):
        """Create a pipeline by downloading artifacts from the HF Hub."""
        model = StreamingCTCModel.from_hugging_face()
        return cls._assemble(model, decoder_type, BeamSearchCTCDecoder.from_hugging_face)

    @classmethod
    def from_local(cls, dir_path: str | Path, *,
                   decoder_type: DecoderType = DecoderType.BEAM_SEARCH,
                   providers=None, config=None):
        """Create a pipeline from a local artifact folder.

        Expects the acoustic checkpoint under ``<dir>/model`` (tone_tpu
        format), ``<dir>/model.safetensors`` / ``model.bin`` (torch format),
        or ``<dir>/model.onnx`` (the reference's deployed artifact), and the
        LM under ``<dir>/lm.arpa[.gz]`` or ``<dir>/kenlm.bin``.
        """
        del providers
        dir_path = Path(dir_path)
        model_path = None
        for candidate in ("model", "model.safetensors", "model.bin", "model.pt",
                          "model.onnx"):
            if (dir_path / candidate).exists():
                model_path = dir_path / candidate
                break
        if model_path is None:
            raise FileNotFoundError(f"no acoustic model artifact in {dir_path}")
        model = StreamingCTCModel.from_local(model_path, config=config)

        def make_beam():
            for candidate in ("lm.arpa.gz", "lm.arpa", "kenlm.bin"):
                if (dir_path / candidate).exists():
                    return BeamSearchCTCDecoder.from_local(dir_path / candidate)
            return BeamSearchCTCDecoder()  # LM-free beam search

        return cls._assemble(model, decoder_type, make_beam)

    @classmethod
    def _assemble(cls, model, decoder_type, make_beam):
        splitter = StreamingLogprobSplitter()
        if decoder_type == DecoderType.GREEDY:
            return cls(model, splitter, GreedyCTCDecoder())
        if decoder_type == DecoderType.BEAM_SEARCH:
            return cls(model, splitter, make_beam())
        raise ValueError("Unknown decoder type")

    @staticmethod
    def download_from_hugging_face(dir_path: str | Path, only_acoustic: bool = False) -> None:
        """Download all artifacts from the HF Hub to a local folder."""
        from shutil import copyfile

        dir_path = Path(dir_path)
        copyfile(StreamingCTCModel.download_from_hugging_face(),
                 dir_path / "model.safetensors")
        if not only_acoustic:
            copyfile(BeamSearchCTCDecoder.download_from_hugging_face(),
                     dir_path / "kenlm.bin")

    # -- inference ---------------------------------------------------------

    def forward(
        self,
        audio_chunk: "npt.NDArray[np.int32]",
        state=None,
        *,
        is_last: bool = False,
    ) -> tuple[list[TextPhrase], tuple]:
        """Process one 300 ms chunk; return finalized phrases + next state."""
        if not isinstance(audio_chunk, np.ndarray):
            raise TypeError(
                f"Incorrect 'audio_chunk' type: expected np.ndarray, but got {type(audio_chunk)}")
        if audio_chunk.shape != (self.CHUNK_SIZE,):
            raise ValueError(
                f"Shape of 'audio_chunk' must be ({self.CHUNK_SIZE},), but got {audio_chunk.shape}")
        if not isinstance(state, (tuple, type(None))):
            raise TypeError(
                f"Incorrect 'state' type: expected tuple or None, but got {type(state)}")

        model_state = state[0] if state is not None else None
        splitter_state = state[1] if state is not None else None

        import jax.numpy as jnp

        logprobs_dev, model_state_next = self.model.forward_native(
            jnp.asarray(audio_chunk[None, :], jnp.int32), model_state)
        logprobs = np.asarray(logprobs_dev[0], dtype=np.float32)

        logprob_phrases, splitter_state_next = self.logprob_splitter.forward(
            logprobs, splitter_state, is_last=is_last)

        phrases = [self._decode_phrase(p) for p in logprob_phrases]
        return phrases, (model_state_next, splitter_state_next)

    def _decode_phrase(self, logprob_phrase) -> TextPhrase:
        logprobs = np.ascontiguousarray(logprob_phrase.logprobs)
        alternatives = None
        if self.nbest:
            ranked = self.decoder.nbest(logprobs, self.nbest)
            text = ranked[0][0] if ranked else ""
            alternatives = tuple(ranked)
        else:
            text = self.decoder.forward(logprobs)
        frame_size = StreamingCTCModel.FRAME_SIZE
        time_bias = StreamingCTCModel.MEAN_TIME_BIAS
        pad_s = self.PADDING / StreamingCTCModel.SAMPLE_RATE
        start_time = max(0, round(
            logprob_phrase.start_frame * frame_size - time_bias - pad_s, 2))
        end_time = max(start_time, round(
            logprob_phrase.end_frame * frame_size - time_bias - pad_s, 2))
        words = None
        if self.word_timestamps and text:
            from tone_tpu.align import align_words, spans_to_word_timings

            words = spans_to_word_timings(
                align_words(logprob_phrase.logprobs, text),
                logprob_phrase.start_frame, frame_size, time_bias + pad_s)
        return TextPhrase(text=text, start_time=start_time,
                          end_time=end_time, words=words, nbest=alternatives)

    def forward_offline(self, audio: "npt.NDArray[np.int32]") -> list[TextPhrase]:
        """Recognize a complete utterance (defined as looped streaming,
        exactly like the reference — pipeline.py:174-203)."""
        if not isinstance(audio, np.ndarray):
            raise TypeError(
                f"Incorrect 'audio' type: expected np.ndarray, but got {type(audio)}")
        if audio.ndim != 1:
            raise ValueError(f"Shape of 'audio' must be (L,), but got {audio.shape}")

        audio = np.pad(audio, (self.PADDING, self.PADDING))
        audio = np.pad(audio, (0, -len(audio) % self.CHUNK_SIZE))
        chunks = np.split(audio, len(audio) // self.CHUNK_SIZE)

        outputs: list[TextPhrase] = []
        state = None
        for i, chunk in enumerate(chunks):
            out, state = self.forward(chunk, state, is_last=i == len(chunks) - 1)
            outputs.extend(out)
        return outputs

    def finalize(self, state) -> tuple[list[TextPhrase], tuple]:
        """Flush the stream: one zero chunk with ``is_last=True``."""
        zero = np.zeros((self.CHUNK_SIZE,), dtype=np.int32)
        return self.forward(zero, state, is_last=True)
