"""Decoder implementations for the ASR pipeline (API parity with
reference tone/decoder.py): greedy and beam-search CTC decoding.

The beam-search decoder uses the built-in CTC prefix beam search
(tone_tpu/decoding) with an optional word n-gram LM — replacing the
reference's pyctcdecode + KenLM stack (tone/decoder.py:16-17, :108) with
first-party code.  Greedy decode also exists as a batched on-TPU op
(tone_tpu/ops/greedy.py) for the multi-stream server; this module is the
simple host-side path.
"""

from __future__ import annotations

from enum import Enum
from itertools import groupby
from pathlib import Path
from typing import TYPE_CHECKING

import numpy as np

from tone_tpu.config import LABELS

if TYPE_CHECKING:
    from typing import Sequence

    import numpy.typing as npt

    from tone_tpu.decoding.lm import LanguageModel

__all__ = ["LABELS", "DecoderType", "GreedyCTCDecoder", "BeamSearchCTCDecoder",
           "DeviceBeamSearchCTCDecoder", "build_decoder"]


class DecoderType(Enum):
    """Supported decoding strategies for CTC output."""

    GREEDY = "greedy"
    BEAM_SEARCH = "beam_search"


def _validate_logprobs(logprobs) -> None:
    if not isinstance(logprobs, np.ndarray):
        raise TypeError(
            f"Incorrect 'logprobs' type: expected np.ndarray, but got {type(logprobs)}")
    if logprobs.shape[1:] != (len(LABELS) + 1,):
        raise ValueError(
            f"Shape of 'logprobs' must be (L, {len(LABELS) + 1}), but got {logprobs.shape}")
    if logprobs.dtype != np.float32:
        raise ValueError(
            f"Incorrect dtype of 'logprobs': expected np.float32, but got {logprobs.dtype}")


class GreedyCTCDecoder:
    """Greedy CTC decoding: argmax, collapse repeats, drop blanks."""

    def forward(self, logprobs: "npt.NDArray[np.float32]") -> str:
        """Decode (L, vocab+1) logprobs to text."""
        _validate_logprobs(logprobs)
        tokens = logprobs.argmax(axis=-1)
        collapsed = (token for token, _ in groupby(tokens.tolist()))
        return "".join(LABELS[t] for t in collapsed if t < len(LABELS)).strip()


def _native_lm_path(model_path: Path) -> Path:
    """LM path to hand the native C++ scorer.

    The C++ scorer reads ARPA text and KenLM probing binaries; KenLM *trie*
    binaries are converted once to an equivalent probing binary in the
    temp dir (keyed by source identity) and the conversion is reused.
    """
    from tone_tpu.decoding.kenlm_binary import kenlm_model_type

    if kenlm_model_type(model_path) not in (2, 3, 4, 5):
        return model_path
    import hashlib
    import tempfile

    stat = model_path.stat()
    key = hashlib.sha256(
        f"{model_path.resolve()}:{stat.st_size}:{stat.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    cached = Path(tempfile.gettempdir()) / f"tone_tpu_lm_{key}.bin"
    if not cached.exists():
        import os

        from tone_tpu.decoding.kenlm_binary import write_kenlm_binary
        from tone_tpu.decoding.kenlm_trie import KenLMTrie, trie_to_ngrams

        # Per-process temp name + atomic rename: concurrent converters
        # each publish a complete file (last writer wins, same bytes).
        tmp = cached.with_suffix(f".{os.getpid()}.tmp")
        try:
            write_kenlm_binary(trie_to_ngrams(KenLMTrie(model_path)), tmp)
            tmp.replace(cached)
        finally:
            tmp.unlink(missing_ok=True)
    return cached


class BeamSearchCTCDecoder:
    """Beam-search CTC decoding with optional n-gram LM shallow fusion.

    Defaults mirror the reference: alpha=0.4, beta=0.9, beam width 200
    (tone/decoder.py:108, :133).
    """

    ALPHA = 0.4
    BETA = 0.9
    BEAM_WIDTH = 200

    def __init__(self, lm: "LanguageModel | None" = None, *,
                 alpha: float = ALPHA, beta: float = BETA,
                 beam_width: int = BEAM_WIDTH, native_lm=None,
                 hotwords=None, hotword_weight: float = 10.0) -> None:
        self._lm = lm
        self._native_lm = native_lm
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        # Use the C++ decoder when buildable; it is verified equivalent to
        # the Python implementation (tests/test_native_decoder.py,
        # tests/test_hotwords.py) and ~10x faster.  A python LanguageModel
        # without a native twin, or a pre-built Python HotwordScorer (whose
        # phrase list the native side can't see), forces the Python path.
        from tone_tpu.decoding.native.beamsearch import native_available

        native_ok = native_available() and (lm is None or native_lm is not None)
        self._hotwords = None
        self._native_hotwords = None
        if hotwords:
            from tone_tpu.decoding.hotwords import HotwordScorer

            if isinstance(hotwords, HotwordScorer):
                # A pre-built scorer keeps its phrase list and weight, so
                # the native twin is still constructible from it.
                self._hotwords = hotwords
                phrases, hotword_weight = hotwords.phrases, hotwords.weight
            else:
                if isinstance(hotwords, str):
                    raise TypeError(
                        "hotwords must be a list of phrases, not a string")
                phrases = [str(h) for h in hotwords]
                bad = {c for h in phrases for c in h.lower() if c not in LABELS}
                if bad:
                    raise ValueError(
                        f"hotword characters outside the label set: {sorted(bad)}")
                self._hotwords = HotwordScorer(phrases, hotword_weight)
            if native_ok:
                from tone_tpu.decoding.native.beamsearch import NativeHotwords

                try:
                    self._native_hotwords = NativeHotwords(
                        LABELS, phrases, hotword_weight)
                except ValueError:
                    # pre-built scorer with out-of-label-set phrases (those
                    # can never match, but stay on the Python path)
                    native_ok = False
        self._use_native = native_ok

    @classmethod
    def from_local(cls, model_path: str | Path, *, hotwords=None,
                   hotword_weight: float = 10.0) -> "BeamSearchCTCDecoder":
        """Initialize from a local LM file: ARPA text (optionally .gz) or a
        KenLM binary — the reference's published ``kenlm.bin`` artifact
        (tone/decoder.py:84-95) loads directly."""
        from tone_tpu.decoding.lm import load_lm
        from tone_tpu.decoding.native.beamsearch import NativeLM, native_available

        model_path = Path(model_path)
        native_lm = None
        if native_available() and model_path.suffix != ".gz":
            try:
                native_lm = NativeLM(_native_lm_path(model_path))
            except (RuntimeError, ValueError, OSError):
                # Conversion/scorer failure of any kind degrades to the
                # pure-Python LM instead of failing decoder construction.
                native_lm = None
        return cls(load_lm(model_path), native_lm=native_lm,
                   hotwords=hotwords, hotword_weight=hotword_weight)

    @classmethod
    def from_hugging_face(cls) -> "BeamSearchCTCDecoder":
        """Download the LM artifact from the Hub and initialize."""
        return cls.from_local(cls.download_from_hugging_face())

    @classmethod
    def download_from_hugging_face(cls) -> str:
        from huggingface_hub import hf_hub_download

        return hf_hub_download("t-tech/T-one", "kenlm.bin")

    def forward(self, logprobs: "npt.NDArray[np.float32]") -> str:
        """Decode (L, vocab+1) logprobs to text via prefix beam search."""
        _validate_logprobs(logprobs)
        if self._use_native:
            from tone_tpu.decoding.native.beamsearch import ctc_beam_search_native

            return ctc_beam_search_native(
                logprobs, LABELS, self._native_lm,
                alpha=self.alpha, beta=self.beta, beam_width=self.beam_width,
                hotwords=self._native_hotwords,
            )
        from tone_tpu.decoding.beam import ctc_beam_search

        return ctc_beam_search(
            logprobs.astype(np.float64), LABELS, self._lm,
            alpha=self.alpha, beta=self.beta, beam_width=self.beam_width,
            hotwords=self._hotwords,
        )

    def nbest(self, logprobs: "npt.NDArray[np.float32]",
              n: int = 8) -> list[tuple[str, float]]:
        """Up to ``n`` alternative transcripts with scores, best first —
        the capability the reference's decode library exposes as
        pyctcdecode ``decode_beams`` (unused by the reference pipeline).
        Scores are natural-log acoustic + LM (+hotword) totals."""
        _validate_logprobs(logprobs)
        search = self.streaming()
        search.advance(np.asarray(logprobs,
                                  np.float32 if self._use_native else np.float64))
        return search.nbest(n)

    def streaming(self):
        """A carried-state decoder for incremental transcription: feed
        logprob frames as they arrive with ``advance(logprobs)``, read the
        current best with ``result()``, restart with ``reset()``.

        Prefix beam search is frame-sequential, so advancing chunk by chunk
        gives exactly ``forward()`` over the concatenated frames — this is
        what powers low-latency LM-quality interim transcripts in the
        serving engine, a capability beyond the reference (which decodes
        only completed phrases).
        """
        if self._use_native:
            from tone_tpu.decoding.native.beamsearch import NativeStreamingBeam

            return NativeStreamingBeam(
                LABELS, self._native_lm, alpha=self.alpha, beta=self.beta,
                beam_width=self.beam_width, hotwords=self._native_hotwords)
        from tone_tpu.decoding.beam import StreamingBeamSearch

        return StreamingBeamSearch(
            LABELS, self._lm, alpha=self.alpha, beta=self.beta,
            beam_width=self.beam_width, hotwords=self._hotwords)


class DeviceBeamSearchCTCDecoder:
    """Beam-search decoding with the search on the TPU and the LM applied
    as an n-best rescoring pass on the host.

    The host decoders above run shallow fusion sequentially per phrase; at
    full chip utilization (~18k concurrent streams, docs/performance.md)
    that makes the host CPU the decode bottleneck.  This decoder batches
    the search itself on device (tone_tpu/ops/beam_decode.py) and reduces
    host LM work to a handful of lookups per *hypothesis* instead of per
    frame — see tone_tpu/decoding/rescore.py for the cost argument.

    The interface matches the other decoders (``forward`` on one phrase);
    ``forward_batch`` is the intended high-throughput path.
    """

    def __init__(self, lm: "LanguageModel | None" = None, *,
                 alpha: float = BeamSearchCTCDecoder.ALPHA,
                 beta: float = BeamSearchCTCDecoder.BETA,
                 beam_width: int = 32, nbest: int = 8,
                 max_len: int = 2048, fusion: bool = False,
                 hotwords=None, hotword_weight: float = 10.0) -> None:
        """``fusion=False`` (default): LM-free device search + host n-best
        rescoring.  ``fusion=True``: the LM itself is fused into the device
        search (``lm`` must be a ``decoding.device_lm.DeviceLM`` or expose
        ``_ngrams`` tables to build one) — full shallow fusion with zero
        host work in the search loop.  ``hotwords`` biases the device
        search itself toward the given words/phrases in either mode — the
        automaton rides the beam state as dense trie arrays
        (ops/beam_decode.py HotwordTables)."""
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        self.nbest_hyps = nbest
        self.max_len = max_len
        self.fusion = fusion and lm is not None
        self._hotwords = None
        if hotwords:
            from tone_tpu.ops.beam_decode import make_hotword_tables

            self._hotwords = make_hotword_tables(hotwords, hotword_weight)
        # Serving knobs (MultiStreamEngine sets both to its final-decode
        # batch): pad the device batch up to ``batch_floor`` rows and split
        # larger lists into ``max_batch``-row calls, so the set of compiled
        # (B, T) programs is exactly {(batch_floor, 64·2^k)} — warmable up
        # front, no mid-serving XLA compiles.
        self.batch_floor = 1
        self.max_batch: int | None = None
        if self.fusion:
            from tone_tpu.decoding.device_lm import DeviceLM, DeviceProbingLM

            if not isinstance(lm, (DeviceLM, DeviceProbingLM)):
                ngrams = getattr(lm, "_ngrams", None)
                if ngrams is None:
                    raise TypeError(
                        "fusion=True needs a DeviceLM/DeviceProbingLM (or "
                        "an LM exposing its n-gram tables); got "
                        f"{type(lm).__name__} — use load_device_lm")
                lm = DeviceLM.from_ngrams(ngrams)
            self._lm_arrays = lm.arrays()
        self._lm = lm

    @property
    def hotword_tables(self):
        """Device hotword automaton tables (ops.beam_decode.HotwordTables)
        or None — the public seam the serving engine uses to run its
        interim arena through the biased search variants."""
        return self._hotwords

    @classmethod
    def from_local(cls, model_path: str | Path, *, fusion: bool = False,
                   **kwargs) -> "DeviceBeamSearchCTCDecoder":
        """Any supported LM artifact loads for either mode — ARPA text or
        all six KenLM binary formats, including the reference's published
        probing-format ``kenlm.bin`` (tone/decoder.py:84-95)."""
        if fusion:
            from tone_tpu.decoding.device_lm import load_device_lm

            return cls(load_device_lm(Path(model_path)), fusion=True,
                       **kwargs)
        from tone_tpu.decoding.lm import load_lm

        return cls(load_lm(Path(model_path)), **kwargs)

    def forward(self, logprobs: "npt.NDArray[np.float32]") -> str:
        _validate_logprobs(logprobs)
        return self.forward_batch([logprobs])[0]

    def nbest(self, logprobs: "npt.NDArray[np.float32]",
              n: int | None = None) -> list[tuple[str, float]]:
        """Up to ``n`` (default: the decoder's nbest) alternative
        transcripts with scores from the device search, LM-rescored when an
        LM is configured (fusion mode ranks with the fused score).
        Stripped-text duplicates (trailing-space twins) are collapsed to
        the best-scoring, matching the host decoders' nbest."""
        _validate_logprobs(logprobs)
        n = n or self.nbest_hyps
        return self.forward_batch_nbest([np.ascontiguousarray(logprobs)], n)[0]

    @staticmethod
    def _t_bucket(frames: int) -> int:
        """Frame-count bucket: 64·2^k (64, 128, 256, …) — few enough
        programs that a server can precompile every one."""
        t = 64
        while t < frames:
            t <<= 1
        return t

    def _pad_batch(self, logprobs_list, t_pad=None):
        lengths = [lp.shape[0] for lp in logprobs_list]
        if t_pad is None:
            t_pad = self._t_bucket(max(lengths))
        b_pad = max(1 << (len(logprobs_list) - 1).bit_length(),
                    self.batch_floor)
        v = logprobs_list[0].shape[1]
        padded = np.zeros((b_pad, t_pad, v), np.float32)
        for row, lp in enumerate(logprobs_list):
            padded[row, :lp.shape[0]] = lp
        return padded, np.array(lengths + [0] * (b_pad - len(logprobs_list)))

    def forward_batch(self, logprobs_list, hotword_rows=None) -> list[str]:
        """Decode a list of (L_i, vocab+1) phrases on device.

        Phrases are grouped by frame-count bucket (64·2^k) and each group
        decodes in one device call, so one 1900-frame force-split phrase
        does not pad thirty 50-frame phrases to its length; groups larger
        than ``max_batch`` split into sequential calls.  Batch counts pad
        to powers of two (with a ``batch_floor``) so XLA compiles one
        program per bucket, not per shape — the same policy as
        OfflineTranscriber's acoustic batching.

        ``hotword_rows`` (optional, aligned with ``logprobs_list``): a
        per-phrase ``HotwordTables`` or None — rows with tables run their
        OWN contextual biasing inside the same batched call (stacked
        tables, ops/beam_decode.stack_hotword_tables); None rows fall back
        to the decoder's own hotwords, or no biasing.  This is how the
        serving engine keeps per-request-biased streams on the batched
        finals path.
        """
        return [r[0][0] if r else ""
                for r in self.forward_batch_nbest(logprobs_list, 1,
                                                  hotword_rows)]

    def forward_batch_nbest(self, logprobs_list, n: int,
                            hotword_rows=None) -> list[list[tuple[str, float]]]:
        """Batched n-best: per phrase, up to ``n`` ranked (text, score)
        alternatives, best first, stripped-text duplicates collapsed.

        Same bucketing/padding policy as :meth:`forward_batch` and the SAME
        compiled device programs (the n-best readout is a host-side pass
        over the already-transferred beam state), so the serving engine can
        route n-best streams through its batched final-decode call instead
        of per-phrase host-pool decodes.
        """
        if not logprobs_list:
            return []
        groups: dict[int, list[int]] = {}
        for i, lp in enumerate(logprobs_list):
            groups.setdefault(self._t_bucket(lp.shape[0]), []).append(i)
        out: list[list[tuple[str, float]] | None] = [None] * len(logprobs_list)
        for t_pad in sorted(groups):
            idxs = groups[t_pad]
            cap = self.max_batch or len(idxs)
            for k in range(0, len(idxs), cap):
                chunk = idxs[k:k + cap]
                rows = ([hotword_rows[i] for i in chunk]
                        if hotword_rows is not None else None)
                if rows is not None and not any(r is not None for r in rows):
                    rows = None
                ranked = self._decode_bucket(
                    [logprobs_list[i] for i in chunk], t_pad, n, rows)
                for i, hyps in zip(chunk, ranked):
                    out[i] = hyps
        return out

    def _decode_bucket(self, logprobs_list, t_pad, n: int = 1,
                       hotword_rows=None) -> list[list[tuple[str, float]]]:
        """One padded device call; per row up to ``n`` deduplicated ranked
        hypotheses.  The rescoring pool is the full ``max(n, nbest_hyps)``
        readout and truncation happens after ranking, so the top-1 of any
        ``n`` agrees with ``forward``."""
        n_rows = len(logprobs_list)
        pool = max(n, self.nbest_hyps)
        padded, lengths = self._pad_batch(logprobs_list, t_pad)

        hotwords = self._hotwords
        if hotword_rows is not None:
            from tone_tpu.ops.beam_decode import stack_hotword_tables

            # Per-row biasing: rows without their own tables inherit the
            # decoder-wide hotwords (or the dead automaton = unbiased).
            hotwords = stack_hotword_tables(
                [r if r is not None else self._hotwords
                 for r in hotword_rows],
                n_rows=padded.shape[0])

        if self.fusion:
            from tone_tpu.ops.beam_decode import (
                fused_beam_advance, fused_beam_nbest, init_fused_beam_state)

            state = init_fused_beam_state(padded.shape[0], self.beam_width,
                                          self._lm, self.max_len,
                                          hotwords=hotwords)
            state = fused_beam_advance(state, padded, self._lm_arrays,
                                       lengths, alpha=self.alpha,
                                       beta=self.beta,
                                       hotwords=hotwords)
            ranked_rows = fused_beam_nbest(state, self._lm, pool,
                                           alpha=self.alpha, beta=self.beta)
        else:
            from tone_tpu.decoding.rescore import rescore_nbest

            if hotwords is not None:
                from tone_tpu.ops.beam_decode import (
                    hot_beam_advance, hot_beam_nbest, init_hot_beam_state)

                state = init_hot_beam_state(padded.shape[0], self.beam_width,
                                            self.max_len)
                state = hot_beam_advance(state, padded, lengths,
                                         hotwords=hotwords)
                hyps_rows = hot_beam_nbest(state, pool)
            else:
                from tone_tpu.ops.beam_decode import (
                    beam_advance, beam_nbest, init_beam_state)

                state = init_beam_state(padded.shape[0], self.beam_width,
                                        self.max_len)
                state = beam_advance(state, padded, lengths)
                hyps_rows = beam_nbest(state, pool)
            ranked_rows = [rescore_nbest(hyps, self._lm,
                                         alpha=self.alpha, beta=self.beta)
                           for hyps in hyps_rows[:n_rows]]
        return [self._dedup_ranked(ranked, n)
                for ranked in ranked_rows[:n_rows]]

    @staticmethod
    def _dedup_ranked(ranked, n: int) -> list[tuple[str, float]]:
        out: list[tuple[str, float]] = []
        seen: set[str] = set()
        for text, score in ranked:
            if text in seen:
                continue
            seen.add(text)
            out.append((text, score))
            if len(out) >= n:
                break
        return out


def parse_hotwords(spec: "str | None") -> "list[str] | None":
    """CLI hotword spec: comma-separated list, or ``@file`` (one per line)."""
    if not spec:
        return None
    if spec.startswith("@"):
        with open(spec[1:], encoding="utf-8") as f:
            return [line.strip() for line in f if line.strip()]
    return [h.strip() for h in spec.split(",") if h.strip()]


def build_decoder(kind: str, *, lm: "str | Path | None" = None,
                  fused_lm: bool = False, beam_width: int | None = None,
                  hotwords: "Sequence[str] | None" = None,
                  hotword_weight: float = 10.0):
    """CLI-facing decoder factory behind every ``python -m tone_tpu``
    subcommand (``tone_tpu/runtime/server.py`` forwards to the same CLI),
    so decoder dispatch and validation live in one place.

    ``kind`` is ``greedy`` / ``beam`` / ``device-beam``.  ``lm`` is a path
    to an ARPA text LM or any of the six KenLM binary formats.  ``fused_lm``
    selects full device-side shallow fusion (device-beam only; requires
    ``lm``).  ``beam_width`` overrides the decoder's default width.
    ``hotwords`` biases the search toward the given words/phrases (host
    ``beam``, or ``device-beam`` in either LM mode — the automaton rides
    the on-TPU search).  Raises ``ValueError`` on inconsistent flag
    combinations.
    """
    if hotwords and kind == "greedy":
        raise ValueError("--hotwords requires --decoder beam or device-beam")
    if kind == "device-beam":
        if fused_lm and not lm:
            raise ValueError("--fused-lm requires --lm (an ARPA or KenLM "
                             "LM artifact to fuse)")
        kwargs = {"beam_width": beam_width} if beam_width else {}
        if hotwords:
            kwargs.update(hotwords=hotwords, hotword_weight=hotword_weight)
        if lm:
            return DeviceBeamSearchCTCDecoder.from_local(
                lm, fusion=fused_lm, **kwargs)
        return DeviceBeamSearchCTCDecoder(**kwargs)
    if fused_lm:
        raise ValueError("--fused-lm only applies to --decoder device-beam")
    if kind == "beam":
        decoder = (BeamSearchCTCDecoder.from_local(
                       lm, hotwords=hotwords, hotword_weight=hotword_weight)
                   if lm else
                   BeamSearchCTCDecoder(hotwords=hotwords,
                                        hotword_weight=hotword_weight))
        if beam_width:
            decoder.beam_width = beam_width
        return decoder
    if kind == "greedy":
        return GreedyCTCDecoder()
    raise ValueError(f"unknown decoder kind: {kind!r}")
