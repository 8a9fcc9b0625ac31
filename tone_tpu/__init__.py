"""tone_tpu — a TPU-native streaming CTC ASR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of T-one
(streaming Russian telephony ASR).  Public API mirrors the reference
package surface (reference tone/__init__.py:10-23).
"""

from tone_tpu.acoustic import StreamingCTCModel
from tone_tpu.audio import (
    read_audio,
    read_example_audio,
    read_stream_audio,
    read_stream_example_audio,
)
from tone_tpu.config import ToneConfig
from tone_tpu.decoder import BeamSearchCTCDecoder, DecoderType, GreedyCTCDecoder
from tone_tpu.pipeline import StreamingCTCPipeline, TextPhrase
from tone_tpu.splitter import LogprobPhrase, StreamingLogprobSplitter
from tone_tpu.version import VERSION

__all__ = [
    "BeamSearchCTCDecoder",
    "DecoderType",
    "GreedyCTCDecoder",
    "LogprobPhrase",
    "StreamingCTCModel",
    "StreamingCTCPipeline",
    "StreamingLogprobSplitter",
    "TextPhrase",
    "ToneConfig",
    "read_audio",
    "read_example_audio",
    "read_stream_audio",
    "read_stream_example_audio",
]
__version__ = VERSION

_LAZY = {
    "OfflineTranscriber": ("tone_tpu.offline", "OfflineTranscriber"),
    "Trainer": ("tone_tpu.training", "Trainer"),
    "TrainerConfig": ("tone_tpu.training", "TrainerConfig"),
    "MultiStreamEngine": ("tone_tpu.runtime", "MultiStreamEngine"),
    "word_error_rate": ("tone_tpu.training", "word_error_rate"),
    "DeviceBeamSearchCTCDecoder": ("tone_tpu.decoder",
                                   "DeviceBeamSearchCTCDecoder"),
    "WordTiming": ("tone_tpu.align", "WordTiming"),
    "align_words": ("tone_tpu.align", "align_words"),
    "HotwordScorer": ("tone_tpu.decoding.hotwords", "HotwordScorer"),
    "estimate_ngram_lm": ("tone_tpu.decoding.estimate", "estimate_ngram_lm"),
    "write_arpa": ("tone_tpu.decoding.estimate", "write_arpa"),
    "perplexity": ("tone_tpu.decoding.estimate", "perplexity"),
}


def __getattr__(name):
    """Lazy access to secondary subsystems without import-time cost."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'tone_tpu' has no attribute {name!r}")
