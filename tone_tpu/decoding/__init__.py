"""CTC decoding backends: prefix beam search, n-gram LMs, native scorer."""

from tone_tpu.decoding.beam import ctc_beam_search
from tone_tpu.decoding.lm import ArpaLM, LanguageModel, load_lm

__all__ = ["ctc_beam_search", "ArpaLM", "LanguageModel", "load_lm"]
