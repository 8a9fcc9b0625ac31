"""KenLM binary-format n-gram model reader (native scorer front-end).

Placeholder until the native scorer lands: loading a KenLM ``.bin`` raises
with guidance to use ARPA text (fully supported by tone_tpu.decoding.lm).
"""

from __future__ import annotations

from pathlib import Path

from tone_tpu.decoding.lm import LanguageModel


class KenLMBinary(LanguageModel):
    def __init__(self, path: str | Path):
        raise NotImplementedError(
            "KenLM binary models are not supported yet; convert the model to "
            "ARPA text (kenlm's `query -b` or `build_binary -a`) and load the "
            ".arpa/.arpa.gz file instead.")
