"""Native (C++) decoding backends: KenLM-binary n-gram scorer + CTC beam search.

Built on demand via ``build_native()``; falls back to the pure-Python
implementations in tone_tpu.decoding when the toolchain is unavailable.
"""

from tone_tpu.decoding.kenlm_binary import KenLMBinary  # noqa: F401
from tone_tpu.decoding.native.beamsearch import (  # noqa: F401
    NativeLM,
    build_native,
    native_available,
    ctc_beam_search_native,
)
