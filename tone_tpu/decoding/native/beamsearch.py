"""ctypes front-end for the C++ CTC beam-search decoder (built on demand)."""

from __future__ import annotations


def native_available() -> bool:
    return False


def build_native() -> bool:
    return False


def ctc_beam_search_native(*args, **kwargs):
    raise NotImplementedError("native beam search not built")
