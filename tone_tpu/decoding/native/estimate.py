"""ctypes front-end for the native LM estimator (tone_estimate.cpp).

Corpus file → ARPA file, fully native (tokenize, count, modified-KN
estimate, prune, write) — the scale path for the pure-Python estimator in
``tone_tpu/decoding/estimate.py`` (~8 s per 1M tokens there; the two are
fuzz-pinned to agree in tests/test_estimate.py).  Built on demand with the
system C++ toolchain, cached next to the source; callers fall back to the
Python estimator when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Sequence

_SRC = Path(__file__).parent / "src" / "tone_estimate.cpp"
_LIB = Path(__file__).parent / "src" / "libtone_estimate.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def build_native(force: bool = False) -> bool:
    """Compile the shared library if needed.  Returns availability."""
    global _build_failed
    with _lock:
        if _LIB.exists() and not force and (
                not _SRC.exists() or _LIB.stat().st_mtime >= _SRC.stat().st_mtime):
            return True
        if _build_failed and not force:
            return False
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 str(_SRC), "-o", str(_LIB)],
                check=True, capture_output=True, timeout=300)
            return True
        except (OSError, subprocess.SubprocessError):
            _build_failed = True
            return False


def native_available() -> bool:
    return _load() is not None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        return None
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(str(_LIB))
            lib.tone_estimate_arpa.restype = ctypes.c_longlong
            lib.tone_estimate_arpa.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ]
            _lib = lib
    return _lib


def estimate_arpa_native(corpus_path: str | Path, out_path: str | Path,
                         order: int = 3,
                         prune: Sequence[int] | None = None) -> int:
    """Estimate from a text corpus file (one sentence per line) and write a
    standard ARPA file.  Returns the total n-gram count written.

    Raises RuntimeError if the native library is unavailable; ValueError
    for corpus/argument errors (mirroring estimate_ngram_lm's messages).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native estimator unavailable (no C++ toolchain)")
    prune = list(prune or [])
    arr = (ctypes.c_longlong * max(len(prune), 1))(*(prune or [0]))
    err = ctypes.create_string_buffer(256)
    n = lib.tone_estimate_arpa(
        str(corpus_path).encode(), order, arr, len(prune),
        str(out_path).encode(), err, len(err))
    if n < 0:
        raise ValueError(err.value.decode(errors="replace"))
    return int(n)
