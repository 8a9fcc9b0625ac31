"""Import shims that let the read-only torch reference (/root/reference) be
imported in this minimal environment for golden parity tests.

Only used by tests.  Stubs the third-party modules the reference imports at
package level but which are absent here (torchaudio, pyctcdecode,
onnxruntime, huggingface_hub).  The stubbed torchaudio provides the single
function the reference model actually uses (``melscale_fbanks``), backed by
our own numpy implementation — so fbank parity itself is asserted separately
against hard-coded golden values in test_frontend.py.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def install_reference(path: str = REFERENCE_PATH) -> bool:
    """Make ``import tone`` resolve to the reference repo. Returns False if
    the reference or torch is unavailable."""
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    import os

    if not os.path.isdir(os.path.join(path, "tone")):
        return False

    # Resolve transformers BEFORE installing stubs: its import machinery
    # probes for torchaudio/pyctcdecode and chokes on partially-stubbed
    # modules if they appear first.
    try:
        import transformers

        _ = transformers.PreTrainedModel
    except Exception:
        pass

    if "torchaudio" not in sys.modules:
        import torch

        from tone_tpu.config import FrontendConfig
        from tone_tpu.core.frontend import compute_mel_filterbanks

        ta = types.ModuleType("torchaudio")
        taf = types.ModuleType("torchaudio.functional")

        def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                            norm=None, mel_scale="htk"):
            assert norm == "slaney" and mel_scale == "slaney"
            fb = compute_mel_filterbanks(
                FrontendConfig(sample_rate=sample_rate, n_fft=(n_freqs - 1) * 2,
                               n_mels=n_mels))
            return torch.from_numpy(fb.copy())

        import importlib.machinery as _machinery

        taf.melscale_fbanks = melscale_fbanks
        ta.functional = taf
        ta.__spec__ = _machinery.ModuleSpec("torchaudio", loader=None, is_package=True)
        ta.__path__ = []
        taf.__spec__ = _machinery.ModuleSpec("torchaudio.functional", loader=None)
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = taf

    import importlib.machinery
    import importlib.util

    stubs = [
        ("pyctcdecode", {}),
        ("pyctcdecode.decoder", {"BeamSearchDecoderCTC": object, "build_ctcdecoder": lambda *a, **k: None}),
        ("onnxruntime", {"InferenceSession": object, "SessionOptions": object}),
        ("huggingface_hub", {"hf_hub_download": lambda *a, **k: None}),
    ]
    roots = {name.split(".")[0] for name, _ in stubs}
    installed_roots = set()
    for root in roots:
        if root in sys.modules:
            installed_roots.add(root)
            continue
        try:
            if importlib.util.find_spec(root) is not None:
                installed_roots.add(root)
        except (ImportError, ValueError):
            pass

    for name, attrs in stubs:
        if name.split(".")[0] in installed_roots or name in sys.modules:
            continue
        mod = types.ModuleType(name)
        is_pkg = any(other.startswith(name + ".") for other, _ in stubs)
        # Give stubs a real ModuleSpec so importlib.util.find_spec()
        # probes (e.g. transformers' _is_package_available) don't raise.
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None, is_package=is_pkg)
        if is_pkg:
            mod.__path__ = []
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        if "." in name:
            parent, _, child = name.rpartition(".")
            setattr(sys.modules[parent], child, mod)

    if path not in sys.path:
        sys.path.insert(0, path)
    return True
