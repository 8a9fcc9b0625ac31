"""Log-mel filterbank frontend as a matmul-STFT — MXU-friendly by construction.

Semantics match the reference ``FilterbankFeatures`` (tone/nn/modules/feats.py):
the STFT is expressed as a single strided matmul against a precomputed
"forward basis" (windowed + pre-emphasized DFT matrix), followed by
power-spectrum, slaney mel filterbank matmul, and log.  The reference chose
this formulation to be ONNX/TensorRT-exportable; on TPU it is exactly the
right shape for the MXU: one (frames, 160) @ (160, 162) matmul plus one
(frames, 81) @ (81, 64) matmul, both fused by XLA with the surrounding
elementwise ops.

All basis/filterbank constants are computed in float64 numpy at init and
closed over as small (<110 KB) jit constants.

Layout note: this module returns features time-major ``(B, T, n_mels)``
(the reference returns ``(B, n_mels, T)`` and immediately transposes in the
encoder — we skip the round-trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import FrontendConfig

__all__ = [
    "compute_forward_basis",
    "compute_mel_filterbanks",
    "FrontendConstants",
    "log_mel_offline",
    "log_mel_streaming",
]


def _hann_window(win_length: int) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, matching torch.hann_window."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / (win_length - 1)))


def compute_forward_basis(config: FrontendConfig) -> np.ndarray:
    """Windowed + pre-emphasized DFT matrix, shape (win_length, 2 * n_freqs).

    Equivalent to the reference's ``_compute_forward_basis``
    (tone/nn/modules/feats.py:67-80) but laid out for a right-matmul:
    ``spectrum[b, t, o] = sum_k frames[b, t, k] * basis[k, o]``.
    """
    n_fft = config.n_fft
    window = _hann_window(config.win_length)
    fourier = np.fft.fft(np.eye(n_fft, dtype=np.float64))
    fourier = fourier[: n_fft // 2 + 1]
    # (2 * n_freqs, n_fft): real rows then imaginary rows.
    basis = np.concatenate([fourier.real, fourier.imag], axis=0)
    # (n_fft, 2 * n_freqs), windowed along the time-in-window axis.
    basis = basis.T * window[:, None]

    coeff = config.preemphasis_coefficient
    if coeff != 0.0:
        # y[t] = x[t] - coeff * x[t + 1] applied inside the window, with the
        # first tap also attenuated: P = I - coeff * superdiag; P[0,0] -= coeff.
        pre = np.eye(config.win_length, dtype=np.float64)
        pre -= coeff * np.diag(np.ones(config.win_length - 1, dtype=np.float64), k=1)
        pre[0, 0] -= coeff
        basis = pre @ basis

    return np.ascontiguousarray(basis, dtype=np.float32)


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mels = freq / f_sp
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = f_sp * mels
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def compute_mel_filterbanks(config: FrontendConfig) -> np.ndarray:
    """Slaney-scale, slaney-normalized mel filterbank, shape (n_freqs, n_mels).

    Matches ``torchaudio.functional.melscale_fbanks(norm="slaney",
    mel_scale="slaney")`` as used by the reference (feats.py:83-93).
    """
    n_freqs = config.n_freqs
    all_freqs = np.linspace(0.0, config.sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_slaney(np.array(0.0))
    m_max = _hz_to_mel_slaney(np.array(config.sample_rate / 2.0))
    m_pts = np.linspace(float(m_min), float(m_max), config.n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # Slaney area normalization.
    enorm = 2.0 / (f_pts[2 : config.n_mels + 2] - f_pts[: config.n_mels])
    fb = fb * enorm[None, :]
    return np.ascontiguousarray(fb, dtype=np.float32)


class FrontendConstants:
    """Precomputed, non-trainable frontend tensors.

    Held as numpy arrays (not jnp) so a cached instance is safe to embed as a
    constant in any number of independent jit traces — jnp arrays created
    inside a trace are tracers and would leak across traces.
    """

    def __init__(self, config: FrontendConfig):
        self.config = config
        self.forward_basis = compute_forward_basis(config)  # (160, 162) np
        self.filterbanks = compute_mel_filterbanks(config)  # (81, 64) np


def _frame(waveform: jnp.ndarray, win_length: int, hop_length: int) -> jnp.ndarray:
    """(B, T_samples) -> (B, n_frames, win_length) overlapping frames."""
    n_frames = (waveform.shape[-1] - win_length) // hop_length + 1
    starts = np.arange(n_frames) * hop_length
    # Gather frames via a strided reshape trick: build index matrix once
    # (static), let XLA lower to an efficient gather / reshape.
    idx = starts[:, None] + np.arange(win_length)[None, :]
    return waveform[:, idx]


def _log_mel_from_frames(frames: jnp.ndarray, constants: FrontendConstants) -> jnp.ndarray:
    cfg = constants.config
    frames = frames.astype(jnp.float32)
    # (B, T, win) @ (win, 2 * n_freqs) -> (B, T, 2 * n_freqs)
    spectrum = jnp.einsum(
        "btk,ko->bto", frames, constants.forward_basis,
        preferred_element_type=jnp.float32,
    )
    b, t, _ = spectrum.shape
    spectrum = spectrum.reshape(b, t, 2, cfg.n_freqs)
    power = jnp.sum(jnp.square(spectrum), axis=2)  # (B, T, n_freqs)
    mel = jnp.einsum(
        "btf,fm->btm", power, constants.filterbanks,
        preferred_element_type=jnp.float32,
    )
    return jnp.log(mel + cfg.log_zero_guard_value)


def log_mel_offline(
    waveform: jnp.ndarray,
    waveform_lens: jnp.ndarray | None,
    constants: FrontendConstants,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Offline features for a padded batch.

    Mirrors reference ``FilterbankFeatures.forward`` (feats.py:104-116):
    left-pads by ``state_size`` (80) zeros so that offline output aligns with
    the streaming path's zero-initialized carry state.

    Args:
        waveform: float32 waveform in [-1, 1], shape (B, T_samples).
        waveform_lens: optional lengths in samples, shape (B,).

    Returns:
        (features (B, T_frames, n_mels) float32, frame lengths (B,) or None).
    """
    cfg = constants.config
    waveform = jnp.pad(waveform, ((0, 0), (cfg.state_size, 0)))
    frames = _frame(waveform, cfg.win_length, cfg.hop_length)
    feats = _log_mel_from_frames(frames, constants)
    lens = None if waveform_lens is None else waveform_lens // cfg.hop_length
    return feats, lens


def log_mel_streaming(
    waveform: jnp.ndarray,
    state: jnp.ndarray,
    constants: FrontendConstants,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming features for one chunk with an 80-sample carry state.

    Mirrors reference ``FilterbankFeatures.forward_streaming``
    (feats.py:118-133).

    Args:
        waveform: float32 chunk in [-1, 1], shape (B, chunk_samples).
        state: carry of the previous chunk's last ``state_size`` samples,
            shape (B, state_size).

    Returns:
        (features (B, chunk_frames, n_mels) float32, next state).
    """
    cfg = constants.config
    waveform = jnp.concatenate([state.astype(waveform.dtype), waveform], axis=1)
    state_next = waveform[:, -cfg.state_size:]
    frames = _frame(waveform, cfg.win_length, cfg.hop_length)
    return _log_mel_from_frames(frames, constants), state_next


@functools.lru_cache(maxsize=4)
def get_frontend_constants(config: FrontendConfig) -> FrontendConstants:
    return FrontendConstants(config)
