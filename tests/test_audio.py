"""Audio I/O tests: bundled examples, FLAC encode/decode round-trip
(CRC-verified), WAV, resampling, chunking.  Self-contained — no external
audio assets (the examples are synthesized and baked on first use,
replacing the reference's recorded audio_examples,
reference tone/demo/read_audio.py:17-22)."""

import wave

import numpy as np
import pytest

from tone_tpu.audio import read_audio, read_example_audio, read_stream_example_audio
from tone_tpu.audio.examples import example_path, synthesize_speech_like
from tone_tpu.audio.flac import decode_flac, read_flac_info
from tone_tpu.audio.flac_write import encode_flac


def test_bundled_examples_decode_crc():
    for name in ("audio_short.flac", "audio_long.flac"):
        p = example_path(name)
        info = read_flac_info(p)
        samples, sr = decode_flac(p, verify_crc=True)
        assert sr == 8000
        assert samples.shape == (info.total_samples, 1)
        assert samples.min() >= -32768 and samples.max() <= 32767


def test_read_example_audio():
    audio = read_example_audio()
    assert audio.dtype == np.int32
    assert audio.ndim == 1
    assert 4 * 8000 < len(audio) < 10 * 8000  # a few seconds of speech-like audio
    long = read_example_audio(long_audio=True)
    assert len(long) > 50 * 8000


def test_example_audio_is_speech_shaped():
    """The synthetic examples must trip the splitter like real speech:
    non-trivial energy bursts separated by >600 ms silences."""
    audio = read_example_audio().astype(np.float64)
    frame = 400  # 50 ms
    energy = np.sqrt(np.mean(
        audio[: len(audio) // frame * frame].reshape(-1, frame) ** 2, axis=1))
    loud = energy > 0.1 * energy.max()
    assert loud.any() and (~loud).any()
    # at least one internal silence gap of >= 600 ms (12 frames)
    runs, run = [], 0
    for flag in loud:
        run = run + 1 if not flag else 0
        runs.append(run)
    assert max(runs) >= 12


def test_flac_encode_decode_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    for channels in (1, 2):
        pcm = rng.integers(-32768, 32768, (10000, channels)).astype(np.int16)
        p = tmp_path / f"rt{channels}.flac"
        encode_flac(p, pcm, 8000)
        decoded, sr = decode_flac(p, verify_crc=True)
        assert sr == 8000
        np.testing.assert_array_equal(decoded, pcm.astype(np.int64))


def test_flac_encoder_deterministic(tmp_path):
    a = synthesize_speech_like(0, (1.0,))
    p1, p2 = tmp_path / "a.flac", tmp_path / "b.flac"
    encode_flac(p1, a)
    encode_flac(p2, a)
    assert p1.read_bytes() == p2.read_bytes()


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(-30000, 30000, 8000).astype(np.int16)
    p = tmp_path / "test.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(data.tobytes())
    loaded = read_audio(p)
    np.testing.assert_array_equal(loaded, data.astype(np.int32))


def test_wav_resample_and_mixdown(tmp_path):
    """Stereo 16 kHz -> mono 8 kHz."""
    sr_in, n = 16000, 16000
    t = np.arange(n) / sr_in
    tone = (10000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    stereo = np.stack([tone, tone], axis=1)
    p = tmp_path / "stereo.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr_in)
        w.writeframes(stereo.tobytes())
    loaded = read_audio(p)
    assert abs(len(loaded) - 8000) <= 1
    # The 440 Hz tone must survive resampling (crude spectral check).
    spec = np.abs(np.fft.rfft(loaded.astype(np.float64)))
    freq = np.fft.rfftfreq(len(loaded), 1 / 8000)
    assert abs(freq[spec.argmax()] - 440) < 5


def test_stream_chunks():
    chunks = list(read_stream_example_audio())
    assert all(c.shape == (2400,) for c in chunks)
    assert all(c.dtype == np.int32 for c in chunks)
    total = len(read_example_audio()) + 2 * 2400
    assert len(chunks) == -(-total // 2400)
