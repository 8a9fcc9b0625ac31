"""Audio I/O tests: FLAC decode (CRC-verified), WAV, resampling, chunking."""

import wave
from pathlib import Path

import numpy as np
import pytest

from tone_tpu.audio import read_audio, read_example_audio, read_stream_example_audio
from tone_tpu.audio.flac import decode_flac, read_flac_info

FIXTURES = Path("/root/reference/tone/demo/audio_examples")


@pytest.mark.skipif(not FIXTURES.exists(), reason="example audio unavailable")
def test_flac_decode_fixtures_crc():
    for name in ("audio_short.flac", "audio_long.flac"):
        info = read_flac_info(FIXTURES / name)
        samples, sr = decode_flac(FIXTURES / name, verify_crc=True)
        assert sr == 8000
        assert samples.shape == (info.total_samples, 1)
        assert samples.min() >= -32768 and samples.max() <= 32767


@pytest.mark.skipif(not FIXTURES.exists(), reason="example audio unavailable")
def test_read_example_audio():
    audio = read_example_audio()
    assert audio.dtype == np.int32
    assert audio.ndim == 1
    assert len(audio) == 50880  # audio_short.flac STREAMINFO total


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


@pytest.mark.skipif(not FIXTURES.exists(), reason="example audio unavailable")
def test_stream_chunks():
    chunks = list(read_stream_example_audio())
    assert all(c.shape == (2400,) for c in chunks)
    assert all(c.dtype == np.int32 for c in chunks)
    total = 50880 + 2 * 2400
    assert len(chunks) == -(-total // 2400)
