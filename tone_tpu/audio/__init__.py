"""Audio decode / streaming utilities."""

from tone_tpu.audio.io import (
    read_audio,
    read_example_audio,
    read_stream_audio,
    read_stream_example_audio,
)

__all__ = [
    "read_audio",
    "read_example_audio",
    "read_stream_audio",
    "read_stream_example_audio",
]
