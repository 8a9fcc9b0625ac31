"""Full-loop integration: train from scratch on synthetic audio, deploy the
trained weights through the chunked streaming pipeline, require exact
transcription.  The strongest no-external-data proof that training numerics,
checkpoint threading, and streaming-state inference agree end-to-end."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


@pytest.mark.slow
def test_train_deploy_stream_exact():
    from train_tiny_e2e import run

    wer, hits, total = run(steps=150)
    assert wer < 0.05, wer
    assert hits >= total - 1, (hits, total)
