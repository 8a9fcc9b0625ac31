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


@pytest.mark.slow
def test_domain_adapt_example_end_to_end():
    """The full in-framework domain loop (train -> KN LM binary -> fused
    device decode with hotwords -> word times) produces exact transcripts
    on noisy audio; examples/domain_adapt.py raises SystemExit otherwise."""
    import domain_adapt

    old_argv = sys.argv
    sys.argv = ["domain_adapt", "--steps", "150"]
    try:
        domain_adapt.main()
    finally:
        sys.argv = old_argv


@pytest.mark.slow
def test_device_beam_agrees_with_host_on_trained_model():
    """Regression pin for the device-beam quality study
    (dev/beam_quality_sweep.py, docs/performance.md): on a trained model
    with noisy eval audio, the device search at its default width must
    agree with the reference-configuration host decode (width 200, full
    LM fusion) on >= 95% of utterances.  Measured agreement is 100%
    across every regime; 95% leaves headroom for seed drift."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "dev"))

    import jax
    import numpy as np

    from beam_quality_sweep import corpus_lm, utterance_logprobs
    from train_tiny_e2e import make_dataset, run_training

    from tone_tpu.decoder import BeamSearchCTCDecoder, DeviceBeamSearchCTCDecoder
    from tone_tpu.decoding.lm import ArpaLM
    cfg, _, state, _, _ = run_training(steps=80)
    model = {"params": jax.tree.map(np.asarray, state.params),
             "batch_stats": jax.tree.map(np.asarray, state.batch_stats)}
    arpa = ArpaLM(corpus_lm())
    host = BeamSearchCTCDecoder(arpa, beam_width=200)
    device = DeviceBeamSearchCTCDecoder(arpa, beam_width=32, nbest=8)

    rng = np.random.default_rng(3)
    items = make_dataset()
    evals = [utterance_logprobs(model, cfg, it["audio"], 0.3, rng)
             for it in items]
    dev_out = device.forward_batch(evals)
    host_out = [host.forward(lp) for lp in evals]
    agree = np.mean([d == h for d, h in zip(dev_out, host_out)])
    assert agree >= 0.95, (agree, list(zip(dev_out, host_out)))
