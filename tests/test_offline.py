"""Batched offline transcriber: parity with the streaming pipeline."""

import jax
import numpy as np
import pytest

from tone_tpu.acoustic import StreamingCTCModel
from tone_tpu.config import ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.decoder import GreedyCTCDecoder
from tone_tpu.offline import OfflineTranscriber
from tone_tpu.pipeline import StreamingCTCPipeline
from tone_tpu.splitter import StreamingLogprobSplitter


@pytest.fixture(scope="module")
def cfg():
    return ToneConfig(compute_dtype="float32")


def test_offline_forward_matches_chunk_scan_tiny():
    """``use_offline_forward`` (full-sequence blocked-attention graph) and the
    default streaming chunk scan are interchangeable: same transcripts and
    timestamps on mixed-length utterances."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    tiny = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(2), tiny)
    rng = np.random.default_rng(2)
    audios = [rng.integers(-20000, 20000, n).astype(np.int32)
              for n in (5000, 2400 * 3, 1200, 2400 * 2 + 7)]

    scan = OfflineTranscriber(variables, tiny, batch_size=2).transcribe(audios)
    full = OfflineTranscriber(variables, tiny, batch_size=2,
                              use_offline_forward=True).transcribe(audios)
    assert [[(p.text, p.start_time, p.end_time) for p in u] for u in scan] == \
        [[(p.text, p.start_time, p.end_time) for p in u] for u in full]


def test_mesh_sharded_bulk_matches_single_device():
    """Data-parallel bulk transcription over a 4-device mesh produces the
    same transcripts as the unsharded transcriber, including a final batch
    that needs zero-row padding to stay shard-even."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    from tone_tpu.parallel.mesh import make_mesh

    tiny = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(3), tiny)
    rng = np.random.default_rng(3)
    audios = [rng.integers(-20000, 20000, n).astype(np.int32)
              for n in (5000, 2400 * 3, 1200, 2400 * 2 + 7, 3100)]

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    sharded = OfflineTranscriber(variables, tiny, batch_size=4,
                                 mesh=mesh).transcribe(audios)
    plain = OfflineTranscriber(variables, tiny, batch_size=4).transcribe(audios)
    assert [[(p.text, p.start_time, p.end_time) for p in u] for u in sharded] == \
        [[(p.text, p.start_time, p.end_time) for p in u] for u in plain]

    with pytest.raises(ValueError, match="multiple"):
        OfflineTranscriber(variables, tiny, batch_size=3, mesh=mesh)


@pytest.fixture(scope="module")
def variables(cfg):
    return init_model_params(jax.random.PRNGKey(0), cfg)


@pytest.mark.slow
def test_batched_offline_matches_pipeline(cfg, variables):
    """Same transcripts as the looped-streaming pipeline for mixed-length
    utterances, in input order despite internal length bucketing."""
    rng = np.random.default_rng(0)
    audios = [rng.integers(-20000, 20000, n).astype(np.int32)
              for n in (5000, 2400 * 3, 1200, 2400 * 2 + 7)]

    pipe = StreamingCTCPipeline(
        StreamingCTCModel(variables, cfg), StreamingLogprobSplitter(), GreedyCTCDecoder())
    expected = [pipe.forward_offline(a) for a in audios]

    transcriber = OfflineTranscriber(variables, cfg, batch_size=2)
    got = transcriber.transcribe(audios)

    assert len(got) == len(expected)
    for exp, g in zip(expected, got):
        assert [p.text for p in g] == [p.text for p in exp]
        # The pipeline pads the tail to a chunk multiple; under random
        # weights those extra zero-audio frames can classify as "speech" and
        # extend the final phrase by up to one chunk (0.3 s).  Real weights
        # classify silence correctly; here we allow that one-chunk slack.
        for pe, pg in zip(exp, g):
            assert abs(pe.start_time - pg.start_time) < 0.05
            assert abs(pe.end_time - pg.end_time) <= 0.31


@pytest.mark.slow
def test_batched_offline_with_device_beam_decoder(cfg, variables):
    """forward_batch decoding (one device call for all phrases of a batch)
    produces the same phrases as per-phrase forward of the same decoder."""
    from tone_tpu.decoder import DeviceBeamSearchCTCDecoder

    rng = np.random.default_rng(1)
    audios = [rng.integers(-20000, 20000, n).astype(np.int32)
              for n in (5000, 2400 * 2, 1700)]

    dec = DeviceBeamSearchCTCDecoder(None, beam_width=8, nbest=4)
    got = OfflineTranscriber(variables, cfg, decoder=dec,
                             batch_size=2).transcribe(audios)

    class NoBatch:
        forward = dec.forward

    want = OfflineTranscriber(variables, cfg, decoder=NoBatch(),
                              batch_size=2).transcribe(audios)
    assert [[p.text for p in u] for u in got] == \
        [[p.text for p in u] for u in want]
