"""Pipeline tests: API contract, streaming/offline consistency, timestamps."""

import jax
import numpy as np
import pytest

from tone_tpu.acoustic import StreamingCTCModel
from tone_tpu.config import ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.decoder import GreedyCTCDecoder
from tone_tpu.pipeline import StreamingCTCPipeline, TextPhrase
from tone_tpu.splitter import StreamingLogprobSplitter


@pytest.fixture(scope="module")
def pipeline():
    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    model = StreamingCTCModel(variables, cfg)
    return StreamingCTCPipeline(model, StreamingLogprobSplitter(), GreedyCTCDecoder())


def test_forward_validation(pipeline):
    with pytest.raises(TypeError):
        pipeline.forward([0] * 2400)
    with pytest.raises(ValueError):
        pipeline.forward(np.zeros(100, np.int32))


@pytest.mark.slow
def test_streaming_api_and_finalize(pipeline):
    rng = np.random.default_rng(0)
    state = None
    all_phrases = []
    for _ in range(4):
        chunk = rng.integers(-20000, 20000, 2400).astype(np.int32)
        phrases, state = pipeline.forward(chunk, state)
        all_phrases.extend(phrases)
    phrases, state = pipeline.finalize(state)
    all_phrases.extend(phrases)
    assert all(isinstance(p, TextPhrase) for p in all_phrases)
    assert isinstance(state, tuple) and len(state) == 2


def test_offline_equals_streaming(pipeline):
    """forward_offline is defined as looped streaming — verify identical
    output through the public API."""
    rng = np.random.default_rng(1)
    audio = rng.integers(-20000, 20000, 2400 * 3 + 777).astype(np.int32)

    offline = pipeline.forward_offline(audio)

    padded = np.pad(audio, (pipeline.PADDING, pipeline.PADDING))
    padded = np.pad(padded, (0, -len(padded) % pipeline.CHUNK_SIZE))
    chunks = np.split(padded, len(padded) // pipeline.CHUNK_SIZE)
    state = None
    streamed = []
    for i, chunk in enumerate(chunks):
        out, state = pipeline.forward(chunk, state, is_last=i == len(chunks) - 1)
        streamed.extend(out)

    assert [(p.text, p.start_time, p.end_time) for p in offline] == \
           [(p.text, p.start_time, p.end_time) for p in streamed]


@pytest.mark.slow
def test_model_flat_state_api(pipeline):
    """Reference-compatible flat-state forward on the acoustic model."""
    model = pipeline.model
    chunk = np.zeros((2, 2400, 1), np.int32)
    lp, state = model.forward(chunk)
    assert lp.shape == (2, 10, 35)
    assert state.shape == (2, model.STATE_SIZE)
    assert state.dtype == np.float16
    lp2, state2 = model.forward(chunk, state)
    assert state2.shape == state.shape
    with pytest.raises(ValueError):
        model.forward(np.zeros((2, 100, 1), np.int32))
    with pytest.raises(ValueError):
        model.forward(chunk, state.astype(np.float32))


def test_public_api_surface():
    """The reference's public package surface must exist (tone/__init__.py:10-23)."""
    import tone_tpu

    for name in [
        "BeamSearchCTCDecoder", "DecoderType", "GreedyCTCDecoder",
        "LogprobPhrase", "StreamingCTCModel", "StreamingCTCPipeline",
        "StreamingLogprobSplitter", "TextPhrase", "read_audio",
        "read_stream_audio", "read_example_audio", "read_stream_example_audio",
    ]:
        assert hasattr(tone_tpu, name), name


@pytest.mark.slow
def test_from_local_torch_checkpoint(tmp_path, pipeline):
    """The artifact loop: export to the reference's torch naming, then build
    a pipeline from that file and get identical transcripts."""
    pytest.importorskip("safetensors")
    from tone_tpu.interop import save_torch_checkpoint

    cfg = pipeline.model.config
    save_torch_checkpoint(tmp_path / "model.safetensors",
                          pipeline.model.variables, cfg)
    from tone_tpu.decoder import DecoderType

    pipe2 = StreamingCTCPipeline.from_local(
        tmp_path, decoder_type=DecoderType.GREEDY, config=cfg)

    rng = np.random.default_rng(5)
    audio = rng.integers(-20000, 20000, 2400 * 2).astype(np.int32)
    a = pipeline.forward_offline(audio)
    b = pipe2.forward_offline(audio)
    assert [(p.text, p.start_time, p.end_time) for p in a] == \
           [(p.text, p.start_time, p.end_time) for p in b]
