"""Tests for export (StableHLO AOT artifacts), torch interop, ops, eval, CLI."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import (
    apply_streaming,
    init_model_params,
    init_streaming_state,
)


@pytest.fixture(scope="module")
def cfg():
    return ToneConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def variables(cfg):
    return init_model_params(jax.random.PRNGKey(0), cfg)


@pytest.mark.slow
def test_export_streaming_roundtrip(tmp_path, cfg, variables):
    from tone_tpu.export import export_streaming, load_exported

    written = export_streaming(variables, cfg, [2], tmp_path)
    assert (tmp_path / "export_config.json").exists()
    fn = load_exported(written[0])

    chunk = np.random.default_rng(0).integers(-20000, 20000, (2, 2400)).astype(np.int32)
    state = init_streaming_state(cfg, 2)
    lp_direct, _ = apply_streaming(variables, cfg, jnp.asarray(chunk), state)
    lp_exported, _ = fn(variables, jnp.asarray(chunk), init_streaming_state(cfg, 2))
    np.testing.assert_allclose(np.asarray(lp_exported), np.asarray(lp_direct), atol=1e-5)


def test_torch_interop_roundtrip(cfg, variables):
    """to_torch_state_dict inverts convert_torch_state_dict exactly."""
    from tone_tpu.checkpoint import convert_torch_state_dict
    from tone_tpu.interop import to_torch_state_dict

    sd = to_torch_state_dict(variables, cfg)
    back = convert_torch_state_dict(sd, cfg)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_torch_interop_loads_into_reference(cfg, variables):
    """The exported state_dict must load into the real reference module."""
    from _reference_compat import install_reference

    if not install_reference():
        pytest.skip("torch reference unavailable")
    import torch

    from tone.nn.model import Tone
    from tone.training.model_wrapper import ToneConfig as RefConfig

    from tone_tpu.interop import to_torch_state_dict

    ref_cfg = RefConfig()
    ref = Tone(ref_cfg.feature_extraction_params, ref_cfg.encoder_params,
               ref_cfg.decoder_params)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_torch_state_dict(variables, cfg).items()}
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # only non-persistent buffers (frontend basis) may be missing
    assert all("forward_basis" in k or "filterbanks" in k for k in missing), missing

    # and produce the same logprobs as the jax model
    from tone_tpu.core.model import apply_offline

    audio = np.random.default_rng(1).integers(-20000, 20000, (1, 4800)).astype(np.int32)
    with torch.no_grad():
        lp_ref, _ = ref.eval()(torch.from_numpy(audio).float() / 32767.0,
                               torch.tensor([4800]))
    lp_jax, _, _ = apply_offline(variables, cfg, jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(lp_jax), lp_ref.numpy(), atol=1e-4)


def test_batched_greedy_matches_host_decoder(cfg, variables):
    from tone_tpu.decoder import GreedyCTCDecoder
    from tone_tpu.ops.greedy import batched_greedy_decode

    rng = np.random.default_rng(0)
    lp = rng.normal(-2, 1.5, (3, 40, 35)).astype(np.float32)
    lp -= np.log(np.exp(lp).sum(-1, keepdims=True))
    host = [GreedyCTCDecoder().forward(row) for row in lp]
    dev = batched_greedy_decode(lp)
    assert host == dev


@pytest.mark.slow
def test_chunk_duration_variants(cfg, variables):
    """400 ms (13 model frames) and 600 ms (20 frames) streaming variants."""
    for ms, expect_frames in ((400, 13), (600, 20)):
        c = cfg.with_chunk_duration_ms(ms)
        assert c.audio_chunk_samples == ms * 8
        assert c.encoder.chunk_size == expect_frames
        state = init_streaming_state(c, 1)
        chunk = jnp.zeros((1, c.audio_chunk_samples), jnp.int32)
        lp, state2 = apply_streaming(variables, c, chunk, state)
        assert lp.shape == (1, expect_frames, 35)
        # second step exercises the carried state path
        lp, _ = apply_streaming(variables, c, chunk, state2)
        assert np.isfinite(np.asarray(lp)).all()


def test_eval_pipeline_manifest(tmp_path, cfg, variables):
    import wave

    from tone_tpu.acoustic import StreamingCTCModel
    from tone_tpu.decoder import GreedyCTCDecoder
    from tone_tpu.eval import evaluate_pipeline
    from tone_tpu.pipeline import StreamingCTCPipeline
    from tone_tpu.splitter import StreamingLogprobSplitter

    rng = np.random.default_rng(0)
    manifest = tmp_path / "manifest.jsonl"
    lines = []
    for i in range(2):
        wav_path = tmp_path / f"a{i}.wav"
        data = rng.integers(-20000, 20000, 4000).astype(np.int16)
        with wave.open(str(wav_path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(data.tobytes())
        lines.append(json.dumps({"audio_filepath": str(wav_path), "text": "да"}))
    manifest.write_text("\n".join(lines))

    pipe = StreamingCTCPipeline(
        StreamingCTCModel(variables, cfg), StreamingLogprobSplitter(), GreedyCTCDecoder())
    result = evaluate_pipeline(pipe, manifest)
    assert result.n_utterances == 2
    assert result.audio_seconds == pytest.approx(1.0)
    assert 0 <= result.wer < 50  # random weights: garbage but finite


@pytest.mark.slow
def test_cli_transcribe_smoke(tmp_path):
    import wave

    wav_path = tmp_path / "x.wav"
    data = np.random.default_rng(0).integers(-15000, 15000, 8000).astype(np.int16)
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(data.tobytes())
    out = subprocess.run(
        [sys.executable, "-m", "tone_tpu", "transcribe", str(wav_path), "--json"],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
             "JAX_PLATFORMS": "cpu", "TONE_TPU_FORCE_CPU": "1"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["file"] == str(wav_path)
    assert isinstance(payload["phrases"], list)


@pytest.mark.slow
def test_nemo_archive_roundtrip(tmp_path):
    """save_nemo_archive writes the reference .nemo layout (gzipped tar with
    ./model_config.yaml + ./model_weights.ckpt under the tone_for_ctc.tone.
    prefix, tone/nemo_wrapper.py:15 / export.py:528-549) and loads back to
    the exact same pytree + config."""
    import tarfile

    import jax
    import yaml

    from tone_tpu.config import EncoderConfig, ToneConfig
    from tone_tpu.core.model import init_model_params
    from tone_tpu.interop import load_nemo_archive, save_nemo_archive

    enc = EncoderConfig(
        n_layers=2, d_model=64, n_heads=4, rope_dim=16, ff_expansion_factor=2,
        conv_kernel_size=7, subsampling_conv_channels=(4, 8),
        mhsa_stateless_layers=1, reduction_position=0, upsample_position=1,
        should_recompute_att_scores=(True, True))
    cfg = ToneConfig(encoder=enc, compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    path = tmp_path / "model.nemo"
    save_nemo_archive(path, variables, cfg)

    with tarfile.open(path, "r:gz") as tar:
        names = [m.name for m in tar.getmembers()]
        assert "./model_config.yaml" in names
        assert "./model_weights.ckpt" in names
        meta = yaml.safe_load(tar.extractfile("./model_config.yaml").read())
    assert meta["target"] == "tone.nemo_wrapper.ToneCTCNemoModel"
    assert meta["decoding"] == {"strategy": "greedy"}
    assert meta["tone_config"]["encoder_params"]["n_layers"] == 2
    assert len(meta["tone_config"]["decoder_params"]["vocabulary"]) == 34

    loaded, loaded_cfg = load_nemo_archive(path)
    assert loaded_cfg.encoder == cfg.encoder
    assert loaded_cfg.labels == cfg.labels
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x, np.float32), np.asarray(y, np.float32))


@pytest.mark.slow
def test_nemo_state_dict_loads_into_reference(tmp_path):
    """The .nemo weights member load_state_dict's cleanly into the real
    reference ToneForCTC after the wrapper prefix (strict=True)."""
    import io
    import tarfile

    import jax
    import torch

    from tone_tpu.config import ToneConfig
    from tone_tpu.core.model import init_model_params
    from tone_tpu.interop import save_nemo_archive
    from tone.training.model_wrapper import ToneConfig as RefConfig, ToneForCTC

    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(1), cfg)
    path = tmp_path / "model.nemo"
    save_nemo_archive(path, variables, cfg)

    with tarfile.open(path, "r:gz") as tar:
        raw = tar.extractfile("./model_weights.ckpt").read()
    sd = torch.load(io.BytesIO(raw), map_location="cpu", weights_only=True)
    stripped = {k.removeprefix("tone_for_ctc."): v for k, v in sd.items()}
    ref = ToneForCTC(RefConfig())
    missing, unexpected = ref.load_state_dict(stripped, strict=False)
    assert not unexpected, unexpected
    # only torch's BN bookkeeping counters may be absent
    assert all(k.endswith("num_batches_tracked") for k in missing), missing
