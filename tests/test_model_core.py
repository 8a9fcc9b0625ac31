"""Core model tests: shapes, streaming/offline self-consistency, state packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import (
    apply_offline,
    apply_streaming,
    init_model_params,
    init_streaming_state,
    pack_state,
    unpack_state,
)


@pytest.fixture(scope="module")
def cfg():
    return ToneConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def variables(cfg):
    return init_model_params(jax.random.PRNGKey(0), cfg)


def test_param_count(cfg, variables):
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # Reference is "T-one (71M)" (README.md:150).
    assert 70e6 < n < 73e6


def test_flat_state_size(cfg):
    # Reference STATE_SIZE (tone/onnx_wrapper.py:34).
    assert cfg.flat_state_size == 219729


@pytest.mark.slow
def test_streaming_shapes(cfg, variables):
    b = 3
    state = init_streaming_state(cfg, b)
    chunk = jnp.zeros((b, cfg.audio_chunk_samples), jnp.int32)
    lp, state2 = apply_streaming(variables, cfg, chunk, state)
    assert lp.shape == (b, cfg.encoder.chunk_size, cfg.vocab_size_with_blank)
    assert lp.dtype == jnp.float32
    # logprobs normalized
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-5)
    # state pytree shape-stable
    assert jax.tree.map(jnp.shape, state) == jax.tree.map(jnp.shape, state2)


@pytest.mark.slow
def test_streaming_equals_offline(cfg, variables):
    """The central contract: chunked streaming with carried state must equal
    the offline forward with chunk-simulating masks (the reference's design
    invariant, conformer_blocks.py:302-349)."""
    b, n_chunks = 2, 6
    rng = np.random.default_rng(0)
    audio = rng.integers(-20000, 20000, (b, cfg.audio_chunk_samples * n_chunks)).astype(np.int32)

    lp_off, _, _ = apply_offline(variables, cfg, jnp.asarray(audio))

    state = init_streaming_state(cfg, b)
    outs = []
    for i in range(n_chunks):
        sl = audio[:, i * cfg.audio_chunk_samples:(i + 1) * cfg.audio_chunk_samples]
        lp, state = apply_streaming(variables, cfg, jnp.asarray(sl), state)
        outs.append(np.asarray(lp))
    lp_str = np.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(lp_off), lp_str, atol=1e-4)


@pytest.mark.slow
def test_streaming_batch_independence(cfg, variables):
    """Streams in a batch must not interact (state is strictly per-row)."""
    rng = np.random.default_rng(1)
    a = rng.integers(-20000, 20000, (1, cfg.audio_chunk_samples)).astype(np.int32)
    b = rng.integers(-20000, 20000, (1, cfg.audio_chunk_samples)).astype(np.int32)
    both = np.concatenate([a, b], axis=0)

    lp_single, _ = apply_streaming(variables, cfg, jnp.asarray(a), init_streaming_state(cfg, 1))
    lp_both, _ = apply_streaming(variables, cfg, jnp.asarray(both), init_streaming_state(cfg, 2))
    np.testing.assert_allclose(np.asarray(lp_single)[0], np.asarray(lp_both)[0], atol=1e-5)


def test_state_pack_roundtrip(cfg, variables):
    b = 2
    state = init_streaming_state(cfg, b)
    chunk = jnp.asarray(
        np.random.default_rng(2).integers(-20000, 20000, (b, cfg.audio_chunk_samples)),
        jnp.int32,
    )
    lp1, state1 = apply_streaming(variables, cfg, chunk, state)

    flat = pack_state(state1, cfg)
    assert flat.shape == (b, cfg.flat_state_size)
    assert flat.dtype == np.float16
    state1b = unpack_state(flat, cfg)

    # One more step from the packed/unpacked state should match (fp16 pack
    # tolerance on the state values).
    lp2a, _ = apply_streaming(variables, cfg, chunk, state1)
    lp2b, _ = apply_streaming(variables, cfg, chunk, state1b)
    np.testing.assert_allclose(np.asarray(lp2a), np.asarray(lp2b), atol=5e-2)


@pytest.mark.slow
def test_offline_lengths(cfg, variables):
    b = 2
    audio = np.zeros((b, cfg.audio_chunk_samples * 4), np.int32)
    lens = jnp.asarray([cfg.audio_chunk_samples * 4, cfg.audio_chunk_samples * 2])
    lp, out_len, _ = apply_offline(variables, cfg, jnp.asarray(audio), lens)
    assert lp.shape[1] == 40
    np.testing.assert_array_equal(np.asarray(out_len), [40, 20])


@pytest.mark.slow
def test_bfloat16_close_to_fp32(variables, cfg):
    """bf16 compute path stays close to fp32 in logprob space."""
    cfg16 = ToneConfig(compute_dtype="bfloat16")
    b = 1
    audio = np.random.default_rng(3).integers(-20000, 20000, (b, 4800)).astype(np.int32)
    lp32, _, _ = apply_offline(variables, cfg, jnp.asarray(audio))
    lp16, _, _ = apply_offline(variables, cfg16, jnp.asarray(audio))
    # logprobs of the dominant classes should agree to ~1e-1 in log space
    assert np.abs(np.asarray(lp32) - np.asarray(lp16)).mean() < 0.15
