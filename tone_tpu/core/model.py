"""The full T-one TPU acoustic model: frontend + Conformer encoder + CTC head.

Two pure entry points mirroring the reference ``Tone`` module
(tone/nn/model.py:61 offline / :101 streaming-for-export):

* ``apply_offline(variables, audio, lengths)``  — full-sequence forward with
  chunk-simulating masks (training / evaluation).
* ``apply_streaming(variables, audio_chunk, state)`` — one 300 ms chunk with
  explicit recurrent state in, state out.  Static shapes; jit once, run
  forever.

State is an explicit pytree (``StreamingState``) — the reference's 7 coupled
cache tensors plus the preprocessor carry — and can be flattened to the
reference-compatible ``(B, 219729)`` fp16 blob via ``pack_state`` /
``unpack_state`` (layout documented there).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import ToneConfig
from tone_tpu.core import layers as L
from tone_tpu.core.encoder import (
    EncoderStreamState,
    encoder_offline,
    encoder_streaming_step,
    init_encoder_params,
    init_encoder_state,
)
from tone_tpu.core.frontend import (
    FrontendConstants,
    get_frontend_constants,
    log_mel_offline,
    log_mel_streaming,
)

Params = L.Params

INT16_MAX = 32767.0


@flax.struct.dataclass
class StreamingState:
    """Full per-stream recurrent state: preprocessor carry + encoder state."""

    preproc: jnp.ndarray  # (B, frontend.state_size)
    encoder: EncoderStreamState


def init_model_params(key, config: ToneConfig) -> dict[str, Params]:
    """Initialize all model variables: {"params": ..., "batch_stats": ...}."""
    k_enc, k_head = jax.random.split(key)
    enc_params, enc_stats = init_encoder_params(k_enc, config.encoder)
    head = L.init_linear(k_head, config.encoder.d_model, config.vocab_size_with_blank)
    return {
        "params": {"encoder": enc_params, "head": head},
        "batch_stats": enc_stats,
    }


def init_streaming_state(config: ToneConfig, batch_size: int, dtype=None) -> StreamingState:
    if dtype is None:
        dtype = jnp.dtype(config.resolved_state_dtype)
    return StreamingState(
        preproc=jnp.zeros((batch_size, config.frontend.state_size), dtype),
        encoder=init_encoder_state(config.encoder, batch_size, dtype),
    )


def _head(params: Params, encoded: jnp.ndarray) -> jnp.ndarray:
    """1x1-conv CTC head + fp32 log-softmax (reference ConvASRDecoder,
    tone/nn/modules/conformer.py:313-354)."""
    logits = L.linear(params, encoded, jnp.float32)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def apply_streaming(
    variables: dict[str, Params],
    config: ToneConfig,
    audio_chunk: jnp.ndarray,
    state: StreamingState,
    constants: FrontendConstants | None = None,
) -> tuple[jnp.ndarray, StreamingState]:
    """One streaming step on a 300 ms chunk.

    Mirrors reference ``Tone.forward_for_export`` (tone/nn/model.py:101-206).

    Args:
        audio_chunk: (B, chunk_samples) int32 (or float) raw audio in
            int16 range; scaled by 1/32767 like the reference (model.py:164-165).
        state: previous ``StreamingState`` (zeros for a new stream).

    Returns:
        (logprobs (B, chunk_size, vocab+1) float32, next state).
    """
    if constants is None:
        constants = get_frontend_constants(config.frontend)
    dtype = jnp.dtype(config.compute_dtype)

    wav = audio_chunk.astype(jnp.float32) / INT16_MAX
    preproc = state.preproc.astype(jnp.float32)
    if config.emulate_reference_fp16:
        # The reference's streaming entry quantizes the normalized waveform
        # (and hence the 80-sample carry) to fp16 (tone/nn/model.py:164-165).
        wav = wav.astype(jnp.float16).astype(jnp.float32)
        preproc = preproc.astype(jnp.float16).astype(jnp.float32)
    feats, preproc_next = log_mel_streaming(wav, preproc, constants)

    encoded, enc_state = encoder_streaming_step(
        variables["params"]["encoder"], variables["batch_stats"], config.encoder,
        feats, state.encoder, dtype,
    )
    logprobs = _head(variables["params"]["head"], encoded)
    new_state = StreamingState(preproc=preproc_next.astype(state.preproc.dtype), encoder=enc_state)
    return logprobs, new_state


def apply_offline(
    variables: dict[str, Params],
    config: ToneConfig,
    audio: jnp.ndarray,
    lengths: jnp.ndarray | None = None,
    constants: FrontendConstants | None = None,
    rng=None,
    training: bool = False,
    blocked_attention: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, dict[str, Params]]:
    """Full-sequence forward (training path).

    Mirrors reference ``Tone.forward`` (tone/nn/model.py:61-99).

    Args:
        audio: (B, T_samples) raw waveform. int dtype => int16 range
            (scaled by 1/32767); float dtype => already in [-1, 1].
        lengths: (B,) valid sample counts, or None.

    Returns:
        (logprobs (B, T_frames_out, vocab+1) fp32, output lengths (B,),
         updated batch_stats).
    """
    if constants is None:
        constants = get_frontend_constants(config.frontend)
    dtype = jnp.dtype(config.compute_dtype)

    if jnp.issubdtype(audio.dtype, jnp.integer):
        wav = audio.astype(jnp.float32) / INT16_MAX
    else:
        wav = audio.astype(jnp.float32)
    feats, feat_lens = log_mel_offline(wav, lengths, constants)

    encoded, out_len, new_stats = encoder_offline(
        variables["params"]["encoder"], variables["batch_stats"], config.encoder,
        feats, feat_lens, dtype, rng=rng, training=training,
        blocked_attention=blocked_attention,
    )
    logprobs = _head(variables["params"]["head"], encoded)
    return logprobs, out_len, new_stats


# ---------------------------------------------------------------------------
# Flat fp16 state packing (reference-compatible 219,729-element blob).
# ---------------------------------------------------------------------------
#
# The published reference ONNX model threads a single flat (B, 219729) fp16
# state (tone/onnx_wrapper.py:34).  We use the same total size with a
# documented layout (per batch row, concatenated in this order):
#
#   [0]      preproc carry        (80,)            = 80
#   [1]      mhsa windows         (2, 30, 384)     = 23,040
#   [2]      conv states          (16, 384, 30)    = 184,320
#   [3]      mhsa_len             (1,)             = 1
#   [4]      subsampling tail 1   (1, 10, 64)      = 640
#   [5]      subsampling tail 2   (32, 8, 44)      = 11,264
#   [6]      reduction tail       (384, 1)         = 384
#                                            total = 219,729


def _state_layout(config: ToneConfig) -> list[tuple[str, tuple[int, ...]]]:
    e, f = config.encoder, config.frontend
    sub_h = e.subsampling_hidden_features
    sub_lens = e.subsampling_state_lens
    return [
        ("preproc", (f.state_size,)),
        ("mhsa", (e.n_stateful_mhsa_layers, e.mhsa_state_size, e.d_model)),
        ("conv", (e.n_layers, e.d_model, e.conv_state_size)),
        ("mhsa_len", (1,)),
        ("sub1", (1, sub_lens[0], e.feat_in)),
        ("sub2", (e.subsampling_conv_channels[0], sub_lens[1], sub_h[0])),
        ("reduction", (e.d_model, e.reduction_state_size)),
    ]


def pack_state(state: StreamingState, config: ToneConfig) -> np.ndarray:
    """Flatten a ``StreamingState`` into the (B, 219729) fp16 blob."""
    b = state.preproc.shape[0]
    fields = {
        "preproc": np.asarray(state.preproc),
        # stored (N, B, ...) internally -> (B, N, ...) in the blob; conv and
        # reduction are stored time-major internally -> channel-major blob
        "mhsa": np.transpose(np.asarray(state.encoder.mhsa), (1, 0, 2, 3)),
        "conv": np.transpose(np.asarray(state.encoder.conv), (1, 0, 3, 2)),
        "mhsa_len": np.asarray(state.encoder.mhsa_len)[:, None].astype(np.float16),
        "sub1": np.asarray(state.encoder.sub1),
        "sub2": np.asarray(state.encoder.sub2),
        "reduction": np.transpose(np.asarray(state.encoder.reduction), (0, 2, 1)),
    }
    parts = [fields[name].reshape(b, -1).astype(np.float16) for name, _ in _state_layout(config)]
    packed = np.concatenate(parts, axis=1)
    assert packed.shape[1] == config.flat_state_size, packed.shape
    return packed


def unpack_state(flat: np.ndarray, config: ToneConfig, dtype=jnp.float32) -> StreamingState:
    """Inverse of :func:`pack_state`."""
    b = flat.shape[0]
    assert flat.shape == (b, config.flat_state_size), flat.shape
    out = {}
    offset = 0
    for name, shape in _state_layout(config):
        n = int(np.prod(shape))
        out[name] = flat[:, offset:offset + n].reshape(b, *shape)
        offset += n
    enc = EncoderStreamState(
        sub1=jnp.asarray(out["sub1"], dtype),
        sub2=jnp.asarray(out["sub2"], dtype),
        mhsa=jnp.asarray(np.transpose(out["mhsa"], (1, 0, 2, 3)), dtype),
        conv=jnp.asarray(np.transpose(out["conv"], (1, 0, 3, 2)), dtype),
        mhsa_len=jnp.asarray(out["mhsa_len"][:, 0].astype(np.int32)),
        reduction=jnp.asarray(np.transpose(out["reduction"], (0, 2, 1)), dtype),
    )
    return StreamingState(preproc=jnp.asarray(out["preproc"], dtype), encoder=enc)
