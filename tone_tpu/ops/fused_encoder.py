"""Streaming encoder step built on the fused Conformer-layer kernel.

Mirrors ``tone_tpu.core.encoder.encoder_streaming_step`` exactly (same state
pytree, same outputs) but runs each of the 16 Conformer layers as one Pallas
program (see ops/fused_layer.py).  Subsampling, temporal reduction/upsample
and the CTC head remain XLA ops — they are a small fraction of the traffic.

Weights are pre-flattened once per model (``prepare_fused_params``) so the
per-step graph contains no weight reshaping/casting.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from tone_tpu.config import ToneConfig
from tone_tpu.core import layers as L
from tone_tpu.core.encoder import (
    EncoderStreamState,
    _subsampling,
    _temporal_reduction,
    _temporal_upsample,
)
from tone_tpu.core.frontend import FrontendConstants, get_frontend_constants, log_mel_streaming
from tone_tpu.core.model import INT16_MAX, StreamingState, _head
from tone_tpu.ops.fused_layer import flatten_layer_params, fused_conformer_layer


@flax.struct.dataclass
class FusedLayerPlan:
    weights: tuple  # per-layer tuple of flattened weight arrays

    @property
    def n_layers(self) -> int:
        return len(self.weights)


def _layer_static(cfg, i: int) -> dict:
    e = cfg.encoder
    in_reduced = e.reduction_position < i <= e.upsample_position
    stateful = i >= e.mhsa_stateless_layers
    t = e.chunk_size // e.reduction_factor if in_reduced else e.chunk_size
    if stateful:
        window = e.mhsa_state_size // (e.reduction_factor if in_reduced else 1)
    else:
        window = 0
    return {
        "t": t,
        "window": window,
        "recompute": e.should_recompute_att_scores[i],
        "stateful": stateful,
        "in_reduced": in_reduced,
    }


def prepare_fused_params(variables, cfg: ToneConfig) -> FusedLayerPlan:
    """Flatten all layer weights for the fused kernels (call once)."""
    e = cfg.encoder
    weights = []
    for i in range(e.n_layers):
        st = _layer_static(cfg, i)
        weights.append(tuple(flatten_layer_params(
            variables["params"]["encoder"]["layers"][i],
            variables["batch_stats"]["layers"][i],
            e, t=st["t"], window=st["window"], recompute=st["recompute"],
        )))
    return FusedLayerPlan(weights=tuple(jax.device_put(w) for w in weights))


def encoder_streaming_step_fused(
    variables,
    plan: FusedLayerPlan,
    cfg: ToneConfig,
    feats: jnp.ndarray,
    state: EncoderStreamState,
    block_b: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, EncoderStreamState]:
    e = cfg.encoder
    dtype = jnp.dtype(cfg.compute_dtype)
    enc_params = variables["params"]["encoder"]

    x, new_subs, _ = _subsampling(
        enc_params["pre_encode"], variables["batch_stats"]["pre_encode"], e,
        feats, (state.sub1, state.sub2), dtype)

    invalid_full = jnp.maximum(e.mhsa_state_size - state.mhsa_len, 0).astype(jnp.int32)[:, None]
    invalid_red = invalid_full // e.reduction_factor

    new_conv_states = []
    new_mhsa_windows = []
    residual_pre_reduction = None
    scores = None

    for i in range(e.n_layers):
        st = _layer_static(cfg, i)
        if st["stateful"]:
            stored = state.mhsa[i - e.mhsa_stateless_layers]
            mhsa_win = stored[:, -st["window"]:, :].astype(dtype)
            invalid = invalid_red if st["in_reduced"] else invalid_full
        else:
            mhsa_win = None
            invalid = None

        x = x.astype(dtype)
        y, new_conv, new_win, scores = fused_conformer_layer(
            x, state.conv[i].astype(dtype), mhsa_win, invalid,
            None if st["recompute"] else scores,
            plan.weights[i],
            t=st["t"], d=e.d_model, d_ff=e.d_ff, n_heads=e.n_heads,
            rope_dim=e.rope_dim, window=st["window"],
            recompute=st["recompute"], conv_k=e.conv_kernel_size,
            block_b=block_b, interpret=interpret,
        )
        x = y
        new_conv_states.append(new_conv)
        if st["stateful"]:
            pad = e.mhsa_state_size - new_win.shape[1]
            new_mhsa_windows.append(jnp.pad(new_win, ((0, 0), (pad, 0), (0, 0))))

        if i == e.reduction_position:
            residual_pre_reduction = x
            x, new_red_state = _temporal_reduction(
                enc_params["reduction"], x, state.reduction, e, dtype)
        if i == e.upsample_position:
            x = _temporal_upsample(x, residual_pre_reduction, e.reduction_factor)

    new_state = EncoderStreamState(
        sub1=new_subs[0].astype(state.sub1.dtype),
        sub2=new_subs[1].astype(state.sub2.dtype),
        mhsa=jnp.stack(new_mhsa_windows, axis=0).astype(state.mhsa.dtype),
        conv=jnp.stack(new_conv_states, axis=0).astype(state.conv.dtype),
        mhsa_len=jnp.minimum(state.mhsa_len + e.chunk_size, e.mhsa_state_size),
        reduction=new_red_state.astype(state.reduction.dtype),
    )
    return x, new_state


def apply_streaming_fused(
    variables,
    plan: FusedLayerPlan,
    config: ToneConfig,
    audio_chunk: jnp.ndarray,
    state: StreamingState,
    constants: FrontendConstants | None = None,
    block_b: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, StreamingState]:
    """Drop-in replacement for ``core.model.apply_streaming`` using the fused
    layer kernels.  Batch must be divisible by ``block_b``."""
    if constants is None:
        constants = get_frontend_constants(config.frontend)
    b = audio_chunk.shape[0]
    if block_b is None:
        block_b = next((c for c in (64, 32, 16, 8, 4, 2, 1) if b % c == 0), 1)

    wav = audio_chunk.astype(jnp.float32) / INT16_MAX
    feats, preproc_next = log_mel_streaming(wav, state.preproc.astype(jnp.float32), constants)
    encoded, enc_state = encoder_streaming_step_fused(
        variables, plan, config, feats, state.encoder, block_b, interpret=interpret)
    logprobs = _head(variables["params"]["head"], encoded)
    return logprobs, StreamingState(preproc=preproc_next.astype(state.preproc.dtype),
                                    encoder=enc_state)
