"""Streaming Conformer encoder — pure-functional, static-shape, TPU-first.

Re-design of the reference encoder (tone/nn/modules/conformer.py,
conformer_blocks.py) with the mutable ``EncoderState`` object replaced by an
explicit immutable pytree threaded through pure functions.  Every streaming
step has fully static shapes: a 300 ms chunk is exactly 30 feature frames ->
10 model frames (5 inside the temporally-reduced block), so XLA compiles one
fixed program per batch size and the whole step fuses aggressively.

Architecture (reference ToneConfig contract, model_wrapper.py:36-75):
  * conv subsampling x3 in time (2 conv2d, kernels (11,21)/(11,11),
    strides (1,1)/(3,1)) with carried input tails in streaming;
  * 16 Macaron Conformer layers (GLU feed-forward halves, rotary MHSA with
    per-head q/k LayerNorm, causal depthwise conv k=31, RMSNorm);
  * temporal reduction x2 after layer 6, upsample + residual after layer 14;
  * layers 0..13 attend only within the current chunk (stateless); layers
    14..15 carry a sliding window of 30 (15 reduced) pre-projection frames;
  * attention scores computed at layers {0, 7, 14, 15} and reused between.

Offline (training) mode reproduces the reference's chunk-simulating masks
(conformer_blocks.py:302-349) so fine-tuned models behave identically when
deployed streaming.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import EncoderConfig
from tone_tpu.core import layers as L

Params = L.Params


# ---------------------------------------------------------------------------
# State pytree.
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class EncoderStreamState:
    """Per-stream recurrent state for one streaming step (all static shapes).

    Replaces the 7 tensors mutated on the reference's ``EncoderState``
    (conformer_blocks.py:46-195).  ``mhsa`` windows are stored padded to
    ``mhsa_state_size`` rows with zeros in *front* (reference
    update_after_layer, conformer_blocks.py:161-163); ``mhsa_len`` tracks how
    many trailing rows are valid for masking of the first chunks.
    """

    sub1: jnp.ndarray  # (B, 1, sub_state0, feat_in)
    sub2: jnp.ndarray  # (B, C0, sub_state1, hidden_feat0)
    mhsa: jnp.ndarray  # (n_stateful, B, mhsa_state_size, d_model)
    conv: jnp.ndarray  # (n_layers, B, conv_kernel - 1, d_model) — time-major
    mhsa_len: jnp.ndarray  # (B,) int32
    reduction: jnp.ndarray  # (B, reduction_state, d_model) — time-major


def init_encoder_state(cfg: EncoderConfig, batch_size: int, dtype=jnp.float32) -> EncoderStreamState:
    """Zero streaming state (reference Encoder.get_initial_state, conformer.py:235-310)."""
    sub_lens = cfg.subsampling_state_lens
    sub_h = cfg.subsampling_hidden_features
    return EncoderStreamState(
        sub1=jnp.zeros((batch_size, 1, sub_lens[0], cfg.feat_in), dtype),
        sub2=jnp.zeros((batch_size, cfg.subsampling_conv_channels[0], sub_lens[1], sub_h[0]), dtype),
        mhsa=jnp.zeros((cfg.n_stateful_mhsa_layers, batch_size, cfg.mhsa_state_size, cfg.d_model), dtype),
        conv=jnp.zeros((cfg.n_layers, batch_size, cfg.conv_state_size, cfg.d_model), dtype),
        mhsa_len=jnp.zeros((batch_size,), jnp.int32),
        reduction=jnp.zeros((batch_size, cfg.reduction_state_size, cfg.d_model), dtype),
    )


# ---------------------------------------------------------------------------
# Parameter init.
# ---------------------------------------------------------------------------


def init_encoder_params(key, cfg: EncoderConfig) -> tuple[Params, Params]:
    """Returns (params, batch_stats) pytrees."""
    keys = jax.random.split(key, cfg.n_layers + 3)
    ch = cfg.subsampling_conv_channels
    ks = cfg.subsampling_kernel_size
    sub_h = cfg.subsampling_hidden_features

    k_pre = jax.random.split(keys[0], 4)
    bn1_p, bn1_s = L.init_batchnorm(ch[0])
    bn2_p, bn2_s = L.init_batchnorm(ch[1])
    pre_encode = {
        "pre_norm": L.init_rmsnorm(cfg.feat_in),
        "conv1": L.init_conv(k_pre[0], ch[0], 1, ks[0]),
        "bn1": bn1_p,
        "conv2": L.init_conv(k_pre[1], ch[1], ch[0], ks[1]),
        "bn2": bn2_p,
        "out": L.init_linear(k_pre[2], ch[1] * sub_h[1], cfg.d_model, bias=False),
        "out_norm": L.init_rmsnorm(cfg.d_model),
    }

    layer_params = []
    layer_stats = []
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[1 + i], 8)
        bn_p, bn_s = L.init_batchnorm(cfg.d_model)
        layer_params.append({
            "norm_ff1": L.init_rmsnorm(cfg.d_model),
            "ff1": _init_ff(k[0], cfg.d_model, cfg.d_ff),
            "norm_att": L.init_rmsnorm(cfg.d_model),
            "att": L.init_mhsa(k[1], cfg.d_model, cfg.n_heads, cfg.rope_dim,
                               cfg.should_recompute_att_scores[i]),
            "norm_conv": L.init_rmsnorm(cfg.d_model),
            "conv": {
                "pw1": L.init_linear(k[2], cfg.d_model, cfg.d_model * 2),
                "dw": L.init_conv(k[3], cfg.d_model, 1, (cfg.conv_kernel_size,)),
                "bn": bn_p,
                "pw2": L.init_linear(k[4], cfg.d_model, cfg.d_model),
            },
            "norm_ff2": L.init_rmsnorm(cfg.d_model),
            "ff2": _init_ff(k[5], cfg.d_model, cfg.d_ff),
            "norm_out": L.init_rmsnorm(cfg.d_model),
        })
        layer_stats.append({"conv_bn": bn_s})

    k_red = jax.random.split(keys[-1], 2)
    reduction = {
        "dw": L.init_conv(k_red[0], cfg.d_model * 4, 1, (cfg.reduction_kernel_size,)),
        "pw": L.init_linear(k_red[1], cfg.d_model * 4, cfg.d_model),
    }

    params = {"pre_encode": pre_encode, "layers": tuple(layer_params), "reduction": reduction}
    batch_stats = {
        "pre_encode": {"bn1": bn1_s, "bn2": bn2_s},
        "layers": tuple(layer_stats),
    }
    return params, batch_stats


def _init_ff(key, d_model: int, d_ff: int) -> Params:
    k = jax.random.split(key, 3)
    return {
        "lin1": L.init_linear(k[0], d_model, d_ff),
        "linv": L.init_linear(k[1], d_model, d_ff),
        "lin2": L.init_linear(k[2], d_ff, d_model),
    }


# ---------------------------------------------------------------------------
# Sub-modules shared between streaming and offline.
# ---------------------------------------------------------------------------


def _feed_forward(p: Params, x: jnp.ndarray, dtype, drop_key, rate, training) -> jnp.ndarray:
    """GLU-gated feed-forward: lin2(silu(lin1 x) * linv x) (reference
    conformer_blocks.py:468-482; the reference applies dropout only via the
    outer layer residual, its inner Dropout is unused in eval).

    Serving weights carry the merged in-projection ("lin12", see
    acoustic.cast_params_for_inference): one (D, 2F) matmul then a split —
    identical math, one MXU pass over x."""
    if "lin12" in p:
        av = L.linear(p["lin12"], x, dtype)
        from tone_tpu.ops.glu_ff import fused_glu_ff2_enabled, glu_ff2

        if fused_glu_ff2_enabled():
            # Pallas kernel: gate computed on-chip, no HBM round trip for
            # the gated product (ops/glu_ff.py).
            return glu_ff2(av, p["lin2"], dtype)
        a, v = jnp.split(av, 2, axis=-1)
        return L.linear(p["lin2"], L.silu(a) * v, dtype)
    gate = L.silu(L.linear(p["lin1"], x, dtype))
    return L.linear(p["lin2"], gate * L.linear(p["linv"], x, dtype), dtype)


def _conv_module(
    p: Params,
    bn_stats: Params,
    x: jnp.ndarray,
    conv_state: jnp.ndarray | None,
    pad_mask: jnp.ndarray | None,
    kernel_size: int,
    dtype,
    training: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray | None, Params]:
    """Conformer conv module: pointwise -> GLU -> causal depthwise -> BN -> SiLU
    -> pointwise (reference conformer_blocks.py:352-436).

    Args:
        x: (B, T, D).
        conv_state: (B, kernel-1, D) time-major streaming prefix, or None for
            offline (zero left padding — identical semantics with zero state).
        pad_mask: (B, T) True where the frame is padding (offline only);
            padded frames are zeroed before the depthwise conv.

    Returns:
        (output (B, T, D), next conv_state or None, updated bn stats).

    The whole module runs feature-last (channels on TPU lanes) — no
    transposes, unlike the reference's (B, D, T) torch layout.
    """
    b, t, d = x.shape
    y = L.linear(p["pw1"], x, dtype)  # (B, T, 2D)
    y = L.glu(y, axis=-1)  # (B, T, D)
    if pad_mask is not None:
        y = jnp.where(pad_mask[:, :, None], jnp.zeros_like(y), y)

    if conv_state is None:
        padded = jnp.pad(y, ((0, 0), (kernel_size - 1, 0), (0, 0)))
        next_state = None
    else:
        padded = jnp.concatenate([conv_state.astype(y.dtype), y], axis=1)
        next_state = padded[:, -(kernel_size - 1):, :]
    y = L.conv1d_nhc(p["dw"], padded, stride=1, groups=d, compute_dtype=dtype)
    y, new_bn = L.batchnorm(p["bn"], bn_stats, y, channel_axis=2, training=training)
    y = L.silu(y)
    y = L.linear(p["pw2"], y, dtype)
    return y, next_state, new_bn


def _subsampling(
    p: Params,
    stats: Params,
    cfg: EncoderConfig,
    feats: jnp.ndarray,
    sub_states: tuple[jnp.ndarray, jnp.ndarray] | None,
    dtype,
    training: bool = False,
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray] | None, Params]:
    """Conv subsampling (x3 in time) with carried input tails.

    Reference ``ConvSubsamplingPreEncode.forward`` (conformer_blocks.py:614-653).

    Args:
        feats: (B, T, feat_in) log-mel features.
        sub_states: streaming tails ((B,1,s0,F), (B,C0,s1,H0)) or None for
            offline (zero top padding — identical to zero states).

    Returns:
        ((B, T_out, d_model), next sub_states or None, updated bn stats).
    """
    sub_lens = cfg.subsampling_state_lens
    streaming = sub_states is not None

    x = L.rmsnorm(p["pre_norm"], feats.astype(dtype))
    x = x[:, None, :, :]  # (B, 1, T, F) — NCHW with time as H

    new_states = []
    for i, (conv_name, bn_name) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        if streaming:
            tail = sub_states[i].astype(x.dtype)
        else:
            b = x.shape[0]
            tail = jnp.zeros((b, x.shape[1], sub_lens[i], x.shape[3]), x.dtype)
        x = jnp.concatenate([tail, x], axis=2)
        if streaming:
            new_states.append(x[:, :, -sub_lens[i]:, :])
        x = L.conv2d(p[conv_name], x, cfg.subsampling_strides[i], dtype)
        x, new_bn = L.batchnorm(p[bn_name], stats[bn_name], x, channel_axis=1,
                                training=training)
        stats = {**stats, bn_name: new_bn}
        x = L.silu(x)

    # (B, C, T_out, F_out) -> (B, T_out, C * F_out) with (channel, freq) order.
    b, c, t_out, f_out = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t_out, c * f_out)
    x = L.linear(p["out"], x, dtype)
    x = L.rmsnorm(p["out_norm"], x)
    return x, (tuple(new_states) if streaming else None), stats


def _temporal_reduction(
    p: Params,
    x: jnp.ndarray,
    red_state: jnp.ndarray | None,
    cfg: EncoderConfig,
    dtype,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Causal depthwise stride-2 conv (x4 channels) + pointwise
    (reference conformer_blocks.py:874-911).

    Args:
        x: (B, T, D).
        red_state: (B, kernel - factor, D) time-major streaming prefix or None
            (offline: left pad kernel - factor zeros + right pad to a multiple
            of factor).
    """
    k, r = cfg.reduction_kernel_size, cfg.reduction_factor
    if red_state is None:
        t = x.shape[1]
        right = (r - t % r) % r
        padded = jnp.pad(x, ((0, 0), (k - r, right), (0, 0)))
        next_state = None
    else:
        padded = jnp.concatenate([red_state.astype(x.dtype), x], axis=1)
        next_state = padded[:, -(k - r):, :]
    y = L.conv1d_nhc(p["dw"], padded, stride=r, groups=cfg.d_model, compute_dtype=dtype)
    y = L.linear(p["pw"], y, dtype)  # (B, T_red, 4D) -> (B, T_red, D)
    return y, next_state


def _temporal_upsample(x: jnp.ndarray, residual: jnp.ndarray, factor: int) -> jnp.ndarray:
    """repeat_interleave x factor + residual from the pre-reduction activations
    (reference conformer_blocks.py:955-988)."""
    t_res = residual.shape[1]
    y = jnp.repeat(x, factor, axis=1)
    if factor > 1:
        y = jnp.pad(y, ((0, 0), (0, factor - 1), (0, 0)))
    y = y[:, :t_res, :]
    return y + residual


# ---------------------------------------------------------------------------
# Conformer layer core (mode-independent).
# ---------------------------------------------------------------------------


def _conformer_layer(
    p: Params,
    bn_stats: Params,
    x: jnp.ndarray,
    *,
    cfg: EncoderConfig,
    mhsa_window: jnp.ndarray | None,  # (B, W, D) sliding pre-projection window
    k_offset: int,
    att_mask: jnp.ndarray | None,
    pad_mask: jnp.ndarray | None,
    cached_scores: jnp.ndarray | None,
    conv_state: jnp.ndarray | None,
    dtype,
    rngs=None,
    training: bool = False,
    blocked: tuple[int, int, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray | None, Params]:
    """One Macaron Conformer block (reference conformer_blocks.py:799-836).

    ``blocked`` = (chunk, left_context, lengths) routes the attention
    through the block-diagonal offline path (layers.mhsa_blocked) instead
    of a full (T, T) masked matmul; ``att_mask`` must then be None.

    Returns (output, scores, new_mhsa_window, new_conv_state, new_bn_stats).
    """
    def drop(name, v, rate):
        if not training or rngs is None:
            return v
        return L.dropout(rngs[name], v, rate, training)

    residual = x
    y = L.rmsnorm(p["norm_ff1"], x)
    y = _feed_forward(p["ff1"], y, dtype, None, 0.0, False)
    residual = residual + drop("ff1", y, cfg.dropout) * 0.5

    a_in = L.rmsnorm(p["norm_att"], residual)
    if mhsa_window is not None:
        kv = jnp.concatenate([mhsa_window.astype(a_in.dtype), a_in], axis=1)
        tq = a_in.shape[1]
        # Slide: drop the oldest tq rows, append the new pre-projection frames
        # (reference MultiHeadAttention.update_state, submodules.py:295-303).
        new_window = jnp.concatenate([mhsa_window[:, tq:, :].astype(a_in.dtype), a_in], axis=1)
    else:
        kv = a_in
        new_window = None

    att_key = rngs["att"] if (training and rngs is not None) else None
    if blocked is not None:
        chunk, left_context, lengths = blocked
        y, scores = L.mhsa_blocked(
            p["att"], a_in,
            n_heads=cfg.n_heads, rope_dim=cfg.rope_dim, chunk=chunk,
            left_context=left_context, lengths=lengths,
            cached_scores=cached_scores, compute_dtype=dtype,
            dropout_key=att_key, dropout_rate=cfg.dropout_att,
            training=training,
        )
    else:
        y, scores = L.mhsa(
            p["att"], a_in, kv,
            n_heads=cfg.n_heads, rope_dim=cfg.rope_dim, k_offset=k_offset,
            mask=att_mask, cached_scores=cached_scores, compute_dtype=dtype,
            dropout_key=att_key, dropout_rate=cfg.dropout_att, training=training,
        )
    residual = residual + drop("att_out", y, cfg.dropout)

    y = L.rmsnorm(p["norm_conv"], residual)
    y, new_conv_state, new_bn = _conv_module(
        p["conv"], bn_stats["conv_bn"], y, conv_state, pad_mask,
        cfg.conv_kernel_size, dtype, training=training,
    )
    residual = residual + drop("conv", y, cfg.dropout)

    y = L.rmsnorm(p["norm_ff2"], residual)
    y = _feed_forward(p["ff2"], y, dtype, None, 0.0, False)
    residual = residual + drop("ff2", y, cfg.dropout) * 0.5

    out = L.rmsnorm(p["norm_out"], residual)
    return out, scores, new_window, new_conv_state, {"conv_bn": new_bn}


# ---------------------------------------------------------------------------
# Streaming forward (one 300 ms chunk).
# ---------------------------------------------------------------------------


def encoder_streaming_step(
    params: Params,
    batch_stats: Params,
    cfg: EncoderConfig,
    feats: jnp.ndarray,
    state: EncoderStreamState,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, EncoderStreamState]:
    """Process one chunk of features through the encoder with carried state.

    Mirrors the reference streaming path (Encoder.forward with states,
    conformer.py:148-233) but as a pure function with static shapes.

    Args:
        feats: (B, feat_frames, feat_in) log-mel features for the chunk
            (30 frames for the standard 300 ms chunk).
        state: recurrent state from the previous chunk.

    Returns:
        (encoded (B, chunk_size, d_model), next state).
    """
    n_red = cfg.reduction_factor
    win_full = cfg.mhsa_state_size  # 30
    win_red = win_full // n_red  # 15
    chunk_full = cfg.chunk_size  # 10
    chunk_red = chunk_full // n_red  # 5

    x, new_subs, _ = _subsampling(
        params["pre_encode"], batch_stats["pre_encode"], cfg, feats,
        (state.sub1, state.sub2), dtype,
    )
    assert x.shape[1] == chunk_full, (x.shape, chunk_full)

    # Streaming attention masks: only the zero-initialized (not yet filled)
    # front of the sliding windows must be masked out during the first
    # chunks.  offset = number of invalid leading state rows
    # (reference conformer_blocks.py:241, :340-342).
    def state_mask(window: int, tq: int, offset: jnp.ndarray) -> jnp.ndarray:
        cols = jnp.arange(window + tq, dtype=jnp.int32)[None, :]  # (1, W+Tq)
        masked = cols < offset[:, None]  # (B, W+Tq); chunk cols never masked
        return jnp.broadcast_to(masked[:, None, :], (masked.shape[0], tq, window + tq))

    offset_full = (win_full - state.mhsa_len).astype(jnp.int32)
    mask_red = state_mask(win_red, chunk_red, offset_full // n_red)
    mask_full = state_mask(win_full, chunk_full, offset_full)

    # New stacked caches are built by in-place slice updates on the incoming
    # (donated) arrays rather than jnp.stack of a python list: with buffer
    # donation XLA turns each .at[i].set into an aliased in-place write,
    # removing a full extra copy pass over the largest state component
    # (conv cache = 84% of the state bytes).
    new_conv_stack = state.conv
    new_mhsa_stack = state.mhsa
    residual_pre_reduction = None
    cached_scores = None

    for i in range(cfg.n_layers):
        stateful = i >= cfg.mhsa_stateless_layers
        in_reduced = cfg.reduction_position < i <= cfg.upsample_position

        if stateful:
            window = win_red if in_reduced else win_full
            stored = state.mhsa[i - cfg.mhsa_stateless_layers]  # (B, 30, D)
            mhsa_window = stored[:, -window:, :]
            k_offset = window
            att_mask = mask_red if in_reduced else mask_full
        else:
            mhsa_window = None
            k_offset = 0
            att_mask = None

        if cfg.should_recompute_att_scores[i]:
            cached_scores = None

        x, scores, new_window, new_conv, _ = _conformer_layer(
            params["layers"][i], batch_stats["layers"][i], x,
            cfg=cfg, mhsa_window=mhsa_window, k_offset=k_offset,
            att_mask=att_mask, pad_mask=None, cached_scores=cached_scores,
            conv_state=state.conv[i], dtype=dtype,
        )
        cached_scores = scores
        new_conv_stack = new_conv_stack.at[i].set(
            new_conv.astype(new_conv_stack.dtype))
        if stateful:
            # Store padded to mhsa_state_size rows with zeros in front
            # (reference update_after_layer, conformer_blocks.py:161-163).
            pad = cfg.mhsa_state_size - new_window.shape[1]
            padded = jnp.pad(new_window, ((0, 0), (pad, 0), (0, 0)))
            new_mhsa_stack = new_mhsa_stack.at[i - cfg.mhsa_stateless_layers].set(
                padded.astype(new_mhsa_stack.dtype))

        if i == cfg.reduction_position:
            residual_pre_reduction = x
            x, new_red_state = _temporal_reduction(
                params["reduction"], x, state.reduction, cfg, dtype)
        if i == cfg.upsample_position:
            x = _temporal_upsample(x, residual_pre_reduction, n_red)

    new_state = EncoderStreamState(
        sub1=new_subs[0].astype(state.sub1.dtype),
        sub2=new_subs[1].astype(state.sub2.dtype),
        mhsa=new_mhsa_stack,
        conv=new_conv_stack,
        mhsa_len=jnp.minimum(state.mhsa_len + chunk_full, win_full),
        reduction=new_red_state.astype(state.reduction.dtype),
    )
    return x, new_state


# ---------------------------------------------------------------------------
# Offline forward (training / full-utterance) with chunk-simulating masks.
# ---------------------------------------------------------------------------


def _offline_att_mask(
    t: int, chunk: int, left_context: int, lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Chunked-causal attention mask simulating streaming, True = masked
    (reference _create_pad_and_attention_masks, conformer_blocks.py:302-349).

    Each query row attends to its own chunk plus ``left_context`` frames
    before the chunk start, intersected with the validity (padding) mask.
    """
    rows = np.arange(t)[:, None]
    cols = np.arange(t)[None, :]
    chunk_start = rows - rows % chunk
    in_chunk = (cols >= chunk_start) & (cols < chunk_start + chunk)
    in_state = (cols >= chunk_start - left_context) & (cols < chunk_start)
    allowed = jnp.asarray(in_chunk | in_state)[None, :, :]  # (1, T, T)

    valid = jnp.arange(t, dtype=jnp.int32)[None, :] < lengths[:, None]  # (B, T)
    allowed = allowed & valid[:, None, :] & valid[:, :, None]
    return ~allowed


def encoder_offline(
    params: Params,
    batch_stats: Params,
    cfg: EncoderConfig,
    feats: jnp.ndarray,
    lengths: jnp.ndarray | None,
    dtype=jnp.bfloat16,
    rng=None,
    training: bool = False,
    blocked_attention: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, Params]:
    """Full-sequence forward with masks that exactly simulate streaming.

    Mirrors the reference offline path (Encoder.forward without states) —
    attention is chunk-local (plus a 30-frame left-context window for the two
    stateful layers) so training matches chunked deployment.

    ``blocked_attention`` (default) computes that chunk-local attention as
    dense per-chunk blocks (layers.mhsa_blocked): O(T·window) score
    traffic instead of a masked (T, T) matmul — equivalent outputs
    (tests/test_encoder_blocked.py pins both paths against each other),
    lower HBM traffic for the training step.  ``False`` keeps the
    reference-shaped full-mask path.

    Args:
        feats: (B, T_feat, feat_in).
        lengths: (B,) valid feature-frame lengths, or None for all-full.
        rng: PRNGKey for dropout when ``training``.

    Returns:
        (encoded (B, T_out, d_model), output lengths (B,), updated batch_stats).
    """
    b, t_feat, _ = feats.shape
    if lengths is None:
        lengths = jnp.full((b,), t_feat, jnp.int32)

    # Subsampled lengths (reference get_output_length, conformer_blocks.py:555-568).
    out_len = lengths
    for klen, slen, stride in zip(
        cfg.subsampling_kernel_size, cfg.subsampling_state_lens, cfg.subsampling_strides,
    ):
        out_len = (out_len - klen[0] + slen) // stride[0] + 1

    x, _, new_pre_stats = _subsampling(
        params["pre_encode"], batch_stats["pre_encode"], cfg, feats, None, dtype,
        training=training,
    )
    t = x.shape[1]
    t_red = -(-t // cfg.reduction_factor)  # ceil
    len_full = out_len
    len_red = out_len // cfg.reduction_factor

    chunk_full, chunk_red = cfg.chunk_size, cfg.chunk_size // cfg.reduction_factor
    win_full, win_red = cfg.mhsa_state_size, cfg.mhsa_state_size // cfg.reduction_factor

    # Mask groups (True = masked). Layers 0..13 have no left context offline
    # (reference conformer_blocks.py:278-284); layers 14/15 keep theirs.
    # With blocked attention the group is (chunk, left_context, lengths)
    # block parameters instead of a materialized (T, T) mask.
    if blocked_attention:
        groups = {
            "full_noctx": (chunk_full, 0, len_full),
            "red_noctx": (chunk_red, 0, len_red),
            "red_ctx": (chunk_red, win_red, len_red),
            "full_ctx": (chunk_full, win_full, len_full),
        }
        masks = {k: None for k in groups}
    else:
        groups = {}
        masks = {
            "full_noctx": _offline_att_mask(t, chunk_full, 0, len_full),
            "red_noctx": _offline_att_mask(t_red, chunk_red, 0, len_red),
            "red_ctx": _offline_att_mask(t_red, chunk_red, win_red, len_red),
            "full_ctx": _offline_att_mask(t, chunk_full, win_full, len_full),
        }
    pad_full = jnp.arange(t, dtype=jnp.int32)[None, :] >= len_full[:, None]
    pad_red = jnp.arange(t_red, dtype=jnp.int32)[None, :] >= len_red[:, None]

    def layer_masks(i: int):
        in_reduced = cfg.reduction_position < i <= cfg.upsample_position
        stateful = i >= cfg.mhsa_stateless_layers
        if in_reduced:
            key = "red_ctx" if stateful else "red_noctx"
            return key, pad_red
        key = "full_ctx" if stateful else "full_noctx"
        return key, pad_full

    new_layer_stats = []
    residual_pre_reduction = None
    cached_scores = None

    for i in range(cfg.n_layers):
        group, pad_mask = layer_masks(i)
        if cfg.should_recompute_att_scores[i]:
            cached_scores = None
        rngs = None
        if training and rng is not None:
            rng, *subkeys = jax.random.split(rng, 6)
            rngs = dict(zip(("ff1", "att", "att_out", "conv", "ff2"), subkeys))

        x, scores, _, _, new_bn = _conformer_layer(
            params["layers"][i], batch_stats["layers"][i], x,
            cfg=cfg, mhsa_window=None, k_offset=0,
            att_mask=masks[group], pad_mask=pad_mask,
            cached_scores=cached_scores,
            blocked=groups.get(group) if blocked_attention else None,
            conv_state=None, dtype=dtype, rngs=rngs, training=training,
        )
        cached_scores = scores
        new_layer_stats.append(new_bn)

        if i == cfg.reduction_position:
            residual_pre_reduction = x
            x, _ = _temporal_reduction(params["reduction"], x, None, cfg, dtype)
        if i == cfg.upsample_position:
            x = _temporal_upsample(x, residual_pre_reduction, cfg.reduction_factor)

    out_len = jnp.minimum(len_red * cfg.reduction_factor, t)
    new_stats = {"pre_encode": new_pre_stats, "layers": tuple(new_layer_stats)}
    return x, out_len, new_stats
