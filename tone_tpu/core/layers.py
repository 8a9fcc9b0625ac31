"""Functional neural-net primitives for the T-one TPU model.

Pure functions over explicit parameter pytrees — no module objects, no hidden
state.  Parameter layout conventions (chosen so the torch->jax checkpoint
converter in ``tone_tpu/checkpoint.py`` is a near-identity mapping):

* linear:      ``{"w": (in, out), "b": (out,)}``          applied as ``x @ w + b``
* conv (any):  ``{"w": torch layout (O, I/groups, *K), "b": (O,)}``
* rmsnorm:     ``{"weight": (d,)}``                        eps = 1e-8, fp32 compute
* layernorm:   ``{"scale": (d,), "bias": (d,)}``           eps = 1e-5, fp32 compute
* batchnorm:   params ``{"scale": (C,), "bias": (C,)}`` +
               batch_stats ``{"mean": (C,), "var": (C,)}``  eps = 1e-5

Numerical policy: matmuls/convs run in the configured compute dtype
(bfloat16 by default); all normalizations and softmax/log-softmax run in
float32 (the TPU equivalent of the reference's TensorRT fp32 pins,
scripts/trt_build.md:7-22; RMSNorm fp32 per reference submodules.py:45-54).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# ---------------------------------------------------------------------------
# Initializers (torch-default-compatible: kaiming-uniform fan_in bounds).
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, d_in: int, d_out: int, bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    p = {"w": _uniform(k1, (d_in, d_out), bound)}
    if bias:
        p["b"] = _uniform(k2, (d_out,), bound)
    return p


def init_conv(key, out_ch: int, in_ch_per_group: int, kernel: tuple[int, ...],
              bias: bool = True) -> Params:
    k1, k2 = jax.random.split(key)
    fan_in = in_ch_per_group * int(np.prod(kernel))
    bound = 1.0 / np.sqrt(fan_in)
    p = {"w": _uniform(k1, (out_ch, in_ch_per_group, *kernel), bound)}
    if bias:
        p["b"] = _uniform(k2, (out_ch,), bound)
    return p


def init_rmsnorm(d: int) -> Params:
    return {"weight": jnp.ones((d,), jnp.float32)}


def init_layernorm(d: int) -> Params:
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_batchnorm(c: int) -> tuple[Params, Params]:
    params = {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}
    stats = {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}
    return params, stats


# ---------------------------------------------------------------------------
# Primitive applications.
# ---------------------------------------------------------------------------


def linear(p: Params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    y = jnp.matmul(
        x.astype(compute_dtype), p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(compute_dtype)


def rmsnorm(p: Params, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """RMSNorm with fp32 compute (reference submodules.py:34-54).

    Note the reference divides by ``rms + eps`` (not ``sqrt(ms + eps)``).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    d = x.shape[-1]
    rms = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True)) / np.sqrt(d)
    normed = x32 / (rms + eps)
    return (p["weight"].astype(jnp.float32) * normed).astype(dtype)


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(dtype)


def batchnorm(
    p: Params,
    stats: Params,
    x: jnp.ndarray,
    *,
    channel_axis: int,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, Params]:
    """BatchNorm over all axes except ``channel_axis``.

    In eval mode uses running statistics (a pure scale+shift — XLA fuses it
    into the surrounding convolution).  In training mode computes batch
    statistics and returns updated running stats with torch momentum
    semantics: ``running = (1 - m) * running + m * batch``.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(x.ndim) if i != channel_axis)
    shape = [1] * x.ndim
    shape[channel_axis] = x.shape[channel_axis]

    if training:
        mean = jnp.mean(x32, axis=reduce_axes)
        var = jnp.var(x32, axis=reduce_axes)
        n = np.prod([x.shape[i] for i in reduce_axes])
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "mean": (1 - momentum) * stats["mean"] + momentum * mean,
            "var": (1 - momentum) * stats["var"] + momentum * unbiased,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats

    scale = p["scale"].astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    shift = p["bias"].astype(jnp.float32) - mean.astype(jnp.float32) * scale
    y = x32 * scale.reshape(shape) + shift.reshape(shape)
    return y.astype(dtype), new_stats


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def glu(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def conv2d(p: Params, x: jnp.ndarray, stride: tuple[int, int],
           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Valid 2D convolution, NCHW input / torch OIHW weights."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=stride,
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    y = y.astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)[None, :, None, None]
    return y.astype(compute_dtype)


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, groups: int = 1,
           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Valid 1D convolution, NCT input / torch (O, I/groups, K) weights."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    y = y.astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)[None, :, None]
    return y.astype(compute_dtype)


def conv1d_nhc(p: Params, x: jnp.ndarray, stride: int = 1, groups: int = 1,
               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Valid 1D convolution in feature-last layout: (B, T, C) input, torch
    (O, I/groups, K) weights.  Feature-last is the TPU-native layout (lanes =
    channels) and avoids the (B, T, C) <-> (B, C, T) transposes the torch
    layout forces."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        jnp.transpose(p["w"].astype(compute_dtype), (2, 1, 0)),  # (K, I/g, O)
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    y = y.astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(compute_dtype)


def dropout(key, x: jnp.ndarray, rate: float, training: bool) -> jnp.ndarray:
    if not training or rate == 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Rotary positional embeddings (partial-dim, with cache offset).
# ---------------------------------------------------------------------------


def apply_rope(x: jnp.ndarray, rope_dim: int, offset: int, base: float = 10_000.0) -> jnp.ndarray:
    """Apply RoPE to the first ``rope_dim`` features of each head.

    Matches reference ``RotaryPositionalEmbeddings`` (submodules.py:57-157):
    positions run from ``-offset`` to ``T - offset - 1`` so that cached keys
    (which precede the current chunk) receive negative positions.

    Args:
        x: (B, H, T, d_head).
        rope_dim: number of leading features to rotate (even).
        offset: static non-negative integer offset (state length).
    """
    t = x.shape[2]
    half = rope_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, rope_dim, 2, dtype=np.float64) / rope_dim))
    positions = np.arange(-offset, t - offset, dtype=np.float64)
    freqs = positions[:, None] * inv_freq[None, :]  # (T, half)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (T, rope_dim)
    cos = jnp.asarray(np.cos(emb), dtype=x.dtype)[None, None, :, :]
    sin = jnp.asarray(np.sin(emb), dtype=x.dtype)[None, None, :, :]

    x_rope, x_pass = x[..., :rope_dim], x[..., rope_dim:]
    x1, x2 = x_rope[..., :half], x_rope[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    x_rope = x_rope * cos + rotated * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)


# ---------------------------------------------------------------------------
# Attention (with optional score sharing and fp32 softmax).
# ---------------------------------------------------------------------------


def init_mhsa(key, d_model: int, n_heads: int, rope_dim: int, recompute_scores: bool) -> Params:
    keys = jax.random.split(key, 4)
    d_head = d_model // n_heads
    p: Params = {
        "linear_v": init_linear(keys[0], d_model, d_model),
        "linear_out": init_linear(keys[1], d_model, d_model),
    }
    if recompute_scores:
        p["linear_q"] = init_linear(keys[2], d_model, d_model)
        p["linear_k"] = init_linear(keys[3], d_model, d_model)
        p["q_ln"] = init_layernorm(d_head)
        p["k_ln"] = init_layernorm(d_head)
    return p


def mhsa(
    p: Params,
    query: jnp.ndarray,
    kv: jnp.ndarray,
    *,
    n_heads: int,
    rope_dim: int,
    k_offset: int,
    mask: jnp.ndarray | None,
    cached_scores: jnp.ndarray | None,
    compute_dtype=jnp.bfloat16,
    dropout_key=None,
    dropout_rate: float = 0.0,
    training: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotary multi-head attention with optional score reuse.

    Matches reference ``RotaryMultiHeadAttention.forward``
    (conformer_blocks.py:688-726) + ``MultiHeadAttention.forward_attention``
    (submodules.py:242-271): per-head LayerNorm on q/k, RoPE on the leading
    ``rope_dim`` features (keys offset by the cache length), masked_fill(-1e4)
    before fp32 softmax and re-zeroing of masked attention weights after.

    Args:
        query: (B, Tq, D) pre-projection activations.
        kv: (B, Tkv, D) pre-projection activations (state-concatenated).
        k_offset: static cache length for key RoPE positions.
        mask: optional boolean (B, Tq, Tkv) or (1, Tq, Tkv); True = masked.
        cached_scores: if not None, reuse these (B, H, Tq, Tkv) scores and
            skip the q/k path entirely (score-sharing layers have no
            q/k projections).

    Returns:
        (output (B, Tq, D), scores (B, H, Tq, Tkv) in fp32).
    """
    b, tq, d = query.shape
    tkv = kv.shape[1]
    d_head = d // n_heads

    if cached_scores is None:
        # Projections and the score matmul run in the compute dtype with fp32
        # accumulation; the per-head LayerNorms stay fp32 inside (the
        # reference's deployed precision policy: matmuls reduced-precision,
        # norms/softmax pinned fp32 — scripts/trt_build.md:7-22).
        q = linear(p["linear_q"], query, compute_dtype).reshape(b, tq, n_heads, d_head)
        k = linear(p["linear_k"], kv, compute_dtype).reshape(b, tkv, n_heads, d_head)
        q = layernorm(p["q_ln"], q)
        k = layernorm(p["k_ln"], k)
        q = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, Tq, dh)
        k = jnp.transpose(k, (0, 2, 1, 3))
        q = apply_rope(q, rope_dim, 0)
        k = apply_rope(k, rope_dim, k_offset)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(d_head)
    else:
        scores = cached_scores

    v = linear(p["linear_v"], kv, compute_dtype).reshape(b, tkv, n_heads, d_head)
    v = jnp.transpose(v, (0, 2, 1, 3))  # (B, H, Tkv, dh)

    s = scores.astype(jnp.float32)
    if mask is not None:
        m = mask[:, None, :, :]  # (B, 1, Tq, Tkv)
        s = jnp.where(m, jnp.float32(-10000.0), s)
        attn = jax.nn.softmax(s, axis=-1)
        attn = jnp.where(m, 0.0, attn)
    else:
        attn = jax.nn.softmax(s, axis=-1)

    attn = dropout(dropout_key, attn, dropout_rate, training)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(compute_dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
    ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(b, tq, d)
    out = linear(p["linear_out"], ctx, compute_dtype)
    return out, scores


def _block_window(xb: jnp.ndarray, n_window_chunks: int) -> jnp.ndarray:
    """(B, H, n, c, d) chunked array -> (B, H, n, (nw+1)*c, d) where chunk i's
    window is chunks [i-nw .. i] (zeros shifted in before the sequence)."""
    if n_window_chunks == 0:
        return xb
    parts = []
    for j in range(n_window_chunks, 0, -1):
        shifted = jnp.pad(xb, ((0, 0), (0, 0), (j, 0), (0, 0), (0, 0)))
        parts.append(shifted[:, :, : xb.shape[2]])
    parts.append(xb)
    return jnp.concatenate(parts, axis=3)


def mhsa_blocked(
    p: Params,
    x: jnp.ndarray,
    *,
    n_heads: int,
    rope_dim: int,
    chunk: int,
    left_context: int,
    lengths: jnp.ndarray,
    cached_scores: jnp.ndarray | None,
    compute_dtype=jnp.bfloat16,
    dropout_key=None,
    dropout_rate: float = 0.0,
    training: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk-local attention as dense per-chunk blocks (offline path).

    Mathematically identical to ``mhsa`` under the offline chunk-simulating
    mask (encoder._offline_att_mask: each query chunk attends to itself
    plus ``left_context`` preceding frames): every key the full mask
    allows is inside the block window, and every key outside it would get
    ``-1e4`` and underflow to exactly 0.0 in the fp32 softmax.  Computes
    (B, H, n_chunks, c, w+c) score blocks instead of (B, H, T, T) —
    O(T·window) score traffic instead of O(T²), which is what the
    training step's HBM budget is made of at long T (docs/performance.md
    "Training throughput").

    ``left_context`` must be a whole number of chunks (the reference's
    windows are: 30 = 3×10 full-rate, 15 = 3×5 reduced —
    conformer_blocks.py:278-284).

    Returns (output (B, T, D), scores (B, H, n, c, w+c) fp32) — scores are
    reusable as ``cached_scores`` by score-sharing layers of the same
    mask group, mirroring ``mhsa``.
    """
    b, t, d = x.shape
    d_head = d // n_heads
    assert left_context % chunk == 0, (left_context, chunk)
    nw = left_context // chunk
    n = -(-t // chunk)
    tp = n * chunk
    pad_t = tp - t

    def blocked(proj):  # (B, T, H, dh) -> (B, H, n, c, dh)
        proj = jnp.transpose(proj, (0, 2, 1, 3))  # (B, H, T, dh)
        if pad_t:
            proj = jnp.pad(proj, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
        return proj.reshape(b, n_heads, n, chunk, d_head)

    if cached_scores is None:
        q = linear(p["linear_q"], x, compute_dtype).reshape(b, t, n_heads, d_head)
        k = linear(p["linear_k"], x, compute_dtype).reshape(b, t, n_heads, d_head)
        q = layernorm(p["q_ln"], q)
        k = layernorm(p["k_ln"], k)
        # RoPE positions are absolute, so it applies on the padded (B, H,
        # Tp, dh) layout before blocking — identical math to the full-T path.
        qb = blocked(q)
        kb = blocked(k)
        qb = apply_rope(qb.reshape(b, n_heads, tp, d_head), rope_dim, 0).reshape(
            b, n_heads, n, chunk, d_head)
        kb = apply_rope(kb.reshape(b, n_heads, tp, d_head), rope_dim, 0).reshape(
            b, n_heads, n, chunk, d_head)
        kwin = _block_window(kb, nw)
        scores = jnp.einsum(
            "bhnqd,bhnkd->bhnqk", qb, kwin, preferred_element_type=jnp.float32
        ) / np.sqrt(d_head)
    else:
        scores = cached_scores

    v = linear(p["linear_v"], x, compute_dtype).reshape(b, t, n_heads, d_head)
    vwin = _block_window(blocked(v), nw)

    # Mask (True = masked): window slot s of chunk i is global column
    # (i - nw) * chunk + s — masked when it's before the sequence start or
    # at/past the valid length; rows at/past the valid length mask fully.
    cols = (np.arange(n)[:, None] - nw) * chunk + np.arange((nw + 1) * chunk)
    rows = (np.arange(n)[:, None] * chunk + np.arange(chunk)).reshape(n, chunk)
    col_ok = (jnp.asarray(cols)[None] >= 0) & (
        jnp.asarray(cols)[None] < lengths[:, None, None])        # (B, n, w+c)
    row_ok = jnp.asarray(rows)[None] < lengths[:, None, None]    # (B, n, c)
    m = ~(row_ok[:, :, :, None] & col_ok[:, :, None, :])         # (B, n, c, w+c)
    m = m[:, None]                                               # (B, 1, n, c, w+c)

    s = jnp.where(m, jnp.float32(-10000.0), scores.astype(jnp.float32))
    attn = jax.nn.softmax(s, axis=-1)
    attn = jnp.where(m, 0.0, attn)
    attn = dropout(dropout_key, attn, dropout_rate, training)
    ctx = jnp.einsum(
        "bhnqk,bhnkd->bhnqd", attn.astype(compute_dtype), vwin,
        preferred_element_type=jnp.float32,
    ).astype(compute_dtype)
    ctx = jnp.transpose(ctx.reshape(b, n_heads, tp, d_head), (0, 2, 1, 3))
    ctx = ctx[:, :t].reshape(b, t, d)
    out = linear(p["linear_out"], ctx, compute_dtype)
    return out, scores
