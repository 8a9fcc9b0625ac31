"""Fused Conformer-layer Pallas kernel for the streaming step (EXPERIMENTAL).

Motivation: the XLA streaming step is HBM-bandwidth-bound — every matmul
boundary spills (B*T, d_ff)-sized intermediates to HBM (~160 MB per layer at
512 streams).  This kernel runs one ENTIRE Conformer layer — ff1 -> rotary
MHSA -> causal depthwise conv -> ff2 -> out-norm, with all five RMSNorms, the
per-head q/k LayerNorms, RoPE, GLUs and BatchNorm folded in — as a single
Pallas program gridded over stream tiles, keeping all intermediates in VMEM.

Implementation notes (TPU v5e constraints):
  * heads are padded to 128-lane slots (Mosaic cannot split the lane dim at
    d_head=48); per-head LayerNorm uses masked statistics, RoPE is padded
    cos/sin tables + a lane roll;
  * per-head attention matmuls are batched dot_generals (1 batch dim);
  * the depthwise conv is a 31-tap shifted-FMA loop.

Numerics match the XLA path (fp32 norms/softmax, bf16 matmuls with fp32
accumulation) — asserted in tests/test_fused_layer.py.

STATUS — measured on a v5e chip (remote): correct, but SLOWER than the XLA
path at every measured point (B=64 grid=1: 1.69 vs 1.35 ms; B=128: 3.1 vs
2.3 ms; B=512: 12.1 vs 9.4 ms), so the default serving path remains XLA.
The grid=1 measurement rules out weight re-fetch as the main cost: the
monolithic kernel serializes phases (DMA, MXU matmuls, VPU normalization,
the 31-tap conv loop, 8 per-head matmuls) that XLA's multi-kernel schedule
overlaps across its pipeline.  A competitive version would need internal
double-buffering and explicit MXU/VPU overlap (manual DMA pipelining within
the kernel), plus a block-diagonal single-matmul attention — substantial
Mosaic-level scheduling work for a step that is already at ~85% of the
HBM-bandwidth roofline under XLA.

Streaming-only: the offline/training path keeps the XLA implementation.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BF16 = jnp.bfloat16
F32 = jnp.float32
PAD_DH = 128  # per-head lane slot (heads padded to the TPU lane width)


# ---------------------------------------------------------------------------
# Parameter flattening (host-side, once per jit trace).
# ---------------------------------------------------------------------------


def _rope_tables(t: int, rope_dim: int, offset: int) -> tuple[np.ndarray, np.ndarray]:
    inv_freq = 1.0 / (10_000.0 ** (np.arange(0, rope_dim, 2, dtype=np.float64) / rope_dim))
    positions = np.arange(-offset, t - offset, dtype=np.float64)
    freqs = positions[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def flatten_layer_params(layer: Any, stats: Any, cfg, *, t: int, window: int,
                         recompute: bool, dtype=BF16) -> list[jnp.ndarray]:
    """Flatten one layer's params into the kernel's positional input list.

    All vectors are reshaped to (1, N); matmul weights cast to ``dtype``;
    BatchNorm running stats folded into a scale/shift pair; the depthwise
    kernel transposed to (K, D); RoPE tables baked for the layer's static
    query/key lengths and cache offset.
    """
    d = cfg.d_model
    f32v = lambda v: jnp.asarray(v, F32).reshape(1, -1)
    mat = lambda m: jnp.asarray(m, dtype)

    out = [
        f32v(layer["norm_ff1"]["weight"]),
        mat(layer["ff1"]["lin1"]["w"]), f32v(layer["ff1"]["lin1"]["b"]),
        mat(layer["ff1"]["linv"]["w"]), f32v(layer["ff1"]["linv"]["b"]),
        mat(layer["ff1"]["lin2"]["w"]), f32v(layer["ff1"]["lin2"]["b"]),
        f32v(layer["norm_att"]["weight"]),
    ]
    h_heads = cfg.n_heads
    dh = d // h_heads

    def pad_cols(m):
        """(D, D) head-minor -> (D, H*PAD_DH): head h's dh columns land at
        lanes [h*PAD_DH, h*PAD_DH + dh)."""
        m = np.asarray(m, np.float32).reshape(d, h_heads, dh)
        out_m = np.zeros((d, h_heads, PAD_DH), np.float32)
        out_m[:, :, :dh] = m
        return out_m.reshape(d, h_heads * PAD_DH)

    def pad_rows(m):
        """(D, D) -> (H*PAD_DH, D) with zero pad rows."""
        m = np.asarray(m, np.float32).reshape(h_heads, dh, d)
        out_m = np.zeros((h_heads, PAD_DH, d), np.float32)
        out_m[:, :dh, :] = m
        return out_m.reshape(h_heads * PAD_DH, d)

    def pad_vec(v):
        v = np.asarray(v, np.float32).reshape(h_heads, dh)
        out_v = np.zeros((h_heads, PAD_DH), np.float32)
        out_v[:, :dh] = v
        return out_v.reshape(1, h_heads * PAD_DH)

    def pad_head_vec(v):
        """(dh,) per-head param -> (1, H*PAD_DH) tiled per head slot."""
        out_v = np.zeros((h_heads, PAD_DH), np.float32)
        out_v[:, :dh] = np.asarray(v, np.float32)[None, :]
        return out_v.reshape(1, h_heads * PAD_DH)

    def pad_rope(tbl_cos, tbl_sin, length):
        """(T, rope_dim) tables -> (T, H*PAD_DH): rope lanes get the table,
        pass-through lanes (rope_dim..dh) get cos=1/sin=0, pad lanes 0."""
        cos = np.zeros((length, h_heads, PAD_DH), np.float32)
        sin = np.zeros((length, h_heads, PAD_DH), np.float32)
        cos[:, :, cfg.rope_dim:dh] = 1.0
        cos[:, :, :cfg.rope_dim] = tbl_cos[:, None, :]
        sin[:, :, :cfg.rope_dim] = tbl_sin[:, None, :]
        return (cos.reshape(length, -1), sin.reshape(length, -1))

    if recompute:
        tkv = window + t
        cq, sq = _rope_tables(t, cfg.rope_dim, 0)
        ck, sk = _rope_tables(tkv, cfg.rope_dim, window)
        cos_q, sin_q = pad_rope(cq, sq, t)
        cos_k, sin_k = pad_rope(ck, sk, tkv)
        out += [
            mat(pad_cols(layer["att"]["linear_q"]["w"])),
            jnp.asarray(pad_vec(layer["att"]["linear_q"]["b"])),
            mat(pad_cols(layer["att"]["linear_k"]["w"])),
            jnp.asarray(pad_vec(layer["att"]["linear_k"]["b"])),
            jnp.asarray(pad_head_vec(layer["att"]["q_ln"]["scale"])),
            jnp.asarray(pad_head_vec(layer["att"]["q_ln"]["bias"])),
            jnp.asarray(pad_head_vec(layer["att"]["k_ln"]["scale"])),
            jnp.asarray(pad_head_vec(layer["att"]["k_ln"]["bias"])),
            jnp.asarray(cos_q), jnp.asarray(sin_q),
            jnp.asarray(cos_k), jnp.asarray(sin_k),
        ]
    out += [
        mat(pad_cols(layer["att"]["linear_v"]["w"])),
        jnp.asarray(pad_vec(layer["att"]["linear_v"]["b"])),
        mat(pad_rows(layer["att"]["linear_out"]["w"])),
        f32v(layer["att"]["linear_out"]["b"]),
        f32v(layer["norm_conv"]["weight"]),
        mat(layer["conv"]["pw1"]["w"]), f32v(layer["conv"]["pw1"]["b"]),
        mat(jnp.asarray(layer["conv"]["dw"]["w"])[:, 0, :].T),  # (K, D)
        f32v(layer["conv"]["dw"]["b"]),
    ]
    bn = layer["conv"]["bn"]
    bn_stats = stats["conv_bn"]
    scale = jnp.asarray(bn["scale"], F32) * jax.lax.rsqrt(jnp.asarray(bn_stats["var"], F32) + 1e-5)
    shift = jnp.asarray(bn["bias"], F32) - jnp.asarray(bn_stats["mean"], F32) * scale
    out += [
        scale.reshape(1, -1), shift.reshape(1, -1),
        mat(layer["conv"]["pw2"]["w"]), f32v(layer["conv"]["pw2"]["b"]),
        f32v(layer["norm_ff2"]["weight"]),
        mat(layer["ff2"]["lin1"]["w"]), f32v(layer["ff2"]["lin1"]["b"]),
        mat(layer["ff2"]["linv"]["w"]), f32v(layer["ff2"]["linv"]["b"]),
        mat(layer["ff2"]["lin2"]["w"]), f32v(layer["ff2"]["lin2"]["b"]),
        f32v(layer["norm_out"]["weight"]),
    ]
    assert d == cfg.d_model
    return out


N_WEIGHTS_BASE = 25  # without the recompute-only block
N_WEIGHTS_RECOMPUTE = 12


# ---------------------------------------------------------------------------
# Kernel body.
# ---------------------------------------------------------------------------


def _rms(x, w):
    """RMSNorm, fp32 math, returns bf16 (matches core.layers.rmsnorm)."""
    x32 = x.astype(F32)
    d = x.shape[-1]
    rms = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True)) / np.sqrt(d)
    return (w.reshape(-1).astype(F32) * (x32 / (rms + 1e-8))).astype(BF16)


def _ln(x, scale, bias):
    x32 = x.astype(F32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return y * scale.reshape(-1) + bias.reshape(-1)


def _mm(x, w, b):
    """bf16 matmul with fp32 accumulation + fp32 bias add; returns fp32."""
    y = jnp.dot(x.astype(BF16), w[:], preferred_element_type=F32)
    return y + b[:].reshape(-1)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _rope_apply(x, cos, sin, rope_dim):
    """x: (BT, H, T, dh) fp32; cos/sin: (T, rope_dim)."""
    half = rope_dim // 2
    x_rope = x[..., :rope_dim]
    x_pass = x[..., rope_dim:]
    x1, x2 = x_rope[..., :half], x_rope[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[:][None, None, :, :]
    s = sin[:][None, None, :, :]
    return jnp.concatenate([x_rope * c + rotated * s, x_pass], axis=-1)


def _make_kernel(*, bt: int, t: int, d: int, d_ff: int, n_heads: int,
                 rope_dim: int, window: int, recompute: bool, conv_k: int):
    """Build the fused layer kernel for one static configuration."""
    tkv = window + t
    dh = d // n_heads
    inv_sqrt_dh = 1.0 / np.sqrt(dh)

    def kernel(*refs):
        idx = 0

        def take(n=1):
            nonlocal idx
            out = refs[idx:idx + n]
            idx += n
            return out if n > 1 else out[0]

        x_ref = take()
        conv_state_ref = take()
        win_ref = take() if window else None
        invalid_ref = take() if window else None  # (BT, 1) int32
        scores_in_ref = None if recompute else take()

        w_nff1 = take()
        w1, b1, wv1, bv1, w2, b2 = take(6)
        w_natt = take()
        if recompute:
            wq, bq, wk, bk, qln_s, qln_b, kln_s, kln_b = take(8)
            cos_q, sin_q, cos_k, sin_k = take(4)
        wv_att, bv_att, wout, bout = take(4)
        w_nconv = take()
        pw1_w, pw1_b, dw_w, dw_b, bn_scale, bn_shift, pw2_w, pw2_b = take(8)
        w_nff2 = take()
        f2w1, f2b1, f2wv, f2bv, f2w2, f2b2 = take(6)
        w_nout = take()

        y_ref = take()
        new_conv_ref = take()
        new_win_ref = take() if window else None
        scores_out_ref = take() if recompute else None

        x = x_ref[:].astype(BF16)  # (BT, T, D)

        # ---- feed-forward 1 (Macaron half) ----
        h = _rms(x, w_nff1[:]).reshape(bt * t, d)
        g = _silu(_mm(h, w1, b1)) * _mm(h, wv1, bv1)
        y = _mm(g, w2, b2).reshape(bt, t, d)
        res = x + (0.5 * y).astype(BF16)

        # ---- rotary MHSA ----
        a = _rms(res, w_natt[:])  # (BT, T, D) bf16 — pre-projection activations
        if window:
            win = win_ref[:].astype(BF16)  # (BT, W, D)
            kv = jnp.concatenate([win, a], axis=1)  # (BT, Tkv, D)
            new_win_ref[:] = jnp.concatenate([win[:, t:, :], a], axis=1).astype(
                new_win_ref.dtype)
        else:
            kv = a

        # Heads live in PAD_DH(=128)-lane slots: q/k/v projections are
        # pre-padded to (D, H*128) so all per-head math is lane-block-local
        # (Mosaic cannot split the lane dim at 48).  Per-head LayerNorm uses
        # masked statistics over the dh valid lanes; RoPE is expressed with
        # padded cos/sin tables plus a +-rope_dim/2 lane roll.
        hp = n_heads * PAD_DH
        half = rope_dim // 2
        lane4 = lambda length: jax.lax.broadcasted_iota(
            jnp.int32, (bt, length, n_heads, PAD_DH), 3)

        def head_ln(y4, scale, bias, length):
            lane = lane4(length)
            valid = lane < dh
            y32 = jnp.where(valid, y4, 0.0)
            mean = jnp.sum(y32, axis=-1, keepdims=True) / dh
            var = jnp.sum(jnp.where(valid, jnp.square(y4 - mean), 0.0),
                          axis=-1, keepdims=True) / dh
            normed = (y4 - mean) * jax.lax.rsqrt(var + 1e-5)
            return jnp.where(
                valid,
                normed * scale[:].reshape(n_heads, PAD_DH)
                + bias[:].reshape(n_heads, PAD_DH),
                0.0)

        def head_rope(y4, cos, sin, length):
            lane = lane4(length)
            c = cos[:].reshape(1, length, n_heads, PAD_DH)
            sn = sin[:].reshape(1, length, n_heads, PAD_DH)
            rolled_m = pltpu.roll(y4, PAD_DH - half, 3)  # x[l + half]
            rolled_p = pltpu.roll(y4, half, 3)           # x[l - half]
            rot = jnp.where(lane < half, -rolled_m,
                            jnp.where(lane < rope_dim, rolled_p, 0.0))
            return y4 * c + rot * sn

        if recompute:
            q = _mm(a.reshape(bt * t, d), wq, bq).reshape(bt, t, n_heads, PAD_DH)
            k = _mm(kv.reshape(bt * tkv, d), wk, bk).reshape(bt, tkv, n_heads, PAD_DH)
            q = head_ln(q, qln_s, qln_b, t)
            k = head_ln(k, kln_s, kln_b, tkv)
            q = head_rope(q, cos_q, sin_q, t).astype(BF16)
            k = head_rope(k, cos_k, sin_k, tkv).astype(BF16)

        v = _mm(kv.reshape(bt * tkv, d), wv_att, bv_att).reshape(
            bt, tkv, n_heads, PAD_DH).astype(BF16)

        if window:
            invalid = invalid_ref[:]  # (BT, 1): number of invalid leading keys
            cols = jax.lax.broadcasted_iota(jnp.int32, (bt, t, tkv), 2)
            mask = cols < invalid[:, :, None]  # (BT, T, Tkv)

        ctx_scratch = refs[-1]
        for head in range(n_heads):
            if recompute:
                s_h = jax.lax.dot_general(
                    q[:, :, head, :], k[:, :, head, :],
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=F32,
                ) * inv_sqrt_dh  # (BT, T, Tkv)
                scores_out_ref[:, head, :, :] = s_h
            else:
                s_h = scores_in_ref[:, head, :, :]
            s_h = s_h.astype(F32)
            if window:
                s_h = jnp.where(mask, jnp.float32(-10000.0), s_h)
                attn = jax.nn.softmax(s_h, axis=-1)
                attn = jnp.where(mask, 0.0, attn)
            else:
                attn = jax.nn.softmax(s_h, axis=-1)
            ctx_h = jax.lax.dot_general(
                attn.astype(BF16), v[:, :, head, :],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=F32,
            )  # (BT, T, PAD_DH)
            ctx_scratch[:, :, head, :] = ctx_h
        ctx = ctx_scratch[:].reshape(bt * t, hp)
        out = _mm(ctx, wout, bout).reshape(bt, t, d)
        res = res + out.astype(BF16)

        # ---- conv module ----
        c = _rms(res, w_nconv[:]).reshape(bt * t, d)
        p1 = _mm(c, pw1_w, pw1_b)  # (BT*T, 2D)
        gl = (p1[:, :d] * jax.nn.sigmoid(p1[:, d:])).astype(BF16).reshape(bt, t, d)
        padded = jnp.concatenate([conv_state_ref[:].astype(BF16), gl], axis=1)
        new_conv_ref[:] = padded[:, t:, :].astype(new_conv_ref.dtype)
        acc = jnp.zeros((bt, t, d), F32)
        for k_tap in range(conv_k):
            w_tap = dw_w[k_tap, :]
            acc = acc + padded[:, k_tap:k_tap + t, :].astype(F32) * w_tap.astype(F32)
        acc = acc + dw_b[:].reshape(-1)
        y = _silu(acc * bn_scale[:].reshape(-1) + bn_shift[:].reshape(-1))
        y = _mm(y.reshape(bt * t, d), pw2_w, pw2_b).reshape(bt, t, d)
        res = res + y.astype(BF16)

        # ---- feed-forward 2 ----
        h = _rms(res, w_nff2[:]).reshape(bt * t, d)
        g = _silu(_mm(h, f2w1, f2b1)) * _mm(h, f2wv, f2bv)
        y = _mm(g, f2w2, f2b2).reshape(bt, t, d)
        res = res + (0.5 * y).astype(BF16)

        y_ref[:] = _rms(res, w_nout[:]).astype(y_ref.dtype)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrapper.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("t", "d", "d_ff", "n_heads", "rope_dim", "window",
                     "recompute", "conv_k", "block_b", "interpret"),
)
def fused_conformer_layer(
    x: jnp.ndarray,  # (B, T, D)
    conv_state: jnp.ndarray,  # (B, K-1, D)
    mhsa_win: jnp.ndarray | None,  # (B, W, D) or None
    invalid_prefix: jnp.ndarray | None,  # (B, 1) int32 or None
    scores_in: jnp.ndarray | None,  # (B, H, T, Tkv) or None
    weights: tuple,
    *,
    t: int, d: int, d_ff: int, n_heads: int, rope_dim: int,
    window: int, recompute: bool, conv_k: int, block_b: int = 64,
    interpret: bool = False,
):
    """Run one fused Conformer layer over a batch of streams.

    Returns (y, new_conv_state, new_win | None, scores | None).
    """
    b = x.shape[0]
    assert b % block_b == 0, (b, block_b)
    grid = (b // block_b,)
    tkv = window + t

    def tile(shape):  # batch-tiled operand
        return pl.BlockSpec((block_b, *shape), lambda i: (i, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    def whole(arr):  # weights: same block each grid step (stays resident)
        return pl.BlockSpec(arr.shape, lambda i: tuple([0] * arr.ndim),
                            memory_space=pltpu.VMEM)

    inputs = [x, conv_state]
    in_specs = [tile((t, d)), tile((conv_k - 1, d))]
    if window:
        inputs += [mhsa_win, invalid_prefix]
        in_specs += [tile((window, d)), tile((1,))]
    if not recompute:
        inputs.append(scores_in)
        in_specs.append(tile((n_heads, t, tkv)))
    inputs += list(weights)
    in_specs += [whole(w) for w in weights]

    out_shape = [
        jax.ShapeDtypeStruct((b, t, d), x.dtype),
        jax.ShapeDtypeStruct((b, conv_k - 1, d), conv_state.dtype),
    ]
    out_specs = [tile((t, d)), tile((conv_k - 1, d))]
    if window:
        out_shape.append(jax.ShapeDtypeStruct((b, window, d), mhsa_win.dtype))
        out_specs.append(tile((window, d)))
    if recompute:
        out_shape.append(jax.ShapeDtypeStruct((b, n_heads, t, tkv), F32))
        out_specs.append(tile((n_heads, t, tkv)))

    kernel = _make_kernel(bt=block_b, t=t, d=d, d_ff=d_ff, n_heads=n_heads,
                          rope_dim=rope_dim, window=window, recompute=recompute,
                          conv_k=conv_k)
    from tone_tpu.ops.fused_layer import PAD_DH as _pad_dh

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_b, t, n_heads, _pad_dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    y, new_conv = outs[0], outs[1]
    new_win = outs[2] if window else None
    scores = outs[2 + bool(window)] if recompute else scores_in
    return y, new_conv, new_win, scores
