"""Fused GLU -> output-projection matmul for the Conformer feed-forward.

The serving feed-forward is ``lin2(silu(a) * v)`` with ``(a, v)`` the two
halves of the merged in-projection output (reference conformer_blocks.py
:468-482; merged projection in acoustic.cast_params_for_inference).  Under
plain XLA the gated product ``silu(a) * v`` is a fusion output that crosses
the matmul boundary through HBM — at (B=1024, T=10, F=1536) that is a
31.5 MB round trip per feed-forward, x32 per step (two Macaron halves x16
layers), on a step that is bandwidth-bound (docs/performance.md).

This kernel computes the gate on-chip and feeds the MXU directly: HBM
traffic per feed-forward drops from read(av) + write(g) + read(g) +
write(out) to read(av) + write(out).  The contraction (F) fits one VMEM
block, so the grid is a 1-D sweep over row tiles and the weight block stays
resident; Mosaic double-buffers the row-tile DMAs.

Numerics match the XLA path (bf16 gate — fp32 sigmoid inside the kernel,
Mosaic has no bf16 logistic — bf16 x bf16 -> fp32 matmul accumulation, fp32
bias add; tests/test_glu_ff.py).

STATUS — measured on a v5e chip in the full streaming step (bench.py A/B
via TONE_TPU_FUSED_GLU_FF): **slower than XLA**, 24.8 vs 16.9 ms/step at
B=1024 (12.4k vs 18.2k RTFx), consistent at B=128/512.  Same conclusion as
the whole-layer kernel (ops/fused_layer.py): each pallas_call is an opaque
scheduling barrier, so the 32 per-step kernel launches forfeit the
cross-fusion overlap XLA gets on this bandwidth-bound graph — the saved
31.5 MB/FF round trip does not pay for the lost pipelining.  Kept as a
documented, parity-tested experiment; opt in with TONE_TPU_FUSED_GLU_FF=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["glu_ff2", "glu_ff2_reference", "fused_glu_ff2_enabled"]


def _kernel(av_ref, w_ref, b_ref, o_ref, *, f: int):
    a = av_ref[:, :f].astype(jnp.float32)  # Mosaic has no bf16 logistic
    v = av_ref[:, f:]
    g = (a * jax.nn.sigmoid(a)).astype(v.dtype) * v
    y = jnp.dot(g, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (y + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def glu_ff2_reference(av: jnp.ndarray, p2, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """The plain-XLA computation the kernel replaces (used for parity)."""
    from tone_tpu.core import layers as L

    a, v = jnp.split(av, 2, axis=-1)
    return L.linear(p2, L.silu(a) * v, compute_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def _glu_ff2_2d(av, w, b, *, block_m: int, interpret: bool):
    m, two_f = av.shape
    f, d = w.shape
    return pl.pallas_call(
        functools.partial(_kernel, f=f),
        grid=(pl.cdiv(m, block_m),),
        in_specs=[
            pl.BlockSpec((block_m, two_f), lambda i: (i, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), av.dtype),
        interpret=interpret,
    )(av, w, b)


def glu_ff2(av: jnp.ndarray, p2, compute_dtype=jnp.bfloat16, *,
            block_m: int = 512, interpret: bool = False) -> jnp.ndarray:
    """``lin2(silu(av[..., :F]) * av[..., F:])`` without materializing the
    gated product in HBM.  ``av``: (..., 2F); ``p2``: ``{"w": (F, D), "b": (D,)}``.
    """
    *lead, two_f = av.shape
    f, d = p2["w"].shape
    assert two_f == 2 * f, (av.shape, p2["w"].shape)
    m = int(np.prod(lead)) if lead else 1
    av2 = av.astype(compute_dtype).reshape(m, two_f)
    w = p2["w"].astype(compute_dtype)
    b = p2["b"].astype(jnp.float32).reshape(1, d)
    # Small batches: one tile, padded up to the bf16 sublane quantum.
    bm = min(block_m, max(16, -(-m // 16) * 16))
    out = _glu_ff2_2d(av2, w, b, block_m=bm, interpret=interpret)
    return out.reshape(*lead, d)


def fused_glu_ff2_enabled() -> bool:
    """Opt-in switch for the fused serving feed-forward
    (``TONE_TPU_FUSED_GLU_FF=1``).  Default off: measured slower than XLA's
    pipelined schedule (see STATUS above), and Pallas calls are opaque to
    the GSPMD auto-partitioner, so multi-device steps must keep the plain
    XLA path regardless.
    """
    import os

    return os.environ.get("TONE_TPU_FUSED_GLU_FF", "0") not in ("0", "false", "")
