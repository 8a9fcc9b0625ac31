"""Parity test for the fused GLU->FF2 Pallas experiment (ops/glu_ff.py).

The kernel is off by default (measured slower than XLA's schedule — see the
module STATUS); this pins its numerics so the documented experiment stays
runnable.  Uses the Pallas interpreter on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.ops.glu_ff import fused_glu_ff2_enabled, glu_ff2, glu_ff2_reference


@pytest.mark.parametrize("m", [10, 160, 1280])
def test_glu_ff2_matches_xla(m):
    key = jax.random.PRNGKey(0)
    f, d = 256, 128
    ks = jax.random.split(key, 3)
    p2 = {"w": jax.random.normal(ks[0], (f, d), jnp.bfloat16) * 0.05,
          "b": jax.random.normal(ks[1], (d,), jnp.float32) * 0.01}
    av = jax.random.normal(ks[2], (4, m // 2 if m > 10 else 5, 2 * f),
                           jnp.bfloat16)
    ref = glu_ff2_reference(av, p2)
    fused = glu_ff2(av, p2, interpret=True)
    assert fused.shape == ref.shape and fused.dtype == ref.dtype
    # identical matmul/bias path; gate differs only by fp32-vs-bf16 sigmoid
    np.testing.assert_allclose(
        fused.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=0)


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("TONE_TPU_FUSED_GLU_FF", raising=False)
    assert not fused_glu_ff2_enabled()
    monkeypatch.setenv("TONE_TPU_FUSED_GLU_FF", "1")
    assert fused_glu_ff2_enabled()
    monkeypatch.setenv("TONE_TPU_FUSED_GLU_FF", "0")
    assert not fused_glu_ff2_enabled()
