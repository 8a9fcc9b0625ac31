"""Fused Conformer-layer kernel: equivalence with the XLA path.

Runs in Pallas interpret mode on CPU (the kernel itself is exercised on real
TPU by bench/serving); asserts the fused streaming step matches the XLA
streaming step within bf16 tolerance across several chunks, including the
stateful layers' first-chunk masking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import apply_streaming, init_model_params, init_streaming_state
from tone_tpu.ops.fused_encoder import apply_streaming_fused, prepare_fused_params


@pytest.mark.slow
def test_fused_streaming_matches_xla():
    cfg = ToneConfig(compute_dtype="bfloat16")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    plan = prepare_fused_params(variables, cfg)

    b = 2
    rng = np.random.default_rng(0)
    state_a = init_streaming_state(cfg, b)
    state_b = init_streaming_state(cfg, b)
    for _ in range(4):
        chunk = jnp.asarray(rng.integers(-20000, 20000, (b, 2400)), jnp.int32)
        lp_ref, state_a = apply_streaming(variables, cfg, chunk, state_a)
        lp_fus, state_b = apply_streaming_fused(
            variables, plan, cfg, chunk, state_b, block_b=b, interpret=True)
        assert float(jnp.abs(lp_ref - lp_fus).max()) < 0.1
    # states agree too (same tolerance class)
    for leaf_a, leaf_b in zip(jax.tree.leaves(state_a), jax.tree.leaves(state_b)):
        assert float(jnp.abs(leaf_a.astype(jnp.float32)
                             - leaf_b.astype(jnp.float32)).max()) < 0.1
