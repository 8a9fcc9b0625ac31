"""Block-diagonal offline attention ≡ the full-mask offline path.

``mhsa_blocked`` computes the chunk-simulating attention as dense
per-chunk blocks; every key the (T, T) mask allows is inside the block
window and every excluded key underflows to exactly 0.0 in the fp32
softmax, so the two paths must agree to compute-dtype rounding — for
ragged valid lengths and for T that is not a chunk multiple.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tone_tpu.core.model import apply_offline, init_model_params

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
from train_tiny_e2e import tiny_config  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    return cfg, variables


def _run(cfg, variables, audio, lengths, blocked, training=False, rng=None):
    lp, out_len, stats = apply_offline(
        variables, cfg, jnp.asarray(audio),
        jnp.asarray(lengths) if lengths is not None else None,
        rng=rng, training=training, blocked_attention=blocked)
    return np.asarray(lp), np.asarray(out_len), stats


@pytest.mark.parametrize("n_samples", [12000, 13310])
def test_blocked_matches_masked_offline(tiny, n_samples):
    cfg, variables = tiny
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, (3, n_samples)).astype(np.float32)
    lengths = np.array([n_samples, n_samples - 2400, 5000], np.int32)

    lp_m, len_m, _ = _run(cfg, variables, audio, lengths, blocked=False)
    lp_b, len_b, _ = _run(cfg, variables, audio, lengths, blocked=True)

    np.testing.assert_array_equal(len_m, len_b)
    # identical math modulo bf16 matmul association; fp32 head output
    for row, n in enumerate(len_m):
        np.testing.assert_allclose(lp_b[row, :n], lp_m[row, :n],
                                   atol=2e-3, rtol=1e-3)


def test_blocked_matches_masked_training_mode(tiny):
    """training=True exercises batch-stat updates; dropout must be disabled
    (rate 0 in the tiny config) for a deterministic comparison."""
    cfg, variables = tiny
    rng = np.random.default_rng(1)
    audio = rng.normal(0, 0.1, (2, 9600)).astype(np.float32)
    lengths = np.array([9600, 7200], np.int32)
    key = jax.random.PRNGKey(0)

    lp_m, _, st_m = _run(cfg, variables, audio, lengths, blocked=False,
                         training=True, rng=key)
    lp_b, _, st_b = _run(cfg, variables, audio, lengths, blocked=True,
                         training=True, rng=key)
    np.testing.assert_allclose(lp_b, lp_m, atol=2e-3, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st_m), jax.tree.leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_blocked_gradients_match(tiny):
    """The training step's backward must agree too: CTC-style scalar loss,
    gradient wrt params compared across the two attention paths."""
    cfg, variables = tiny
    rng = np.random.default_rng(2)
    audio = jnp.asarray(rng.normal(0, 0.1, (2, 7200)).astype(np.float32))
    lengths = jnp.asarray(np.array([7200, 4800], np.int32))

    def loss(params, blocked):
        lp, out_len, _ = apply_offline(
            {"params": params, "batch_stats": variables["batch_stats"]},
            cfg, audio, lengths, blocked_attention=blocked)
        mask = jnp.arange(lp.shape[1])[None, :] < out_len[:, None]
        return jnp.sum(lp.astype(jnp.float32) * mask[..., None] ** 2) / 1e3

    g_m = jax.grad(lambda p: loss(p, False))(variables["params"])
    g_b = jax.grad(lambda p: loss(p, True))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)
