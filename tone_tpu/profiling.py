"""Profiling and tracing helpers — the trtexec/perf_analyzer counterpart.

The reference delegates performance analysis to trtexec and Triton's
perf_analyzer (docs/performance_testing.md).  Here:

* :func:`trace` — capture a device trace viewable in TensorBoard/Perfetto
  (``jax.profiler``) around any code block;
* :func:`step_stats` — steady-state latency/throughput of the streaming step
  at a given stream count (the trtexec "--duration --avgRuns" equivalent),
  using the two-point-slope method that stays honest on remote/tunneled
  backends;
* ``dev/load_test.py`` — the serving-level sweep (client side).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tone_tpu_trace"):
    """Capture a jax.profiler device trace around the with-block.

    View with: tensorboard --logdir <log_dir>  (or open in Perfetto).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepStats:
    batch: int
    seconds_per_step: float
    rtfx: float
    chunk_latency_ms: float


def step_stats(model, batch: int, steps: tuple[int, int] = (20, 120)) -> StepStats:
    """Steady-state stats of ``model.forward_native`` at a stream count."""
    chunk = jnp.asarray(
        np.random.default_rng(0).integers(-20000, 20000, (batch, 2400)), jnp.int32)

    def chain(n):
        state = model.init_state(batch)
        t0 = time.perf_counter()
        for _ in range(n):
            logprobs, state = model.forward_native(chunk, state)
        float(jnp.sum(logprobs))  # forced sync
        return time.perf_counter() - t0

    chain(5)
    n1, n2 = steps
    t1 = min(chain(n1) for _ in range(2))
    t2 = min(chain(n2) for _ in range(2))
    sec = max((t2 - t1) / (n2 - n1), 1e-9)
    return StepStats(batch=batch, seconds_per_step=sec,
                     rtfx=batch * 0.3 / sec, chunk_latency_ms=sec * 1000)
