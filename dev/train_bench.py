"""Measure 71M CTC train-step throughput on the current backend.

The reference's training story is an HF Trainer recipe on a single GPU
(reference examples/finetune_example.ipynb); it publishes no training
throughput.  This benchmark puts a number on the TPU-native trainer
(tone_tpu/training/train.py): steady-state wall time of the jitted,
donated train step for the production ToneConfig at a realistic
fine-tuning shape, reported as audio-seconds consumed per second — the
same unit as the serving RTFx headline, so the two budgets compare
directly.

Usage::

    python dev/train_bench.py [--batch 16] [--seconds 10] [--steps 8]
    python dev/train_bench.py --cpu   # 8 virtual devices, dp over CPU
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--seconds", type=float, default=10.0,
                        help="clip length per sample (8 kHz)")
    parser.add_argument("--label-len", type=int, default=100)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--grad-accum", type=int, default=1)
    parser.add_argument("--remat", choices=["dots", "full"], default=None)
    parser.add_argument("--no-blocked-attention", action="store_true",
                        help="masked (T,T) offline attention (the pre-"
                             "blocked baseline) instead of mhsa_blocked")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import os

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tone_tpu.config import LABELS, ToneConfig
    from tone_tpu.core.model import init_model_params
    from tone_tpu.training.train import Trainer, TrainerConfig

    cfg = ToneConfig()
    rng = np.random.default_rng(0)
    n_samples = int(args.seconds * cfg.frontend.sample_rate)
    batch = {
        "input_values": rng.normal(0, 0.1,
                                   (args.batch, n_samples)).astype(np.float32),
        "input_lengths": np.full(args.batch, n_samples, np.int32),
        "labels": rng.integers(0, len(LABELS),
                               (args.batch, args.label_len)).astype(np.int32),
    }

    # Stage the batch on device once: the dev-chip tunnel adds a ~250 ms
    # synchronous RTT to every host->device transfer, which would swamp the
    # step time (a real input pipeline overlaps transfers with compute).
    batch = jax.device_put(batch)
    jax.block_until_ready(batch)

    trainer = Trainer(cfg, TrainerConfig(
        grad_accum_steps=args.grad_accum, remat=args.remat,
        blocked_attention=not args.no_blocked_attention))
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    state = trainer.create_state(variables)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))

    t0 = time.monotonic()
    state, loss = trainer.train_step(state, batch)   # compile
    float(loss)                                      # forced host sync
    compile_s = time.monotonic() - t0

    # Two-point-slope timing with a forced host transfer at the end of
    # each chain: the tunneled dev chip acks block_until_ready before the
    # compute drains (see bench.py / tone_tpu.profiling.step_stats), so a
    # naive per-step block undercounts badly.
    def chain(n: int) -> float:
        nonlocal state
        t0 = time.monotonic()
        loss = None
        for _ in range(n):
            state, loss = trainer.train_step(state, batch)
        float(loss)
        return time.monotonic() - t0

    chain(2)  # settle donation
    n1, n2 = args.steps, 3 * args.steps
    t1 = min(chain(n1) for _ in range(2))
    t2 = min(chain(n2) for _ in range(2))
    step_s = max((t2 - t1) / (n2 - n1), 1e-9)

    audio_s = args.batch * args.seconds
    print(json.dumps({
        "params_m": round(n_params / 1e6, 1),
        "devices": jax.device_count(),
        "batch": args.batch,
        "clip_s": args.seconds,
        "step_ms": round(step_s * 1e3, 1),
        "audio_s_per_s": round(audio_s / step_s, 1),
        "samples_per_s": round(args.batch / step_s, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(float(loss), 3),
    }))


if __name__ == "__main__":
    main()
