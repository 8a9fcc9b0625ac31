"""Engine tick microbenchmark: host-side cost at high stream counts.

Measures MultiStreamEngine.tick() broken into device step vs host work
(staging + vectorized splitter + bookkeeping) at a given slot count — the
serving scalability budget (300 ms per tick).  Run:

    python dev/tick_bench.py --slots 1024 --ticks 30 [--speech-frac 0.3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def splitter_worst_case(slots: int, phrase_ticks: int) -> None:
    """Worst-case host tick for the batched splitter: EVERY slot closes a
    phrase on the same tick (synchronized utterance ends — what fixed-length
    load-test clients produce).  No device in the loop: this isolates the
    `machinery` branch of BatchLogprobSplitter.forward_batch.
    """
    from tone_tpu.splitter import BatchLogprobSplitter, StreamingLogprobSplitter

    split = BatchLogprobSplitter(slots)
    v = 35
    frames = 10  # per tick (300 ms)
    speech = np.full((frames, v), -8.0, np.float32)
    speech[:, 3] = -0.05          # confident character -> is_speech
    speech[:, -2:] = -12.0
    silence = np.full((frames, v), -8.0, np.float32)
    silence[:, -2:] = -0.7        # blank+space mass (p=0.99) -> silence
    slot_ids = np.arange(slots, dtype=np.int64)
    lasts = np.zeros(slots, bool)

    def tick(frame_block):
        batch = np.broadcast_to(frame_block, (slots, frames, v)).copy()
        t0 = time.monotonic()
        out = split.forward_batch(batch, slot_ids, lasts)
        return time.monotonic() - t0, out

    steady, boundary, n_phrases = [], None, 0
    # grow a phrase in every slot, then silence until every slot closes
    for _ in range(phrase_ticks):
        dt, _ = tick(speech)
        steady.append(dt)
    need = StreamingLogprobSplitter.MIN_SILENCE_DURATION // frames + 2
    for _ in range(need):
        dt, out = tick(silence)
        if out:
            boundary = dt
            n_phrases = sum(len(v) for v in out.values())
            break
        steady.append(dt)
    assert boundary is not None, "no phrases closed — bench setup broken"
    report = {
        "slots": slots,
        "phrase_frames": phrase_ticks * frames,
        "steady_ms_p50": round(float(np.percentile(steady, 50)) * 1e3, 2),
        "boundary_tick_ms": round(boundary * 1e3, 2),
        "phrases_closed": n_phrases,
        "budget_ms": 300.0,
    }
    print(json.dumps(report))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--slots", type=int, default=1024)
    parser.add_argument("--ticks", type=int, default=30)
    parser.add_argument("--speech-frac", type=float, default=0.3,
                        help="fraction of streams in active speech per tick")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--splitter-worst", action="store_true",
                        help="device-free worst case: all slots close a "
                             "phrase on the same tick")
    parser.add_argument("--phrase-ticks", type=int, default=40,
                        help="phrase length in ticks before the "
                             "synchronized close (with --splitter-worst)")
    args = parser.parse_args()

    if args.splitter_worst:
        splitter_worst_case(args.slots, args.phrase_ticks)
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tone_tpu.config import ToneConfig
    from tone_tpu.core.model import init_model_params
    from tone_tpu.runtime.engine import MultiStreamEngine

    config = ToneConfig()
    variables = init_model_params(jax.random.PRNGKey(0), config)
    engine = MultiStreamEngine(variables, config, n_slots=args.slots)
    print(f"compiling {args.slots}-slot step...", file=sys.stderr)
    engine.arena.warmup()

    rng = np.random.default_rng(0)
    sids = [engine.open_stream() for _ in range(args.slots)]
    n = config.audio_chunk_samples
    # speech-like chunks for a fraction of streams, silence for the rest
    t = np.arange(n) / 8000
    speech = (8000 * np.sin(2 * np.pi * 300 * t)).astype(np.int32)
    silence = np.zeros(n, np.int32)

    host, device, total = [], [], []
    for tick in range(args.ticks):
        for i, sid in enumerate(sids):
            talking = rng.random() < args.speech_frac
            engine.feed(sid, speech if talking else silence)
        engine.tick()
        if tick >= 3:  # skip warmup ticks
            host.append(engine.stats.last_host_seconds)
            device.append(engine.stats.last_tick_seconds - engine.stats.last_host_seconds)
            total.append(engine.stats.last_tick_seconds)

    report = {
        "slots": args.slots,
        "speech_frac": args.speech_frac,
        "host_ms_p50": round(float(np.percentile(host, 50)) * 1e3, 2),
        "host_ms_p95": round(float(np.percentile(host, 95)) * 1e3, 2),
        "device_ms_p50": round(float(np.percentile(device, 50)) * 1e3, 2),
        "tick_ms_p50": round(float(np.percentile(total, 50)) * 1e3, 2),
        "tick_budget_ms": 300.0,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
