"""Batched forced-alignment benchmark: device (align_words_batch) vs host
(align_words) throughput on realistic phrase shapes.

The serving engine aligns word times on the host decode pool
(~1.5 ms/typical phrase); the batched device path exists for bulk
transcription (`transcribe --batch-size`, `tone_tpu align`).  This measures
both on whatever backend JAX resolves (the tunneled TPU when up, CPU
otherwise).  Run:

    python dev/align_bench.py [--batch 64] [--frames 200] [--words 8] [--iters 20]

Readback of the word tuples forces a real device sync, so naive wall-clock
is sound here (unlike raw step timing on the tunneled chip — see AGENTS.md).
On the tunneled dev chip the end-to-end number is dominated by the
host↔device round trip (~250 ms RTT per call), not by the DP: pass
``--kernel`` to also time the jitted Viterbi alone with staged device
inputs and two-point-slope chaining (the bench.py method) — that is the
number a locally-attached chip's end-to-end cost converges to.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_phrases(batch: int, frames: int, words: int, seed: int = 0):
    """Feasible (logprobs, text) pairs with realistic shapes: random
    acoustics (alignment cost doesn't depend on their values) and
    `words`-word texts drawn from a small lexicon."""
    from tone_tpu.config import LABELS

    rng = np.random.default_rng(seed)
    lexicon = ["да", "нет", "алло", "привет", "дом", "мир", "дата", "центр",
               "сан", "заказ", "номер", "карта"]
    texts, lps = [], []
    for _ in range(batch):
        text = " ".join(rng.choice(lexicon) for _ in range(words))
        needed = 2 * len(text) + 1
        t = max(frames, needed + 8)
        logits = rng.normal(0.0, 2.0, (t, len(LABELS) + 1))
        lp = (logits - np.log(np.exp(logits).sum(-1, keepdims=True))
              ).astype(np.float32)
        texts.append(text)
        lps.append(lp)
    return lps, texts


def main() -> None:
    import os

    if os.environ.get("TONE_TPU_FORCE_CPU"):
        # Env-var JAX_PLATFORMS can be overridden by site plugins that select
        # their platform programmatically; this forces CPU reliably.
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=200,
                    help="frames per phrase (200 = 6 s of audio)")
    ap.add_argument("--words", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--kernel", action="store_true",
                    help="also time the jitted Viterbi DP alone "
                         "(staged device inputs, two-point slope)")
    args = ap.parse_args()

    import jax

    from tone_tpu.align import align_words
    from tone_tpu.ops.align_device import align_words_batch

    lps, texts = make_phrases(args.batch, args.frames, args.words)
    audio_s = sum(lp.shape[0] for lp in lps) * 0.03

    # warmup compiles every (T, S) bucket this batch hits
    device_out = align_words_batch(lps, texts)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        device_out = align_words_batch(lps, texts)
    dt_dev = (time.perf_counter() - t0) / args.iters

    t0 = time.perf_counter()
    host_out = [align_words(lp, tx) for lp, tx in zip(lps, texts)]
    dt_host = time.perf_counter() - t0

    kernel = {}
    if args.kernel:
        import jax.numpy as jnp

        from tone_tpu.ops.align_device import (_bucket, _extended_labels,
                                               _stage_bucket, _viterbi_path)

        exts = [_extended_labels(tx) for tx in texts]
        t_pad = _bucket(max(lp.shape[0] for lp in lps))
        s_pad = _bucket(max(e.size for e in exts))
        staged = _stage_bucket(lps, exts, list(range(len(lps))), t_pad, s_pad)
        lp_d, ext_d, skip_d, sl_d, tl_d = map(jnp.asarray, staged)

        def chain(n):
            t0 = time.perf_counter()
            path = None
            for _ in range(n):
                path, _score = _viterbi_path(lp_d, ext_d, skip_d, sl_d, tl_d)
            float(path.sum())  # forced sync
            return time.perf_counter() - t0

        chain(3)
        n1, n2 = 5, 25
        t1 = min(chain(n1) for _ in range(2))
        t2 = min(chain(n2) for _ in range(2))
        dt_k = max((t2 - t1) / (n2 - n1), 1e-9)
        kernel = {
            "kernel_ms_per_batch": round(dt_k * 1e3, 2),
            "kernel_phrases_per_s": round(args.batch / dt_k, 1),
            "kernel_audio_rtfx": round(audio_s / dt_k, 1),
        }

    assert [[w[:3] for w in p] for p in device_out] == \
           [[w[:3] for w in p] for p in host_out], "device/host mismatch"

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "batch": args.batch,
        "frames": args.frames,
        "words": args.words,
        "device_ms_per_batch": round(dt_dev * 1e3, 2),
        "device_phrases_per_s": round(args.batch / dt_dev, 1),
        "device_audio_rtfx": round(audio_s / dt_dev, 1),
        "host_ms_per_phrase": round(dt_host / args.batch * 1e3, 3),
        "host_audio_rtfx": round(audio_s / dt_host, 1),
        **kernel,
    }))


if __name__ == "__main__":
    main()
