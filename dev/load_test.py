"""Serving load test — the perf_analyzer-equivalent sweep.

Reproduces the reference's serving-performance methodology
(docs/performance_testing.md: request-rate sweep at fixed stream counts,
p50/p95/p99 latency) against a running tone_tpu websocket server: N
concurrent clients each stream audio at real-time pace (one 300 ms chunk per
300 ms) and measure end-of-stream flush latency and transcript arrival lag.

    python dev/load_test.py --url ws://localhost:8080/api/ws \
        --streams 64 --utterance-seconds 6 --rounds 2
"""

from __future__ import annotations

import argparse
import asyncio
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def percentile(xs, p):
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


async def one_stream(url: str, audio: np.ndarray, realtime: bool,
                     results: dict) -> None:
    import websockets

    pcm = audio.astype("<i2").tobytes()
    chunk_bytes = 2400 * 2
    t_start = time.monotonic()
    first_transcript = None
    async with websockets.connect(url, max_size=2**22) as ws:
        ready = json.loads(await ws.recv())
        assert ready.get("event") == "ready"

        async def sender():
            for i in range(0, len(pcm), chunk_bytes):
                await ws.send(pcm[i:i + chunk_bytes])
                if realtime:
                    await asyncio.sleep(0.3)
            await ws.send(b"")

        send_task = asyncio.create_task(sender())
        n_phrases = 0
        try:
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=60))
                if msg.get("event") == "transcript":
                    n_phrases += 1
                    if first_transcript is None:
                        first_transcript = time.monotonic() - t_start
        except (asyncio.TimeoutError, Exception):
            pass
        await send_task
    t_end = time.monotonic()
    audio_seconds = len(audio) / 8000
    results.setdefault("flush_latency", []).append(
        t_end - t_start - (audio_seconds if realtime else 0))
    results.setdefault("phrases", []).append(n_phrases)
    results.setdefault("audio_seconds", []).append(audio_seconds)
    if first_transcript is not None:
        results.setdefault("first_transcript", []).append(first_transcript)


async def run_round(url: str, n_streams: int, utterance_seconds: float,
                    realtime: bool) -> dict:
    rng = np.random.default_rng(0)
    results: dict = {}
    t0 = time.monotonic()
    tasks = []
    for i in range(n_streams):
        # mix tone bursts and silence so the splitter emits phrases
        n = int(utterance_seconds * 8000)
        t = np.arange(n) / 8000
        audio = (8000 * np.sin(2 * np.pi * (200 + 20 * (i % 8)) * t)).astype(np.int16)
        audio[n // 3: n // 2] = 0  # mid silence -> phrase boundary
        tasks.append(one_stream(url, audio, realtime, results))
    await asyncio.gather(*tasks)
    wall = time.monotonic() - t0
    total_audio = sum(results.get("audio_seconds", []))
    return {
        "streams": n_streams,
        "wall_seconds": round(wall, 2),
        "aggregate_rtfx": round(total_audio / wall, 1),
        "flush_latency_p50": round(percentile(results.get("flush_latency", []), 50), 3),
        "flush_latency_p95": round(percentile(results.get("flush_latency", []), 95), 3),
        "flush_latency_p99": round(percentile(results.get("flush_latency", []), 99), 3),
        "first_transcript_p50": round(percentile(results.get("first_transcript", []), 50), 3),
        "phrases_total": int(sum(results.get("phrases", []))),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="ws://127.0.0.1:8080/api/ws")
    parser.add_argument("--streams", type=int, nargs="+", default=[16, 64])
    parser.add_argument("--utterance-seconds", type=float, default=6.0)
    parser.add_argument("--rounds", type=int, default=1)
    parser.add_argument("--firehose", action="store_true",
                        help="send as fast as possible instead of real-time pace")
    args = parser.parse_args()

    for n in args.streams:
        for _ in range(args.rounds):
            report = asyncio.run(run_round(
                args.url, n, args.utterance_seconds, realtime=not args.firehose))
            print(json.dumps(report))


if __name__ == "__main__":
    main()
