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
                     results: dict, config: "dict | None" = None) -> None:
    import websockets

    pcm = audio.astype("<i2").tobytes()
    chunk_bytes = 2400 * 2
    t_start = time.monotonic()
    first_transcript = None
    async with websockets.connect(url, max_size=2**22) as ws:
        ready = json.loads(await ws.recv())
        assert ready.get("event") == "ready"
        if config:
            await ws.send(json.dumps(config))
            ack = json.loads(await ws.recv())
            assert ack.get("event") == "config", ack

        async def sender():
            for i in range(0, len(pcm), chunk_bytes):
                await ws.send(pcm[i:i + chunk_bytes])
                if realtime:
                    await asyncio.sleep(0.3)
            await ws.send(b"")

        send_task = asyncio.create_task(sender())
        n_phrases = 0
        completed = False
        try:
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=60))
                if msg.get("event") == "transcript":
                    n_phrases += 1
                    if first_transcript is None:
                        first_transcript = time.monotonic() - t_start
        except asyncio.TimeoutError:
            pass  # no clean end-of-stream: counted as not delivered
        except Exception:
            # server closed the socket after the final phrase = clean end
            completed = True
        await send_task
    t_end = time.monotonic()
    audio_seconds = len(audio) / 8000
    results.setdefault("flush_latency", []).append(
        t_end - t_start - (audio_seconds if realtime else 0))
    results.setdefault("phrases", []).append(n_phrases)
    results.setdefault("audio_seconds", []).append(audio_seconds)
    results.setdefault("completed", []).append(bool(completed))
    if first_transcript is not None:
        results.setdefault("first_transcript", []).append(first_transcript)


HOTWORD_POOL = ["абонент", "договор", "тариф", "платеж", "адрес",
                "фамилия", "паспорт", "баланс"]


async def run_round(url: str, n_streams: int, utterance_seconds: float,
                    realtime: bool, nbest: int = 0,
                    hotword_streams: int = 0) -> dict:
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
        config: dict = {}
        if nbest:
            config["nbest"] = nbest
        if i < hotword_streams:
            # 3 words per request, rotated per stream — the realistic
            # per-call contact-list shape (same-size lists share one
            # stacked-table node bucket)
            config["hotwords"] = [HOTWORD_POOL[(i + k) % len(HOTWORD_POOL)]
                                  for k in range(3)]
        tasks.append(one_stream(url, audio, realtime, results,
                                config or None))
    await asyncio.gather(*tasks)
    wall = time.monotonic() - t0
    total_audio = sum(results.get("audio_seconds", []))
    return {
        "streams": n_streams,
        "nbest": nbest,
        "hotword_streams": hotword_streams,
        "delivered": len(results.get("flush_latency", [])),
        "wall_seconds": round(wall, 2),
        "aggregate_rtfx": round(total_audio / wall, 1),
        "flush_latency_p50": round(percentile(results.get("flush_latency", []), 50), 3),
        "flush_latency_p95": round(percentile(results.get("flush_latency", []), 95), 3),
        "flush_latency_p99": round(percentile(results.get("flush_latency", []), 99), 3),
        "first_transcript_p50": round(percentile(results.get("first_transcript", []), 50), 3),
        "phrases_total": int(sum(results.get("phrases", []))),
    }


def _rss_mb(pid: int) -> float:
    with open(f"/proc/{pid}/status", encoding="ascii") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    raise RuntimeError(f"no VmRSS for pid {pid}")


def _spawn_server(args, extra: "list[str] | None" = None):
    """Launch ``python -m tone_tpu serve`` on a free port; returns
    (process, url).  Shared by --soak and --shutdown-mid-load."""
    import socket
    import subprocess

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    cmd = [sys.executable, "-m", "tone_tpu", "serve", "--port", str(port),
           "--slots", str(max(args.streams)), *(extra or []), *args.serve_args]
    proc = subprocess.Popen(cmd, cwd=str(Path(__file__).resolve().parent.parent),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    return proc, f"ws://127.0.0.1:{port}/api/ws"


async def _wait_ready(proc, url: str, timeout: float = 600.0) -> None:
    """Poll until the spawned server accepts a websocket (tunneled-TPU
    warmup of a large slot count takes minutes)."""
    import websockets

    deadline = time.monotonic() + timeout
    while True:
        try:
            async with websockets.connect(url) as ws:
                json.loads(await ws.recv())
            return
        except Exception:
            if proc.poll() is not None:
                raise RuntimeError("server died during startup")
            if time.monotonic() > deadline:
                raise RuntimeError("server never became ready")
            await asyncio.sleep(2.0)


async def soak(args) -> int:
    """Run a server subprocess under continuous stream churn for
    ``--soak`` seconds, sampling its RSS; fail (exit 1) if memory grows.

    Verdict contract: open/stream/close cycles at fixed concurrency must
    leave the server's RSS flat — slot leaks, splitter-carry leaks, or
    future leaks all show up as monotonic growth here."""
    import subprocess

    proc, url = _spawn_server(args)
    try:
        await _wait_ready(proc, url)

        n = max(args.streams)
        samples: list[float] = []
        t_end = time.monotonic() + args.soak
        rounds = 0
        while time.monotonic() < t_end:
            await run_round(url, n, min(args.utterance_seconds, 3.0),
                            realtime=False, nbest=args.nbest,
                            hotword_streams=args.hotword_streams)
            samples.append(_rss_mb(proc.pid))
            rounds += 1
            print(json.dumps({"soak_round": rounds,
                              "rss_mb": round(samples[-1], 1)}), flush=True)
        # Flat check: the last quarter's median must not exceed the first
        # quarter's by more than 10% + 64 MB (allocator slack, decode-pool
        # arenas).  Require enough rounds for the quarters to mean anything.
        q = max(1, len(samples) // 4)
        first, last = float(np.median(samples[:q])), float(np.median(samples[-q:]))
        flat = last <= first * 1.10 + 64.0
        print(json.dumps({
            "soak_seconds": args.soak, "rounds": rounds,
            "rss_first_mb": round(first, 1), "rss_last_mb": round(last, 1),
            "flat": flat}), flush=True)
        return 0 if flat else 1
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


async def _shutdown_client(url: str, audio: np.ndarray, out: list) -> None:
    """Stream audio in real time and NEVER send the end-of-stream frame —
    the server's drain must finalize for us.  Records the transcripts
    delivered and the close code received."""
    import websockets

    pcm = audio.astype("<i2").tobytes()
    chunk_bytes = 2400 * 2
    record = {"transcripts": 0, "close_code": None}
    out.append(record)
    try:
        async with websockets.connect(url, max_size=2**22) as ws:
            ready = json.loads(await ws.recv())
            assert ready.get("event") == "ready"

            async def sender():
                try:
                    for i in range(0, len(pcm), chunk_bytes):
                        await ws.send(pcm[i:i + chunk_bytes])
                        await asyncio.sleep(0.3)
                except websockets.ConnectionClosed:
                    pass  # drain closed us mid-send: expected

            send_task = asyncio.create_task(sender())
            try:
                while True:
                    msg = json.loads(
                        await asyncio.wait_for(ws.recv(), timeout=120))
                    if msg.get("event") == "transcript":
                        record["transcripts"] += 1
            except websockets.ConnectionClosed as e:
                record["close_code"] = e.rcvd.code if e.rcvd else None
            finally:
                send_task.cancel()
    except Exception as e:  # noqa: BLE001 — a failed stream is a reported row
        record["error"] = repr(e)


async def shutdown_mid_load(args) -> int:
    """--shutdown-mid-load: spawn a server, put N realtime streams on it,
    SIGTERM it mid-stream, and assert every client received its flushed
    transcript plus the 4503 shutdown close before the process exited
    (graceful-drain contract of tone_tpu.runtime.server.serve)."""
    import os
    import signal
    import subprocess

    grace = 30.0
    proc, url = _spawn_server(args, extra=["--drain-grace", str(grace)])
    try:
        await _wait_ready(proc, url)
        n = max(args.streams)
        rng = np.random.default_rng(0)
        records: list = []
        secs = args.utterance_seconds
        t = np.arange(int(secs * 8000)) / 8000
        tasks = [
            asyncio.create_task(_shutdown_client(
                url,
                (8000 * np.sin(2 * np.pi * (200 + 20 * (i % 8)) * t)
                 ).astype(np.int16),
                records))
            for i in range(n)]
        # SIGTERM mid-load: every stream has audio buffered, none has sent
        # its end-of-stream frame.
        await asyncio.sleep(max(1.0, secs / 2))
        t_sig = time.monotonic()
        os.kill(proc.pid, signal.SIGTERM)
        await asyncio.gather(*tasks)
        try:
            proc.wait(timeout=grace + 30)
        except subprocess.TimeoutExpired:
            print(json.dumps({"error": "server did not exit after drain"}))
            return 1
        exit_latency = time.monotonic() - t_sig
        flushed = sum(1 for r in records if r["transcripts"] > 0)
        clean = sum(1 for r in records if r["close_code"] == 4503)
        report = {
            "shutdown_mid_load": True,
            "streams": n,
            "flushed": flushed,
            "closed_4503": clean,
            "close_codes": sorted({r["close_code"] for r in records},
                                  key=str),
            "exit_after_signal_s": round(exit_latency, 2),
            "ok": flushed == n and clean == n,
        }
        print(json.dumps(report), flush=True)
        return 0 if report["ok"] else 1
    finally:
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                proc.kill()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", default="ws://127.0.0.1:8080/api/ws")
    parser.add_argument("--streams", type=int, nargs="+", default=[16, 64])
    parser.add_argument("--utterance-seconds", type=float, default=6.0)
    parser.add_argument("--rounds", type=int, default=1)
    parser.add_argument("--firehose", action="store_true",
                        help="send as fast as possible instead of real-time pace")
    parser.add_argument("--nbest", type=int, default=0,
                        help="per-stream n-best config frame sent at connect")
    parser.add_argument("--hotword-streams", type=int, default=0,
                        help="first K streams send a per-request hotword list")
    parser.add_argument("--soak", type=float, default=0.0, metavar="SECONDS",
                        help="spawn a server and churn streams for N seconds, "
                             "asserting flat RSS (exit 1 on growth)")
    parser.add_argument("--shutdown-mid-load", action="store_true",
                        help="spawn a server, SIGTERM it under live streams, "
                             "and assert every client got its full transcript "
                             "+ a 4503 close before exit (exit 1 otherwise)")
    parser.add_argument("--serve-args", nargs=argparse.REMAINDER, default=[],
                        help="extra args for the spawned server (--soak only)")
    args = parser.parse_args()

    if args.soak:
        sys.exit(asyncio.run(soak(args)))
    if args.shutdown_mid_load:
        sys.exit(asyncio.run(shutdown_mid_load(args)))

    for n in args.streams:
        for _ in range(args.rounds):
            report = asyncio.run(run_round(
                args.url, n, args.utterance_seconds,
                realtime=not args.firehose, nbest=args.nbest,
                hotword_streams=args.hotword_streams))
            print(json.dumps(report))


if __name__ == "__main__":
    main()
