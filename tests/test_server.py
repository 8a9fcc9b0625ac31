"""WebSocket server integration test (in-process, real sockets)."""

import asyncio
import json

import jax
import numpy as np
import pytest

websockets = pytest.importorskip("websockets")

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import init_model_params
from tone_tpu.runtime.engine import MultiStreamEngine
from tone_tpu.runtime.server import TranscriptionServer


async def _client(port, audio, frame_bytes=7000):
    out = []
    async with websockets.connect(f"ws://127.0.0.1:{port}/api/ws") as ws:
        assert json.loads(await ws.recv())["event"] == "ready"
        pcm = audio.astype("<i2").tobytes()
        for i in range(0, len(pcm), frame_bytes):
            await ws.send(pcm[i:i + frame_bytes])
        await ws.send(b"")
        try:
            while True:
                msg = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
                if msg["event"] == "transcript":
                    out.append(msg)
        except (asyncio.TimeoutError, websockets.ConnectionClosed):
            pass
    return out


@pytest.mark.slow
def test_ws_server_two_concurrent_clients():
    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=4)
        server = TranscriptionServer(engine, tick_seconds=0.02)
        await asyncio.to_thread(engine.arena.warmup)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_server:
                port = ws_server.sockets[0].getsockname()[1]
                rng = np.random.default_rng(0)
                audio = rng.integers(-20000, 20000, 2400 * 5).astype(np.int16)
                # different frame sizes exercise the server-side re-chunking
                r1, r2 = await asyncio.gather(
                    _client(port, audio, 7000), _client(port, audio, 1234))
                assert r1 == r2
                assert len(r1) >= 1
                assert all(m["event"] == "transcript" for m in r1)
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_ws_transcript_event_carries_words():
    """A word-times engine's transcript events include the words array
    (times + confidences); without the flag the field is absent."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    cfg = tiny_config()
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    async def run(word_timestamps):
        engine = MultiStreamEngine(variables, cfg, n_slots=2,
                                   word_timestamps=word_timestamps)
        server = TranscriptionServer(engine, tick_seconds=0.02)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_server:
                port = ws_server.sockets[0].getsockname()[1]
                rng = np.random.default_rng(0)
                audio = rng.integers(-20000, 20000, 2400 * 4).astype(np.int16)
                return await _client(port, audio)
        finally:
            tick.cancel()
            engine.shutdown()

    rich = [m for m in asyncio.run(run(True)) if m["text"]]
    assert rich, "no non-empty transcript"
    for m in rich:
        assert " ".join(w["word"] for w in m["words"]) == m["text"]
        for w in m["words"]:
            assert 0.0 <= w["start_time"] <= w["end_time"]
            assert 0.0 < w["confidence"] <= 1.0
    plain = [m for m in asyncio.run(run(False)) if m["text"]]
    assert plain and all("words" not in m for m in plain)


@pytest.mark.slow
def test_ws_server_capacity_rejection():
    """With every slot held by a live stream, a new connection is refused
    with close code 1013 (try again later)."""
    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=1)
        engine.IDLE_EVICT_SECONDS = 3600  # no eviction during the test
        server = TranscriptionServer(engine, tick_seconds=0.05)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws_server:
                port = ws_server.sockets[0].getsockname()[1]
                # first client holds the only slot (keeps streaming)
                first = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                assert json.loads(await first.recv())["event"] == "ready"
                await first.send(np.zeros(2400, "<i2").tobytes())
                # second client must be rejected with 1013
                second = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                with pytest.raises(websockets.ConnectionClosed) as err:
                    await asyncio.wait_for(second.recv(), timeout=10)
                assert err.value.rcvd.code == 1013
                await first.close()
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def _tiny_setup():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from train_tiny_e2e import tiny_config

    cfg = tiny_config()
    return cfg, init_model_params(jax.random.PRNGKey(0), cfg)


def test_clean_close_without_eos_releases_slot_promptly():
    """A client that closes the websocket cleanly WITHOUT the protocol's
    empty end-of-stream frame must release its slot immediately — nothing
    can be delivered after the close handshake, so holding the slot for the
    flush timeout (waiting for an EOS that never comes) starves newcomers.
    The reference drops pipeline state the same way when its receive raises
    on disconnect (demo/website.py get_chunk_stream)."""
    cfg, variables = _tiny_setup()

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=2)
        server = TranscriptionServer(engine, tick_seconds=0.02)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws:
                port = ws.sockets[0].getsockname()[1]
                client = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                assert json.loads(await client.recv())["event"] == "ready"
                rng = np.random.default_rng(0)
                audio = rng.integers(-20000, 20000, 2400 * 4).astype("<i2")
                await client.send(audio.tobytes())
                # Let the server ingest the frame, then close cleanly with
                # no b"" end-of-stream frame.
                await asyncio.sleep(0.1)
                await client.close()  # clean close handshake (code 1000)
                deadline = asyncio.get_running_loop().time() + 5.0
                while server._queues or engine._streams:
                    assert asyncio.get_running_loop().time() < deadline, \
                        "slot still held after a clean no-EOS close"
                    await asyncio.sleep(0.05)
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_tick_failure_transient_recovers():
    """Fault injection: one tick raises -> the supervisor logs, backs off,
    retries, and the client still gets its transcript.  Health ends 200."""
    cfg, variables = _tiny_setup()

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=2)
        real_tick = engine.tick
        calls = {"n": 0}

        def flaky_tick():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected transient fault")
            return real_tick()

        engine.tick = flaky_tick
        server = TranscriptionServer(engine, tick_seconds=0.02,
                                     failure_backoff=0.01)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws:
                port = ws.sockets[0].getsockname()[1]
                rng = np.random.default_rng(0)
                audio = rng.integers(-20000, 20000, 2400 * 4).astype(np.int16)
                out = await _client(port, audio)
            assert len(out) >= 1  # transcription survived the fault
            assert calls["n"] > 1
            assert server.health.tick_failures_total == 1
            assert server.health.consecutive_failures == 0
            assert not server.health.failed
            code, body = server.health.status()
            assert code == 200 and body.strip() == "ok"
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_tick_failure_persistent_flips_health_and_closes_clients():
    """Fault injection: every tick raises -> after max_tick_failures the
    server enters FAILED state, the connected client's socket closes with
    4500 (not a 120 s hang), new connections are refused with 4500, and
    /v2/health/ready serves 503."""
    import urllib.error
    import urllib.request

    from tone_tpu.runtime.metrics import start_metrics_server

    cfg, variables = _tiny_setup()

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=2)

        def dead_tick():
            raise RuntimeError("injected persistent fault")

        engine.tick = dead_tick
        server = TranscriptionServer(engine, tick_seconds=0.02,
                                     max_tick_failures=2,
                                     failure_backoff=0.01)
        server.health.warmed = True  # as serve() does after warmup
        metrics = start_metrics_server(engine, "127.0.0.1", 0,
                                       health=server.health)
        mport = metrics.server_address[1]
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws:
                port = ws.sockets[0].getsockname()[1]
                client = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                assert json.loads(await client.recv())["event"] == "ready"
                await client.send(np.zeros(2400, "<i2").tobytes())
                # The supervisor gives up after 2 failures and closes us.
                with pytest.raises(websockets.ConnectionClosed) as err:
                    await asyncio.wait_for(client.recv(), timeout=10)
                assert err.value.rcvd.code == 4500
                await asyncio.wait_for(tick, timeout=5)  # loop exited cleanly
                assert server.health.failed
                assert "injected persistent fault" in server.health.failed_reason
                # New connections are refused with the same code.
                late = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                with pytest.raises(websockets.ConnectionClosed) as err:
                    await asyncio.wait_for(late.recv(), timeout=10)
                assert err.value.rcvd.code == 4500
            # Readiness reflects the failure (Triton liveness parity).
            try:
                urllib.request.urlopen(f"http://127.0.0.1:{mport}/v2/health/ready")
                raise AssertionError("expected 503")
            except urllib.error.HTTPError as e:
                assert e.code == 503
                assert b"injected persistent fault" in e.read()
            with urllib.request.urlopen(f"http://127.0.0.1:{mport}/metrics") as r:
                body = r.read().decode()
            assert "tone_ready 0" in body
            assert "tone_tick_failures_total 2" in body
        finally:
            tick.cancel()
            metrics.shutdown()
            engine.shutdown()

    asyncio.run(main())


def test_drain_flushes_live_stream_before_close():
    """Graceful shutdown: begin_drain() mid-stream -> the client receives
    the FULL transcript of its buffered audio, then the socket closes with
    4503; readiness turns 503; new connections are refused with 1013."""
    cfg, variables = _tiny_setup()

    async def main():
        engine = MultiStreamEngine(variables, cfg, n_slots=2)
        server = TranscriptionServer(engine, tick_seconds=0.02)
        tick = asyncio.create_task(server.tick_loop())
        try:
            async with websockets.serve(server.handle, "127.0.0.1", 0) as ws:
                port = ws.sockets[0].getsockname()[1]
                client = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                assert json.loads(await client.recv())["event"] == "ready"
                rng = np.random.default_rng(0)
                audio = rng.integers(-20000, 20000, 2400 * 4).astype("<i2")
                await client.send(audio.tobytes())
                # Mid-stream (no end-of-stream frame sent), the operator
                # starts a graceful shutdown.
                server.begin_drain()
                assert server.draining
                code, body = server.health.status()
                assert code == 503 and "draining" in body
                # The live stream still flushes: transcripts arrive, then
                # the distinct shutdown close code.
                transcripts = []
                with pytest.raises(websockets.ConnectionClosed) as err:
                    while True:
                        msg = json.loads(
                            await asyncio.wait_for(client.recv(), timeout=30))
                        if msg["event"] == "transcript":
                            transcripts.append(msg["text"])
                assert err.value.rcvd.code == 4503
                assert transcripts, "drain dropped the buffered audio"
                # New connections are refused with 1013 (retry elsewhere).
                late = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
                with pytest.raises(websockets.ConnectionClosed) as err:
                    await asyncio.wait_for(late.recv(), timeout=10)
                assert err.value.rcvd.code == 1013
                await asyncio.wait_for(server.wait_drained(), timeout=10)
        finally:
            tick.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_serve_sigterm_drains_and_exits():
    """End to end through serve(): SIGTERM mid-stream -> the one live
    client gets its full transcript and a 4503 close, and serve() returns
    within the grace period (the reference's Triton drains in-flight
    sequences on exit, scripts/docker-compose.yml:24-31)."""
    import os
    import signal

    cfg, variables = _tiny_setup()

    async def main():
        from tone_tpu.runtime.server import serve

        engine = MultiStreamEngine(variables, cfg, n_slots=2)
        port_box: asyncio.Queue = asyncio.Queue()
        serve_task = asyncio.create_task(serve(
            engine, "127.0.0.1", 0, metrics_port=None, drain_grace=30.0,
            on_started=port_box.put_nowait))
        try:
            port = await asyncio.wait_for(port_box.get(), timeout=120)
            client = await websockets.connect(f"ws://127.0.0.1:{port}/api/ws")
            assert json.loads(await client.recv())["event"] == "ready"
            rng = np.random.default_rng(0)
            audio = rng.integers(-20000, 20000, 2400 * 4).astype("<i2")
            await client.send(audio.tobytes())
            os.kill(os.getpid(), signal.SIGTERM)
            transcripts = []
            with pytest.raises(websockets.ConnectionClosed) as err:
                while True:
                    msg = json.loads(
                        await asyncio.wait_for(client.recv(), timeout=30))
                    if msg["event"] == "transcript":
                        transcripts.append(msg["text"])
            assert err.value.rcvd.code == 4503
            assert transcripts, "SIGTERM dropped the buffered audio"
            await asyncio.wait_for(serve_task, timeout=30)
        finally:
            if not serve_task.done():
                serve_task.cancel()
            engine.shutdown()

    asyncio.run(main())


def test_metrics_expose_process_rss():
    """tone_process_rss_bytes makes the documented tunneled-backend RSS
    growth (docs/serving.md soak section) monitorable in deployments."""
    from tone_tpu.runtime.metrics import _process_rss_bytes, render_metrics

    rss = _process_rss_bytes()
    assert rss > 10 * 1024 * 1024  # a live CPython+jax process is >10 MB

    class _Stats:  # render_metrics only reads .stats and .arena.n_slots
        ticks = chunks_processed = phrases_decoded = 0
        active_streams = pending_streams = 0
        last_tick_seconds = 0.0

    class _Arena:
        n_slots = 4

    class _Engine:
        stats = _Stats()
        arena = _Arena()

    body = render_metrics(_Engine())
    line = [ln for ln in body.splitlines()
            if ln.startswith("tone_process_rss_bytes ")]
    assert line and int(line[0].split()[1]) > 10 * 1024 * 1024


def test_health_state_warmup_and_staleness():
    """HealthState unit semantics: 503 before warmup, 200 after a good tick,
    503 once the beat goes stale."""
    import time as _time

    from tone_tpu.runtime.metrics import HealthState

    h = HealthState(stale_after=0.05)
    assert h.status()[0] == 503 and "warmup" in h.status()[1]
    h.record_success()
    assert h.warmed and h.status()[0] == 200
    _time.sleep(0.08)
    code, body = h.status()
    assert code == 503 and "stalled" in body
    h.record_success()
    assert h.status()[0] == 200


@pytest.mark.slow
def test_metrics_endpoints():
    """/metrics Prometheus exposition + /healthz + /v2/health/ready."""
    import urllib.request

    from tone_tpu.runtime.metrics import start_metrics_server

    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)
    engine = MultiStreamEngine(variables, cfg, n_slots=2)
    server = start_metrics_server(engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        for path in ("/healthz", "/v2/health/ready"):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                assert r.status == 200

        sid = engine.open_stream()
        engine.feed(sid, np.zeros(2400, np.int32), is_last=True)
        engine.tick()

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            body = r.read().decode()
        assert "tone_ticks_total 1" in body
        assert "tone_slots_total 2" in body
        assert "tone_chunks_processed_total 1" in body

        import urllib.error
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()


@pytest.mark.slow
def test_evaluate_server_end_to_end(tmp_path):
    """evaluate_server (the client_wer.py-equivalent WER gate) against an
    in-process server: manifest -> websocket -> WER plumbing.  Random
    weights, so this asserts the pipeline, not quality."""
    import threading
    import wave

    from tone_tpu.eval import evaluate_server

    cfg = ToneConfig(compute_dtype="float32")
    variables = init_model_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    manifest = tmp_path / "manifest.jsonl"
    with open(manifest, "w", encoding="utf-8") as f:
        for i, text in enumerate(["да нет", "алло привет"]):
            wav = tmp_path / f"utt{i}.wav"
            audio = rng.integers(-20000, 20000, 2400 * (4 + i)).astype("<i2")
            with wave.open(str(wav), "wb") as w:
                w.setnchannels(1), w.setsampwidth(2), w.setframerate(8000)
                w.writeframes(audio.tobytes())
            f.write(json.dumps({"audio_filepath": str(wav), "text": text},
                               ensure_ascii=False) + "\n")

    engine = MultiStreamEngine(variables, cfg, n_slots=4)
    engine.arena.warmup()
    server = TranscriptionServer(engine, tick_seconds=0.02)
    started = threading.Event()
    box = {}

    def serve_thread():
        async def main():
            tick = asyncio.create_task(server.tick_loop())
            async with websockets.serve(server.handle, "127.0.0.1", 0) as s:
                box["port"] = s.sockets[0].getsockname()[1]
                box["loop"] = asyncio.get_running_loop()
                started.set()
                try:
                    await asyncio.Future()
                except asyncio.CancelledError:
                    pass
                finally:
                    tick.cancel()

        asyncio.run(main())

    t = threading.Thread(target=serve_thread, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    try:
        result = evaluate_server(
            f"ws://127.0.0.1:{box['port']}/api/ws", manifest, concurrency=2)
    finally:
        box["loop"].call_soon_threadsafe(
            lambda: [task.cancel() for task in asyncio.all_tasks(box["loop"])])
        t.join(timeout=10)
        engine.shutdown()
    assert result.n_utterances == 2
    assert result.audio_seconds == pytest.approx((2400 * 4 + 2400 * 5) / 8000)
    assert np.isfinite(result.wer) and result.wer >= 0.0
    assert result.rtfx > 0
