"""Serving observability: engine metrics in Prometheus text format.

The reference deployment exposes Triton's built-in Prometheus endpoint
(docker-compose.yml:13); here the engine's counters are rendered in the same
exposition format and served on a plain HTTP port next to the websocket
server.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def render_metrics(engine) -> str:
    s = engine.stats
    lines = [
        "# HELP tone_ticks_total Batched TPU steps executed.",
        "# TYPE tone_ticks_total counter",
        f"tone_ticks_total {s.ticks}",
        "# HELP tone_chunks_processed_total 300ms audio chunks processed.",
        "# TYPE tone_chunks_processed_total counter",
        f"tone_chunks_processed_total {s.chunks_processed}",
        "# HELP tone_phrases_decoded_total Finalized phrases decoded.",
        "# TYPE tone_phrases_decoded_total counter",
        f"tone_phrases_decoded_total {s.phrases_decoded}",
        "# HELP tone_active_streams Streams currently holding a slot.",
        "# TYPE tone_active_streams gauge",
        f"tone_active_streams {s.active_streams}",
        "# HELP tone_slots_total Stream slot capacity of the arena.",
        "# TYPE tone_slots_total gauge",
        f"tone_slots_total {engine.arena.n_slots}",
        "# HELP tone_pending_streams Candidate streams queued for a slot.",
        "# TYPE tone_pending_streams gauge",
        f"tone_pending_streams {s.pending_streams}",
        "# HELP tone_last_tick_seconds Wall time of the last tick.",
        "# TYPE tone_last_tick_seconds gauge",
        f"tone_last_tick_seconds {s.last_tick_seconds:.6f}",
    ]
    return "\n".join(lines) + "\n"


def start_metrics_server(engine, host: str = "0.0.0.0", port: int = 8002) -> ThreadingHTTPServer:
    """Serve /metrics on a daemon thread; returns the server (call shutdown())."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path in ("/healthz", "/v2/health/ready"):
                # Liveness/readiness (Triton /v2/health/ready parity): ready
                # once the arena exists (the step is compiled at warmup).
                self.send_response(200)
                self.send_header("Content-Length", "3")
                self.end_headers()
                self.wfile.write(b"ok\n")
                return
            if self.path not in ("/metrics", "/"):
                self.send_response(404)
                self.end_headers()
                return
            body = render_metrics(engine).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence access logs
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True,
                     name="tone-metrics").start()
    return server
