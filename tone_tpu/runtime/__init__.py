"""Serving runtime: device state arena, multi-stream engine, websocket server."""

from tone_tpu.runtime.arena import StreamArena
from tone_tpu.runtime.engine import MultiStreamEngine

__all__ = ["StreamArena", "MultiStreamEngine"]
