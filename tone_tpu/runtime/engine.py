"""Multi-stream serving engine: stream table, tick loop, phrase decoding.

Transport-independent core of the serving layer (the websocket server in
``tone_tpu/runtime/server.py`` wraps it).  Replaces the reference's Triton
sequence-batching deployment: a stream table maps stream ids to arena slots,
idle streams are evicted after a timeout (Triton's
``max_sequence_idle_microseconds: 15000000``, triton/model/config.pbtxt:31),
and each tick batches all pending chunks into one arena step.  Host-side
phrase segmentation is one vectorized pass over all ticking slots
(``BatchLogprobSplitter``); beam-search decoding (CPU-bound) is offloaded to
a thread pool so it never stalls the TPU tick.
"""

from __future__ import annotations

import copy
import threading
import time
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

import numpy as np

from tone_tpu.config import ToneConfig
from tone_tpu.pipeline import TextPhrase
from tone_tpu.runtime.arena import StreamArena
from tone_tpu.splitter import BatchLogprobSplitter


class UnknownStreamError(KeyError):
    """The stream id is gone — closed, finished, or evicted for idleness
    (the transport should tell the client its session ended)."""


@dataclass
class _Stream:
    slot: int | None            # None = candidate waiting for a slot
    pending: list = field(default_factory=list)  # queued (chunk, is_last)
    last_activity: float = field(default_factory=time.monotonic)
    finished: bool = False
    sent_samples: int = 0
    # Interim (in-progress phrase) greedy-decode carry.
    interim_prev: int = -1          # last argmax token id (CTC collapse)
    interim_chars: list = field(default_factory=list)
    interim_sent: str = ""
    # Interim beam-decode carry (interim_beam mode): a carried-state beam
    # search advanced off-tick on the decode pool, one task in flight per
    # stream; frames queue here between tasks, a phrase boundary folds into
    # the next task as a reset.
    beam: object = None
    beam_frames: list = field(default_factory=list)
    beam_task: Future | None = None
    beam_reset: bool = False
    beam_gen: int = 0               # bumped at boundaries; stale results drop
    decoder: object = None          # per-stream override (request hotwords)
    hotwords: tuple | None = None   # (words, weight) behind the override —
    # plain data so suspend/resume can carry the biasing across engines
    # Device hotword automaton tables (ops.beam_decode.HotwordTables):
    # set instead of ``decoder`` when the engine decoder is a device
    # decoder, so the stream's finals STAY on the batched device call
    # (stacked per-row tables) instead of per-phrase decodes.
    hotword_tables: object = None
    nbest: int = 0                  # >1: finals carry n-best alternatives
    ticks: int = 0                  # completed ticks (suspend's torn-read guard)


@dataclass
class EngineStats:
    ticks: int = 0
    chunks_processed: int = 0
    phrases_decoded: int = 0
    active_streams: int = 0
    pending_streams: int = 0    # candidates queued for a slot
    last_tick_seconds: float = 0.0
    last_host_seconds: float = 0.0  # tick cost excluding the device step wait


class MultiStreamEngine:
    """Synchronous multi-stream engine over a device state arena.

    Usage:
        engine = MultiStreamEngine(variables, config, n_slots=256)
        sid = engine.open_stream()
        engine.feed(sid, chunk)                  # any number of times
        results = engine.tick()                  # {sid: [TextPhrase, ...]}
        engine.close_stream(sid)                 # flushes with is_last

    Thread-safety: all public methods take the engine lock; ``tick`` may be
    driven by a dedicated loop (see server.py).
    """

    IDLE_EVICT_SECONDS = 15.0  # Triton parity: max_sequence_idle 15 s

    def __init__(self, variables, config: ToneConfig, n_slots: int = 256,
                 decoder=None, sharding=None, decode_workers: int = 8,
                 interim_transcripts: bool = False,
                 interim_beam: bool = False,
                 interim_device_beam: bool = False,
                 interim_beam_width: int = 8,
                 interim_beam_max_len: int = 2048,
                 idle_evict_seconds: float | None = None,
                 force_evict_grace: float | None = None,
                 final_decode_batch: int = 64,
                 word_timestamps: bool = False,
                 nbest: int = 0,
                 max_candidates: int = 0,
                 candidate_buffer_chunks: int = 200,
                 hotword_warmup_buckets=(32,)) -> None:
        """``interim_transcripts``: also decode each in-progress phrase
        incrementally; ``tick`` then reports partial text per stream (final
        phrases still use the configured decoder).  A capability the
        reference deployment does not have — off by default for exact
        protocol parity.

        ``interim_beam``: interim text comes from a carried-state beam
        search (``decoder.streaming()``) advanced on the decode pool —
        LM-quality partials with the per-tick cost spread off the tick
        thread (at most one in-flight advance per stream; results surface
        on the following tick).  Default is the in-tick greedy collapse,
        which is vectorized and effectively free.

        ``interim_device_beam``: the carried beam search lives on the TPU
        instead — a BeamState arena beside the acoustic arena, advanced
        for every slot in one batched call per tick with phrase-boundary
        resets (tone_tpu/ops/beam_decode.py).  Acoustic-best partials with
        zero host decode cost; final phrases still use the configured
        decoder (with its LM).

        ``interim_beam_width`` / ``interim_beam_max_len`` size the device
        interim-beam arena (wider = closer to the final decode, more HBM
        and per-tick FLOPs; max_len bounds the longest force-split phrase).

        ``idle_evict_seconds`` overrides the Triton-parity 15 s idle reap;
        ``force_evict_grace`` overrides the 1 s quiet period below which a
        slot is never stolen under pressure (a deviation from Triton,
        which only ever reaps idle streams — see _evict_idle_locked).

        ``final_decode_batch``: device-batch bucket for final-phrase
        decodes (device_finals path): phrase batches pad up to and split
        at this many rows, so every serving decode hits one of the
        programs warmup() precompiles.

        ``word_timestamps``: final phrases also carry per-word times +
        confidences (CTC forced alignment, tone_tpu/align.py) — host-side
        O(frames·chars) per phrase on the decode path.

        ``nbest``: deployment-wide default for per-stream n-best (every new
        stream starts with it; ``set_stream_nbest`` overrides per request).
        Must be 0 (top-1 only) or >= 2 — 1 would silently mean "no
        alternatives", so it is rejected.  With a device decoder
        (``forward_batch_nbest``) n-best streams stay on the batched
        device_finals path — deployment-wide n-best costs one shared
        ranked readout, not per-phrase host decodes; only host decoders
        fall back to per-phrase ``decoder.nbest`` pool calls.

        ``max_candidates``: streams accepted beyond the slot count.  With
        every slot busy, up to this many new streams queue as CANDIDATES —
        chunks buffer host-side, the oldest candidate binds whenever a slot
        frees (Triton's ``sequence_batching{oldest{max_candidate_sequences:
        4096}}``, triton/model/config.pbtxt:30-37).  0 (default) keeps the
        reject-at-capacity behavior.  While the queue has room, slot
        pressure never force-evicts a quiet live stream (newcomers wait
        instead — Triton's semantics); force-eviction remains the last
        resort once the queue is full too.

        ``candidate_buffer_chunks``: per-CANDIDATE cap on host-buffered
        chunks (~300 ms each; 200 ≈ one minute of audio).  A candidate that
        feeds past it is dropped (UnknownStreamError + eviction notice) —
        without the cap, thousands of realtime candidates during sustained
        slot contention would grow host memory without bound.

        ``hotword_warmup_buckets``: hotword-table node buckets (powers of
        two) whose stacked per-row-biased decode family ``warmup()``
        precompiles, so the FIRST biased request of that size pays no
        compile at all (set_stream_hotwords still warms unseen sizes
        lazily, overlapped with the stream's early audio).  Default (32,)
        covers typical short contact lists (a 3-word request pads to 32
        nodes); pass every expected size for larger deployments, or an
        empty tuple to skip (faster warmup).  Device-decoder engines only."""
        self.config = config
        self.arena = StreamArena(variables, config, n_slots, sharding=sharding)
        self.decoder = decoder
        # Final phrases decode in ONE batched device call per tick when the
        # decoder supports it (DeviceBeamSearchCTCDecoder.forward_batch) —
        # at arena scale the per-phrase host pool is the throughput ceiling
        # long before the TPU is (docs/serving.md).
        self.device_finals = hasattr(decoder, "forward_batch")
        self.device_nbest = hasattr(decoder, "forward_batch_nbest")
        if self.device_finals:
            # Pin the decoder to one device-batch bucket per frame bucket:
            # every serving decode then hits a program warmup() compiled up
            # front — no mid-tick XLA compiles, and a tick's worst case
            # (every slot closing a phrase at once) runs as bounded
            # sequential calls instead of one giant padded program.
            # Copy first: the caller's decoder may also serve a pipeline or
            # a second engine, and reconfiguring a shared object behind its
            # back silently changes THEIR bucketing (shallow copy — the LM
            # arrays and compiled-program caches stay shared).
            decoder = copy.copy(decoder)
            decoder.batch_floor = decoder.max_batch = final_decode_batch
            self.decoder = decoder
        self.interim_transcripts = (interim_transcripts or interim_beam
                                    or interim_device_beam)
        self.interim_device_beam = interim_device_beam
        self.interim_beam = (interim_beam and not interim_device_beam
                             and hasattr(decoder, "streaming"))
        self._device_beams = None       # lazy ops.beam_decode.BeamState
        self._device_beam_width = interim_beam_width
        self._device_beam_max_len = interim_beam_max_len
        self.word_timestamps = word_timestamps
        if nbest and (nbest < 0 or nbest > self.MAX_NBEST):
            raise ValueError(f"nbest must be 0..{self.MAX_NBEST}, got {nbest}")
        if nbest == 1:
            raise ValueError("nbest=1 is ambiguous (finals always carry the "
                             "top hypothesis as .text): use 0 for no "
                             "alternatives or N >= 2")
        if nbest and not hasattr(decoder or (), "nbest"):
            raise ValueError("nbest > 1 needs a beam decoder (greedy has no "
                             "alternative hypotheses)")
        self.default_nbest = int(nbest) if nbest else 0
        if idle_evict_seconds is not None:
            self.IDLE_EVICT_SECONDS = idle_evict_seconds
        if force_evict_grace is not None:
            self.FORCE_EVICT_GRACE_SECONDS = force_evict_grace
        self._interim_results: dict[int, str] = {}
        self._labels = config.labels
        self._splitter = BatchLogprobSplitter(n_slots)
        self._streams: dict[int, _Stream] = {}
        self.max_candidates = max(0, int(max_candidates))
        self.candidate_buffer_chunks = max(1, int(candidate_buffer_chunks))
        self._pending_bind: list[int] = []  # candidate sids, open order
        self._inflight: set[int] = set()    # sids mid-tick (popped, not done)
        self._free_slots = list(range(n_slots))
        self._slot_reset = np.zeros(n_slots, bool)
        # resumed slots keep their acoustic state (reset False) but must
        # restart the interim device-beam arena
        self._beam_force_reset = np.zeros(n_slots, bool)
        self._next_id = 0
        self._lock = threading.Lock()
        self._interim_lock = threading.Lock()  # guards _interim_results only
        self._device_lock = threading.Lock()   # serializes arena state swaps
        self._decode_pool = ThreadPoolExecutor(max_workers=decode_workers,
                                               thread_name_prefix="ctc-decode")
        self._finished_since_poll: list[int] = []
        self._evicted_since_poll: list[int] = []
        # hotword-table node buckets whose stacked-program ladder was (or is
        # being) warmed — repeat request sizes skip straight to serving
        self._warmed_hotword_buckets: set[int] = set()
        self._hotword_warmup_buckets = tuple(
            int(b) for b in (hotword_warmup_buckets or ()) if int(b) > 0)
        self.last_interims: dict[int, str] = {}
        self.stats = EngineStats()

    # -- stream lifecycle --------------------------------------------------

    def open_stream(self) -> int:
        """Acquire a slot for a new stream; returns the stream id.

        With every slot busy (and nothing evictable) the stream is accepted
        as a CANDIDATE when ``max_candidates`` allows: its chunks buffer
        host-side and it binds to the oldest freed slot on a later tick.
        Raises RuntimeError when candidates are exhausted too.
        """
        with self._lock:
            # Older waiting candidates bind first: a newcomer never jumps
            # the queue to a just-freed slot (Triton's oldest-first order).
            self._bind_candidates_locked()
            if not self._free_slots:
                # Reap idle streams (the 15 s Triton reaper).  Force-steal a
                # quiet slot only when the newcomer cannot queue: with room
                # in the candidate queue it waits instead of costing a live
                # stream its slot.
                queue_has_room = len(self._pending_bind) < self.max_candidates
                self._evict_idle_locked(force_one=not queue_has_room)
                self._bind_candidates_locked()
            if self._free_slots:  # implies no candidates left waiting
                slot = self._free_slots.pop()
                sid = self._next_id
                self._next_id += 1
                self._streams[sid] = _Stream(slot=slot,
                                             nbest=self.default_nbest)
                self._slot_reset[slot] = True
                self._splitter.reset(slot)
                return sid
            if len(self._pending_bind) >= self.max_candidates:
                raise RuntimeError("no free stream slots")
            sid = self._next_id
            self._next_id += 1
            self._streams[sid] = _Stream(slot=None, nbest=self.default_nbest)
            self._pending_bind.append(sid)
            return sid

    def _bind_candidates_locked(self) -> None:
        """Bind the oldest waiting candidates to freed slots (FIFO —
        Triton's OldestSequenceBatcher scheduling order)."""
        while self._free_slots and self._pending_bind:
            sid = self._pending_bind.pop(0)
            stream = self._streams.get(sid)
            if stream is None:  # candidate closed while waiting
                continue
            slot = self._free_slots.pop()
            stream.slot = slot
            self._slot_reset[slot] = True
            self._splitter.reset(slot)

    def set_stream_hotwords(self, sid: int, hotwords,
                            hotword_weight: float = 10.0) -> None:
        """Per-REQUEST contextual biasing: this stream's final phrases (and
        its carried interim search, if interim_beam) decode with the given
        hotwords — e.g. the contact names of one call.  With a device
        engine decoder the bias is pure DATA: the request's automaton
        tables become one row of the tick's batched finals call (stacked
        per-row tables, jit ARGUMENTS padded to power-of-two node counts,
        so same-size request lists reuse compiled programs) — fused-LM
        quality kept, batched throughput kept.  A list so large that
        stacking it would blow the per-tick upload budget
        (MAX_STACKED_HOTWORD_BYTES) instead gets a per-stream device
        decoder override sharing the engine LM (per-phrase decodes).  With
        a host engine decoder the override is a host beam reusing its LM.
        An empty/None list CLEARS an earlier override (back to the
        engine-wide decoder).
        """
        override = None
        tables = None
        if hotwords:
            from tone_tpu.decoder import (BeamSearchCTCDecoder,
                                          DeviceBeamSearchCTCDecoder)
            from tone_tpu.decoding.lm import LanguageModel

            base = self.decoder
            if isinstance(base, DeviceBeamSearchCTCDecoder):
                # Device decoder: the bias is pure DATA — automaton tables
                # stacked per row into the engine's batched finals call
                # (decoder.forward_batch(hotword_rows=...)), so biased
                # streams keep the batched-throughput path; no per-stream
                # decoder object exists at all.  Warm the stacked program
                # family for this table's node bucket NOW on the decode
                # pool (new node-count buckets mean new programs; with
                # fusion that can be minutes), overlapping the stream's
                # early audio instead of stalling its first final phrase.
                # The persistent compile cache (export.
                # enable_compilation_cache) makes repeat node-count buckets
                # free across requests.
                from tone_tpu.ops.beam_decode import make_hotword_tables

                tables = make_hotword_tables(hotwords, hotword_weight)
                if self._stacked_hotword_bytes(tables) > \
                        self.MAX_STACKED_HOTWORD_BYTES:
                    # Pathologically large list: stacking it would upload
                    # final_decode_batch x nodes x chars tables (x3) per
                    # batched call — tens of MB per tick, which over a
                    # tunneled link dominates the latency the batched path
                    # exists to remove.  Fall back to a per-stream DEVICE
                    # decoder override (single-table programs, per-phrase
                    # decodes on the pool) sharing the engine decoder's LM.
                    override = DeviceBeamSearchCTCDecoder(
                        base._lm, alpha=base.alpha, beta=base.beta,
                        beam_width=base.beam_width, nbest=base.nbest_hyps,
                        max_len=base.max_len, fusion=base.fusion,
                        hotwords=hotwords, hotword_weight=hotword_weight)
                    tables = None
            else:
                lm = getattr(base, "_lm", None)
                host_lm = lm if isinstance(lm, LanguageModel) else None
                override = BeamSearchCTCDecoder(
                    host_lm, native_lm=getattr(base, "_native_lm", None),
                    alpha=getattr(base, "alpha", 0.4),
                    beta=getattr(base, "beta", 0.9),
                    beam_width=getattr(base, "beam_width", None)
                    or BeamSearchCTCDecoder.BEAM_WIDTH,
                    hotwords=hotwords, hotword_weight=hotword_weight)
        with self._lock:
            stream = self._streams.get(sid)
            if stream is None:
                raise UnknownStreamError(f"unknown stream {sid}")
            stream.decoder = override  # None clears an earlier override
            stream.hotword_tables = tables
            stream.hotwords = ((tuple(hotwords), float(hotword_weight))
                               if hotwords else None)
            # carried interim search rebuilds (biased or not); bump the
            # generation so an in-flight task's stale result is dropped
            stream.beam = None
            stream.beam_gen += 1
            stream.beam_reset = True
            stream.beam_frames.clear()
        if tables is not None:
            # One warm per EFFECTIVE node bucket: the stacked program is
            # keyed by the (power-of-two) node count the serving call will
            # actually stack — the max of this request's tables and the
            # engine decoder's own fallback tables (unbiased rows inherit
            # them in _decode_bucket).  The Nth same-sized request list has
            # nothing left to compile — re-warming anyway was measured at
            # 128 firehose streams / 32 biased to stretch flush p99 from
            # ~2.3 s to ~16 s purely in redundant pool+device round trips.
            bucket = self._effective_hotword_bucket(tables)
            with self._lock:
                fresh = bucket not in self._warmed_hotword_buckets
                self._warmed_hotword_buckets.add(bucket)
            if fresh:
                self._decode_pool.submit(self._warm_hotword_bucket, bucket,
                                         tables)

    MAX_NBEST = 32

    def set_stream_nbest(self, sid: int, n: int | None) -> None:
        """Per-REQUEST n-best: this stream's final phrases carry up to ``n``
        alternative ``(text, score)`` transcripts (``TextPhrase.nbest``).
        ``None``/0/1 clears (top-1 only, the default).  With a device
        decoder the stream STAYS on the batched device_finals path
        (``forward_batch_nbest`` shares the top-1 compiled programs), so
        arena-scale n-best costs only the shared ranked readout; host
        decoders fall back to per-phrase ``decoder.nbest`` pool calls.
        """
        n = int(n or 0)
        if n < 0 or n > self.MAX_NBEST:
            raise ValueError(f"nbest must be 0..{self.MAX_NBEST}, got {n}")
        with self._lock:
            stream = self._streams.get(sid)
            if stream is None:
                raise UnknownStreamError(f"unknown stream {sid}")
            if n > 1 and not hasattr(stream.decoder or self.decoder or (),
                                     "nbest"):
                raise ValueError(
                    "the configured decoder has no n-best support "
                    "(greedy decodes a single hypothesis; use a beam decoder)")
            stream.nbest = 0 if n <= 1 else n

    def suspend_stream(self, sid: int) -> dict:
        """Serialize a live stream to a host-side snapshot and release its
        slot — the suspend half of stream migration.  The snapshot (plain
        numpy arrays + scalars) carries the acoustic slot state as the
        reference-compatible flat fp16 blob plus the splitter carry;
        ``resume_stream`` restores it on this engine or any other (another
        process, host, or chip).  Timestamps continue where they left off
        (the splitter's global frame offset travels with the snapshot).

        The stream must be drained first (no queued chunks — tick until
        its feed is consumed); in-progress INTERIM text restarts after
        resume (finalized phrases are unaffected).

        Raises UnknownStreamError for dead streams, RuntimeError for
        undrained ones or slotless candidates (nothing on device yet).
        """
        with self._lock:
            stream = self._streams.get(sid)
            if stream is None:
                raise UnknownStreamError(f"unknown stream {sid}")
            if stream.pending or sid in self._inflight:
                # 'pending empties at pop time, not completion time': a tick
                # that already popped the last chunk is still mutating the
                # slot's device state and splitter carry — treat it as
                # undrained until the tick finishes.
                raise RuntimeError(
                    f"stream {sid} has work in flight — "
                    "tick until drained before suspending")
            if stream.slot is None:
                raise RuntimeError(
                    f"stream {sid} is a waiting candidate with no device "
                    "state; close and reopen it instead")
            slot = stream.slot
            epoch = stream.ticks
        with self._device_lock:
            blob = self.arena.read_slot(slot)
        with self._lock:
            # Re-check under the lock: a concurrent close/evict may have
            # released (and possibly re-bound) the slot, and a concurrent
            # feed+tick may have advanced the stream, while we read — either
            # would make the acoustic blob and the splitter carry snapshots
            # of different points in time.
            if self._streams.get(sid) is not stream:
                raise UnknownStreamError(f"stream {sid} ended mid-suspend")
            if (stream.slot != slot or stream.pending
                    or sid in self._inflight or stream.ticks != epoch):
                raise RuntimeError(
                    f"stream {sid} advanced mid-suspend — quiesce its feed "
                    "and retry")
            snap = {"acoustic_state": blob,
                    **self._splitter.snapshot(slot),
                    "nbest": stream.nbest,
                    "hotwords": stream.hotwords}
            self._release_locked(sid)
            return snap

    def resume_stream(self, snapshot: dict) -> int:
        """Restore a ``suspend_stream`` snapshot into a fresh slot; returns
        the new stream id.  Raises RuntimeError when no slot is free
        (resume needs a real slot — candidates hold no device state)."""
        with self._lock:
            if not self._free_slots:
                self._evict_idle_locked(force_one=True)
            if not self._free_slots:
                raise RuntimeError("no free stream slots")
            slot = self._free_slots.pop()
            sid = self._next_id
            self._next_id += 1
            self._streams[sid] = _Stream(
                slot=slot, nbest=int(snapshot.get("nbest", self.default_nbest)))
            self._slot_reset[slot] = False  # the snapshot IS the state
            self._beam_force_reset[slot] = True
            self._splitter.restore(slot, snapshot)
        with self._device_lock:
            self.arena.write_slot(slot, snapshot["acoustic_state"])
        hw = snapshot.get("hotwords")
        if hw:
            # The stream's contextual biasing travels with it: rebuild the
            # per-request decoder override on this engine (it may use a
            # different LM/decoder family than the suspending one).
            self.set_stream_hotwords(sid, list(hw[0]), hw[1])
        return sid

    def feed(self, sid: int, chunk: np.ndarray, is_last: bool = False) -> None:
        """Queue one chunk (any length <= chunk_samples; zero-padded).

        Raises:
            UnknownStreamError: the stream finished, was closed, or was
                evicted (idle timeout / slot pressure) — the client must
                open a new stream.
        """
        n = self.config.audio_chunk_samples
        chunk = np.asarray(chunk).astype(np.int16, copy=False)
        if len(chunk) < n:
            chunk = np.pad(chunk, (0, n - len(chunk)))
        with self._lock:
            stream = self._streams.get(sid)
            if stream is None:
                raise UnknownStreamError(
                    f"stream {sid} is not active (finished, closed, or "
                    f"evicted after {self.IDLE_EVICT_SECONDS:.0f}s idle)")
            if (stream.slot is None
                    and len(stream.pending) >= self.candidate_buffer_chunks):
                # Backpressure: a slotless candidate buffers host-side with
                # no drain until a slot frees — cap it rather than let slot
                # contention grow host memory without bound.
                self._release_locked(sid)
                self._evicted_since_poll.append(sid)
                raise UnknownStreamError(
                    f"candidate stream {sid} exceeded its "
                    f"{self.candidate_buffer_chunks}-chunk buffer while "
                    "waiting for a slot")
            stream.pending.append((chunk, is_last))
            stream.last_activity = time.monotonic()

    def has_backlog(self) -> bool:
        """True if any slot-bound stream has chunks queued (the tick loop
        skips its sleep while draining a backlog — e.g. faster-than-realtime
        uploads).  Candidates' buffered chunks don't count: they can't tick
        until a slot frees, so spinning on them would busy-wait."""
        with self._lock:
            return any(s.pending and s.slot is not None
                       for s in self._streams.values())

    def close_stream(self, sid: int) -> None:
        """Mark end of stream: the final chunk is flagged is_last (a zero
        chunk is queued if nothing is pending, mirroring pipeline.finalize)."""
        with self._lock:
            stream = self._streams.get(sid)
            if stream is None:
                return
            if stream.pending:
                chunk, _ = stream.pending[-1]
                stream.pending[-1] = (chunk, True)
            else:
                zero = np.zeros(self.config.audio_chunk_samples, np.int16)
                stream.pending.append((zero, True))

    # -- the tick ----------------------------------------------------------

    def tick(self) -> dict[int, list[Future | TextPhrase]]:
        """One batched step over all slots with pending chunks.

        Returns {sid: [phrase_future, ...]} for phrases completed this tick.
        Futures resolve to ``TextPhrase`` (decode runs on the thread pool);
        per-stream order is the list order.
        """
        t0 = time.monotonic()
        with self._lock:
            self._evict_idle_locked()
            self._bind_candidates_locked()
            n = self.arena.n_slots
            chunks = np.zeros((n, self.config.audio_chunk_samples), np.int16)
            active = np.zeros(n, bool)
            reset = np.zeros(n, bool)
            beam_reset = np.zeros(n, bool)

            ticking: list[tuple[int, _Stream, bool]] = []
            for sid, stream in self._streams.items():
                if not stream.pending or stream.slot is None:
                    continue  # nothing queued, or a candidate awaiting a slot
                chunk, is_last = stream.pending.pop(0)
                slot = stream.slot
                chunks[slot] = chunk
                active[slot] = True
                # Consume a slot's reset flags only once it actually ticks:
                # capturing the whole array up front would let this tick's
                # device step zero a slot that resume_stream re-bound (and
                # restored state into) while the step was in flight.
                reset[slot] = self._slot_reset[slot]
                beam_reset[slot] = (reset[slot]
                                    or self._beam_force_reset[slot])
                self._slot_reset[slot] = False
                self._beam_force_reset[slot] = False
                ticking.append((sid, stream, is_last))
                self._inflight.add(sid)
            self.stats.pending_streams = len(self._pending_bind)
            self.stats.active_streams = (len(self._streams)
                                         - self.stats.pending_streams)

        if not ticking:
            return {}

        t_dev0 = time.monotonic()
        with self._device_lock:  # vs. resume_stream's state write
            logprobs = self.arena.tick(chunks, active, reset)
        t_device = time.monotonic() - t_dev0

        slot_ids = np.array([s.slot for _, s, _ in ticking], np.int64)
        lasts = np.array([last for _, _, last in ticking], bool)
        tick_logprobs = logprobs[slot_ids].astype(np.float32, copy=False)
        by_slot = self._splitter.forward_batch(tick_logprobs, slot_ids, lasts)
        argmax = (tick_logprobs.argmax(axis=-1)
                  if self.interim_transcripts and not self.interim_beam
                  and not self.interim_device_beam
                  else None)

        device_texts = None
        if self.interim_device_beam:
            device_texts = self._tick_device_beams(
                logprobs, ticking, by_slot, beam_reset)

        results: dict[int, list[Future]] = {}
        interims: dict[int, str] = {}
        finished: list[int] = []
        batch_finals: list[tuple[Future, object]] = []
        blank = len(self._labels)
        with self._lock:
            for k, (sid, stream, is_last) in enumerate(ticking):
                stream.ticks += 1
                phrases = by_slot.get(stream.slot)
                if phrases and self.device_finals and stream.decoder is None \
                        and (not stream.nbest or self.device_nbest):
                    # The batched path carries per-request hotword biasing
                    # as stacked per-row tables — biased streams do NOT
                    # drop to per-phrase decodes (docs/serving.md's
                    # measured ceiling).
                    futs = [Future() for _ in phrases]
                    batch_finals.extend(
                        (f, p, stream.nbest, stream.hotword_tables)
                        for f, p in zip(futs, phrases))
                    results[sid] = futs
                elif phrases:
                    # host-decoder overrides (request hotwords on a host
                    # engine decoder), and n-best under a host-only decoder,
                    # decode per-phrase on the pool
                    results[sid] = [
                        self._decode_pool.submit(self._decode, p,
                                                 stream.decoder, stream.nbest)
                        for p in phrases]
                if device_texts is not None:
                    if phrases or is_last:
                        stream.interim_sent = ""
                    else:
                        text = device_texts[stream.slot]
                        if text and text != stream.interim_sent:
                            stream.interim_sent = text
                            interims[sid] = text
                elif self.interim_beam:
                    if phrases or is_last:
                        # Phrase boundary: the in-progress text was finalized
                        # by the real decoder; restart the carried search.
                        stream.beam_reset = True
                        stream.beam_gen += 1
                        stream.beam_frames.clear()
                        stream.interim_sent = ""
                    else:
                        stream.beam_frames.append(
                            np.ascontiguousarray(tick_logprobs[k]))
                    if not is_last:
                        self._maybe_submit_interim_locked(sid, stream)
                elif argmax is not None:
                    if phrases or is_last:
                        # Phrase boundary: the in-progress text was finalized
                        # by the real decoder; restart the interim collapse.
                        stream.interim_prev = -1
                        stream.interim_chars = []
                        stream.interim_sent = ""
                    else:
                        prev, chars = stream.interim_prev, stream.interim_chars
                        for t in argmax[k]:
                            t = int(t)
                            if t != prev and t != blank:
                                chars.append(self._labels[t])
                            prev = t
                        stream.interim_prev = prev
                        text = "".join(chars).strip()
                        if text and text != stream.interim_sent:
                            stream.interim_sent = text
                            interims[sid] = text
                if is_last:
                    stream.finished = True
                    finished.append(sid)
            self.stats.chunks_processed += len(ticking)
            for sid in finished:
                self._release_locked(sid)
            self._finished_since_poll.extend(finished)
            # This tick's device step AND splitter updates are complete —
            # suspend_stream may now trust a drained stream's state again.
            self._inflight.difference_update(s for s, _, _ in ticking)

        if batch_finals:
            # One device call decodes every phrase completed this tick; the
            # pool task only dispatches + waits, so the tick thread never
            # blocks on the decode.
            self._decode_pool.submit(self._decode_batch, batch_finals)

        if self.interim_beam:
            # Surface beam-interim texts completed since the last tick.
            with self._interim_lock:
                done_interims = self._interim_results
                self._interim_results = {}
            if done_interims:
                with self._lock:
                    for sid, (gen, text) in done_interims.items():
                        stream = self._streams.get(sid)
                        if stream is None or stream.beam_gen != gen:
                            # A boundary finalized this phrase after the
                            # worker stored its text: drop the stale interim
                            # (it would repeat the delivered transcript).
                            continue
                        if text and text != stream.interim_sent:
                            stream.interim_sent = text
                            interims[sid] = text
        self.last_interims = interims

        self.stats.ticks += 1
        elapsed = time.monotonic() - t0
        self.stats.last_tick_seconds = elapsed
        self.stats.last_host_seconds = elapsed - t_device
        return results

    def warmup(self) -> None:
        """Compile every per-tick device program before serving traffic:
        the arena step, and — when enabled — the device beam arena's
        reset/advance/readout (otherwise the first real tick pays a
        multi-second compile mid-stream)."""
        self.arena.warmup()
        if self.device_finals:
            # Compile EVERY final-decode program a serving tick can hit:
            # the decoder is pinned to (final_decode_batch, 64·2^k) buckets
            # and the splitter force-splits phrases at MAX_PHRASE_DURATION
            # (+expand margin) frames, so the bucket set is closed — after
            # this loop no tick ever pays a mid-serving XLA compile.
            # Minutes-long for the fused-LM scan: enable the persistent
            # compile cache (tone_tpu.export.enable_compilation_cache) so
            # deployments pay it once ever.
            self._warm_decode_buckets(self.decoder)
            # Pre-warm the per-request-hotword program family for expected
            # node buckets (the plain buckets above get this treatment —
            # biased requests deserve the same): shapes key the compiled
            # programs, so a MINIMAL automaton padded to the bucket compiles
            # exactly what a real request of that size will run.
            from tone_tpu.ops.beam_decode import make_hotword_tables

            for b in sorted(set(self._hotword_warmup_buckets)):
                eff = self._effective_hotword_bucket(
                    make_hotword_tables(("а",), pad_nodes=b))
                with self._lock:
                    if eff in self._warmed_hotword_buckets:
                        continue
                    self._warmed_hotword_buckets.add(eff)
                try:
                    self._warm_decode_buckets(
                        self.decoder,
                        hotwords=make_hotword_tables(("а",), pad_nodes=eff))
                except Exception:
                    with self._lock:
                        self._warmed_hotword_buckets.discard(eff)
                    raise
        if self.interim_device_beam:
            init, reset, advance, top = self._interim_beam_ops()

            n = self.arena.n_slots
            if self._device_beams is None:
                self._device_beams = init(
                    n, self._device_beam_width, self._device_beam_max_len)
            state = reset(self._device_beams, np.zeros(n, bool))
            frames = self.config.encoder.chunk_size
            # zero active frames: compiles the full program, states unchanged
            state = advance(
                state,
                np.full((n, frames, len(self._labels) + 1), -3.5, np.float32),
                np.zeros(n, np.int32))
            np.asarray(top(state)[0])
            self._device_beams = state

    def _warm_decode_buckets(self, decoder, live=None, hotwords=None) -> None:
        """Compile a decoder's full (batch-bucket, frame-bucket) program
        ladder — the splitter force-splits phrases, so the frame-bucket set
        is closed.  ``live``: optional early-out predicate (hotword warms
        stop when their stream is gone).  ``hotwords``: a HotwordTables —
        warm the stacked per-row-biased program family for its node bucket
        instead of the plain one."""
        from tone_tpu.splitter import StreamingLogprobSplitter as _S

        max_frames = _S.MAX_PHRASE_DURATION + 2 * _S.SPEECH_EXPAND_SIZE
        v = len(self._labels) + 1
        t = 64
        while True:
            if live is not None and not live():
                return
            frames = min(t, max_frames)
            decoder.forward_batch(
                [np.full((frames, v), -3.5, np.float32)],
                hotword_rows=[hotwords] if hotwords is not None else None)
            if t >= max_frames:
                break
            t <<= 1

    # Cap on the stacked per-row hotword tables a batched finals call may
    # upload (3 tables x final_decode_batch x nodes x chars; int32/f32).
    # Typical contact lists stack to single-digit MB; a multi-thousand-node
    # list would push the per-tick upload toward 100 MB, so such requests
    # fall back to a per-stream device-decoder override instead
    # (set_stream_hotwords) — correctness identical, per-phrase throughput.
    MAX_STACKED_HOTWORD_BYTES = 32 * 1024 * 1024

    def _stacked_hotword_bytes(self, tables) -> int:
        """Bytes a batched finals call would upload if this request's
        tables ride the stacked path (at the effective node bucket)."""
        batch = getattr(self.decoder, "max_batch", None) or 1
        n_nodes = self._effective_hotword_bucket(tables)
        n_char = int(tables.next_node.shape[1])
        return 3 * 4 * batch * n_nodes * n_char

    def _effective_hotword_bucket(self, tables) -> int:
        """The node bucket a serving decode will ACTUALLY compile for a
        request's tables: ``_decode_bucket`` stacks biased rows together
        with unbiased rows, and unbiased rows inherit the engine decoder's
        own hotword tables — so the stacked node count is the max of the
        two (both already power-of-two padded; stack_hotword_tables pads
        to the batch maximum)."""
        bucket = int(tables.next_node.shape[0])
        base = getattr(self.decoder, "hotword_tables", None)
        if base is not None:
            bucket = max(bucket, int(base.next_node.shape[0]))
        return bucket

    def _warm_hotword_bucket(self, bucket: int, tables) -> None:
        """Pool task: pre-compile the batched-finals programs for a
        request's EFFECTIVE hotword node bucket (tables padded to it) so
        the stream's first final phrase doesn't pay them inline.  The
        bucket is shared infrastructure (later same-sized requests skip
        the warm), so it runs to completion even if the requesting stream
        ends early.  A failed warm un-marks the bucket so a later
        same-sized request retries instead of paying the compile inline
        forever."""
        try:
            from tone_tpu.ops.beam_decode import pad_hotword_tables

            self._warm_decode_buckets(
                self.decoder, hotwords=pad_hotword_tables(tables, bucket))
        except Exception:  # noqa: BLE001 — warm is best-effort; real decodes
            with self._lock:  # surface their own errors through futures
                self._warmed_hotword_buckets.discard(bucket)

    def _interim_beam_ops(self):
        """(init, reset, advance, top_tokens) for the interim device arena —
        the hotword-biased variants when the final decoder exposes device
        hotword tables (DeviceBeamSearchCTCDecoder(hotwords=...).
        hotword_tables), so interim partials bias exactly like finals."""
        from tone_tpu.ops import beam_decode as bd

        hw = getattr(self.decoder, "hotword_tables", None)
        if isinstance(hw, bd.HotwordTables):
            return (bd.init_hot_beam_state, bd.hot_beam_reset,
                    lambda st, lp, fr: bd.hot_beam_advance(st, lp, fr,
                                                           hotwords=hw),
                    bd.hot_beam_top_tokens)
        return (bd.init_beam_state, bd.beam_reset,
                lambda st, lp, fr: bd.beam_advance(st, lp, fr),
                bd.beam_top_tokens)

    def _tick_device_beams(self, logprobs, ticking, by_slot, reset):
        """Advance the device-resident beam arena one tick and read back the
        best hypothesis per slot.

        Slots reset when the acoustic slot resets (new stream) or at a
        phrase boundary (the finalized phrase goes through the real
        decoder); other ticking slots advance over this tick's frames.
        Mirrors the host carried-search lifecycle (the interim_beam branch
        of tick) with one batched device call instead of per-stream tasks.
        """
        from tone_tpu.ops.beam_decode import top_texts

        init, reset_fn, advance, top = self._interim_beam_ops()
        n = self.arena.n_slots
        if self._device_beams is None:
            self._device_beams = init(
                n, self._device_beam_width, self._device_beam_max_len)
        reset_mask = np.asarray(reset, bool).copy()
        frames = np.zeros(n, np.int32)
        n_frames = logprobs.shape[1]
        for _, stream, is_last in ticking:
            if by_slot.get(stream.slot) or is_last:
                reset_mask[stream.slot] = True
            else:
                frames[stream.slot] = n_frames
        state = reset_fn(self._device_beams, reset_mask)
        state = advance(state, np.asarray(logprobs, np.float32), frames)
        self._device_beams = state
        return top_texts(*top(state))

    def pop_finished(self) -> list[int]:
        """Stream ids whose final (is_last) chunk was processed since the
        last call — lets a transport deliver an end-of-stream marker strictly
        after that stream's final phrases."""
        with self._lock:
            out = self._finished_since_poll
            self._finished_since_poll = []
            return out

    def pop_evicted(self) -> list[int]:
        """Stream ids evicted (idle timeout or slot pressure) since the last
        call — the transport should notify those clients (e.g. close the
        websocket with a distinct code) instead of letting their next feed()
        fail."""
        with self._lock:
            out = self._evicted_since_poll
            self._evicted_since_poll = []
            return out

    def _maybe_submit_interim_locked(self, sid: int, stream: _Stream) -> None:
        """Kick the stream's carried beam search on the decode pool (at most
        one in-flight advance per stream; frames queue between tasks, a
        boundary folds into the next task as a reset)."""
        if stream.beam_task is not None and not stream.beam_task.done():
            return
        if not stream.beam_frames and not stream.beam_reset:
            return
        if stream.beam is None:
            stream.beam = (stream.decoder or self.decoder).streaming()
        beam = stream.beam
        frames = stream.beam_frames
        stream.beam_frames = []
        do_reset, stream.beam_reset = stream.beam_reset, False
        gen = stream.beam_gen

        def work():
            if do_reset:
                beam.reset()
            if frames:
                beam.advance(np.concatenate(frames, axis=0))
            text = beam.result()
            # Store on the worker (not a done-callback) so per-stream store
            # order matches task order; drop if a boundary superseded us.
            with self._interim_lock:
                if stream.beam_gen == gen:
                    # Tag with the generation: the tick thread re-checks at
                    # drain time, because a phrase boundary may land between
                    # this store and the next tick's drain.
                    self._interim_results[sid] = (gen, text)
            return text

        stream.beam_task = self._decode_pool.submit(work)

    def _phrase_times(self, logprob_phrase) -> tuple[float, float]:
        frame_size = 0.03
        bias = self.config.mean_time_bias + self.config.padding / 8000
        start = max(0.0, round(logprob_phrase.start_frame * frame_size - bias, 2))
        end = max(start, round(logprob_phrase.end_frame * frame_size - bias, 2))
        return start, end

    def _word_times(self, logprob_phrase, text: str):
        if not (self.word_timestamps and text):
            return None
        from tone_tpu.align import align_words, spans_to_word_timings

        bias = (self.config.mean_time_bias
                + self.config.padding / self.config.frontend.sample_rate)
        return spans_to_word_timings(
            align_words(logprob_phrase.logprobs, text),
            logprob_phrase.start_frame, self.config.frame_size, bias)

    def _decode(self, logprob_phrase, decoder=None, nbest: int = 0) -> TextPhrase:
        from tone_tpu.decoder import GreedyCTCDecoder

        decoder = decoder or self.decoder or GreedyCTCDecoder()
        logprobs = np.ascontiguousarray(logprob_phrase.logprobs)
        alternatives = None
        if nbest > 1 and hasattr(decoder, "nbest"):
            ranked = decoder.nbest(logprobs, nbest)
            text = ranked[0][0] if ranked else ""
            alternatives = tuple(ranked)
        else:
            text = decoder.forward(logprobs)
        start, end = self._phrase_times(logprob_phrase)
        self.stats.phrases_decoded += 1
        return TextPhrase(text=text, start_time=start, end_time=end,
                          words=self._word_times(logprob_phrase, text),
                          nbest=alternatives)

    def _decode_batch(
            self,
            items: list[tuple[Future, object, int, object]]) -> None:
        """Decode a tick's completed phrases in one batched device call,
        resolving each phrase's future (device_finals path).

        Mixed n-best rides the same call: when any phrase this tick wants
        alternatives, the batch runs through ``forward_batch_nbest`` at the
        largest requested n — the SAME compiled device programs as the
        top-1 path (the ranked readout is a host-side pass over the
        already-transferred beam state), so deployment-wide ``--nbest``
        keeps the batched-finals throughput instead of regressing to
        per-phrase host-pool decodes (docs/serving.md's measured ceiling).

        Mixed per-request hotword biasing rides the same call too: each
        item's HotwordTables (or None) becomes a row of the stacked-table
        program (decoder.forward_batch(hotword_rows=...)); the node count
        keys the compiled program and set_stream_hotwords pre-warms each
        request's bucket.
        """
        max_n = max((n for _, _, n, _ in items), default=0)
        hotword_rows = [hw for _, _, _, hw in items]
        if not any(hw is not None for hw in hotword_rows):
            hotword_rows = None
        try:
            lps = [np.ascontiguousarray(p.logprobs) for _, p, _, _ in items]
            if max_n > 1:
                ranked_rows = self.decoder.forward_batch_nbest(
                    lps, max_n, hotword_rows)
                texts = [r[0][0] if r else "" for r in ranked_rows]
            else:
                texts = self.decoder.forward_batch(lps, hotword_rows)
                ranked_rows = [None] * len(items)
        except BaseException as e:  # noqa: BLE001 — futures must resolve
            for fut, _, _, _ in items:
                fut.set_exception(e)
            return
        for (fut, phrase, n, _), text, ranked in zip(items, texts,
                                                     ranked_rows):
            start, end = self._phrase_times(phrase)
            self.stats.phrases_decoded += 1
            alternatives = tuple(ranked[:n]) if ranked and n > 1 else None
            if self.word_timestamps and text:
                # Forced alignment is host CPU work (up to ~85 ms for a
                # 2000-frame force-split phrase) — run it on the decode
                # pool, not the tick thread.
                def finish(fut=fut, phrase=phrase, text=text,
                           start=start, end=end, alternatives=alternatives):
                    try:
                        fut.set_result(TextPhrase(
                            text=text, start_time=start, end_time=end,
                            words=self._word_times(phrase, text),
                            nbest=alternatives))
                    except BaseException as e:  # noqa: BLE001
                        fut.set_exception(e)

                try:
                    self._decode_pool.submit(finish)
                except RuntimeError:
                    # pool already shut down mid-tick: resolve inline so no
                    # caller blocked on fut.result() hangs forever
                    finish()
            else:
                fut.set_result(TextPhrase(text=text, start_time=start,
                                          end_time=end, nbest=alternatives))

    # -- eviction ----------------------------------------------------------

    def _release_locked(self, sid: int) -> None:
        stream = self._streams.pop(sid, None)
        if stream is None:
            return
        if stream.slot is not None:
            self._free_slots.append(stream.slot)
            # Hand the slot straight to the oldest waiting candidate instead
            # of leaving it idle until the next tick/open (found by the
            # lifecycle fuzz: a freed slot could sit free a whole tick
            # period while candidates queued).
            self._bind_candidates_locked()
        else:
            # a candidate: leave no ghost in the bind queue (stats and
            # queue-capacity checks count it otherwise)
            try:
                self._pending_bind.remove(sid)
            except ValueError:
                pass

    def close(self, sid: int) -> None:
        """Drop a stream immediately (disconnect without flush)."""
        with self._lock:
            self._release_locked(sid)

    FORCE_EVICT_GRACE_SECONDS = 1.0  # never steal a slot active this recently

    def _evict_idle_locked(self, force_one: bool = False) -> None:
        now = time.monotonic()
        # Candidates are reaped on inactivity even with chunks buffered:
        # they can never drain without a slot, so 'pending' must not exempt
        # an abandoned one forever.
        idle = [sid for sid, s in self._streams.items()
                if (not s.pending or s.slot is None)
                and now - s.last_activity > self.IDLE_EVICT_SECONDS]
        if force_one and not idle:
            # Under slot pressure, reclaim the least-recently-active stream —
            # but only if it has nothing queued and has been quiet for the
            # grace period (an actively-streaming client must never lose its
            # slot to a newcomer).
            candidates = [
                sid for sid, s in self._streams.items()
                if not s.pending and s.slot is not None  # stealing a slotless
                # candidate frees nothing
                and now - s.last_activity > self.FORCE_EVICT_GRACE_SECONDS]
            if candidates:
                idle = [min(candidates,
                            key=lambda s: self._streams[s].last_activity)]
        for sid in idle:
            self._release_locked(sid)
        self._evicted_since_poll.extend(idle)

    def shutdown(self) -> None:
        self._decode_pool.shutdown(wait=True)
