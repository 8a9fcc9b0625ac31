"""Device-resident multi-stream state arena + masked batched tick step.

The TPU-native equivalent of Triton's sequence batching with implicit state
(reference triton/model/config.pbtxt:30-76): a fixed pool of S stream slots
whose recurrent state lives in HBM as one batched pytree.  Every tick, ONE
jitted step advances all S slots together — constant shapes, zero gathers,
state donated in place.  Slots without a pending chunk keep their previous
state via a masked select; freshly acquired slots are zeroed on-device via a
reset mask.  Nothing but audio chunks (in) and logprobs (out) ever crosses
the host boundary.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import ToneConfig
from tone_tpu.core.model import StreamingState, apply_streaming, init_streaming_state


def batch_axes_tree(config: ToneConfig):
    """Pytree (matching StreamingState) of the slot/batch axis index of each
    leaf, discovered robustly by diffing shapes at two batch sizes (no
    by-size guessing, which breaks when a layer count equals the slot count)."""
    a = init_streaming_state(config, 1)
    b = init_streaming_state(config, 2)

    def axis(x1, x2):
        for d, (s1, s2) in enumerate(zip(x1.shape, x2.shape)):
            if s1 != s2:
                return d
        raise ValueError(f"no batch axis found in {x1.shape}")

    return jax.tree.map(axis, a, b)


def _mask_on_axis(mask: jnp.ndarray, x: jnp.ndarray, axis: int) -> jnp.ndarray:
    shape = [1] * x.ndim
    shape[axis] = mask.shape[0]
    return mask.reshape(shape)


class StreamArena:
    """Owns the batched streaming state for a fixed number of slots."""

    def __init__(self, variables: Any, config: ToneConfig, n_slots: int,
                 sharding=None) -> None:
        """Args:
            variables: model variables pytree (committed to device).
            n_slots: number of concurrent stream slots (the batch size of
                every tick step; compiled once).
            sharding: optional pytree of NamedShardings for the state (use
                ``parallel.mesh.stream_state_shardings`` to spread slots over
                a multi-chip mesh).
        """
        from tone_tpu.acoustic import cast_params_for_inference

        self.config = config
        self.n_slots = n_slots
        self.variables = jax.device_put(cast_params_for_inference(variables, config))
        state = init_streaming_state(config, n_slots)
        if sharding is not None:
            state = jax.device_put(state, sharding)
        self.state = state
        self._axes = batch_axes_tree(config)
        self._step = self._build_step()

    def _build_step(self):
        config = self.config
        axes = batch_axes_tree(config)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(variables, state, chunks, active, reset):
            # Chunks cross the host boundary as int16 (half the H2D bytes of
            # the int32 API dtype); widen on device — numerically identical.
            chunks = chunks.astype(jnp.int32)
            # Zero freshly-acquired slots on-device.
            state = jax.tree.map(
                lambda x, ax: jnp.where(_mask_on_axis(reset, x, ax),
                                        jnp.zeros_like(x), x),
                state, axes)
            logprobs, new_state = apply_streaming(variables, config, chunks, state)
            # Slots without a pending chunk keep their previous state.
            merged = jax.tree.map(
                lambda new, old, ax: jnp.where(_mask_on_axis(active, new, ax), new, old),
                new_state, state, axes)
            return logprobs, merged

        return step

    def tick(self, chunks: np.ndarray, active: np.ndarray,
             reset: np.ndarray) -> np.ndarray:
        """Advance all slots one 300 ms step.

        Args:
            chunks: (S, chunk_samples) int16/int32 (16-bit audio range);
                rows of inactive slots ignored.
            active: (S,) bool — slots that consume their chunk this tick.
            reset: (S,) bool — slots whose state is zeroed before the step
                (new streams; may also be active in the same tick).

        Returns:
            logprobs (S, chunk_frames, vocab+1) float32 (host numpy).
        """
        logprobs, self.state = self._step(
            self.variables, self.state,
            jnp.asarray(np.asarray(chunks, np.int16)),
            jnp.asarray(active), jnp.asarray(reset))
        return np.asarray(logprobs)

    def read_slot(self, slot: int) -> np.ndarray:
        """One slot's recurrent state as the reference-compatible flat fp16
        blob ((STATE_SIZE,), onnx_wrapper.py:34) — the suspend half of
        stream migration.  Safe concurrently with a tick (state trees are
        immutable; an inactive slot's values are unchanged by the merge)."""
        from tone_tpu.core.model import pack_state

        row = jax.tree.map(
            lambda x, ax: jnp.take(x, jnp.array([slot]), axis=ax),
            self.state, self._axes)
        return np.asarray(pack_state(row, self.config))[0]

    def write_slot(self, slot: int, blob: np.ndarray) -> None:
        """Restore a ``read_slot`` blob (possibly from another arena, host,
        or chip — or the reference's own ONNX state) into a slot.  NOT safe
        concurrently with a tick: the tick's output tree would overwrite
        this update — callers serialize against the device step
        (MultiStreamEngine holds its device lock)."""
        from tone_tpu.core.model import unpack_state

        row = unpack_state(np.asarray(blob, np.float16)[None], self.config)

        def put(big, r, ax):
            big0 = jnp.moveaxis(big, ax, 0)
            r0 = jnp.moveaxis(jnp.asarray(r), ax, 0)[0]
            return jnp.moveaxis(big0.at[slot].set(r0.astype(big0.dtype)), 0, ax)

        self.state = jax.tree.map(put, self.state, row, self._axes)

    def warmup(self) -> None:
        """Compile the tick step before serving traffic (the reference
        equivalent is Triton model_warmup, configs/streaming_acoustic/
        config.pbtxt:44-88)."""
        zeros = np.zeros((self.n_slots, self.config.audio_chunk_samples), np.int16)
        none = np.zeros(self.n_slots, bool)
        self.tick(zeros, none, none)
