"""TPU compute ops: fused kernels and batched decode primitives."""

from tone_tpu.ops.beam_decode import (
    beam_advance,
    beam_nbest,
    beam_search_decode,
    init_beam_state,
)
from tone_tpu.ops.greedy import batched_greedy_decode, greedy_collapse_tokens

__all__ = [
    "batched_greedy_decode",
    "greedy_collapse_tokens",
    "beam_advance",
    "beam_nbest",
    "beam_search_decode",
    "init_beam_state",
]
