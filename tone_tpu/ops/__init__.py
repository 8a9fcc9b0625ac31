"""TPU compute ops: fused kernels and batched decode primitives."""

from tone_tpu.ops.greedy import batched_greedy_decode, greedy_collapse_tokens

__all__ = ["batched_greedy_decode", "greedy_collapse_tokens"]
