"""Batched greedy CTC decode with the argmax/collapse computed on device.

The host-side greedy decoder (tone_tpu/decoder.py) handles one phrase at a
time; for the multi-stream server and bulk evaluation this op runs the
argmax + repeat-collapse + blank-drop masks for a whole batch in one jitted
call, leaving only string assembly on the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import BLANK_ID, LABELS


@jax.jit
def greedy_collapse_tokens(logprobs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V) logprobs -> (tokens (B, T) int32, keep (B, T) bool).

    ``keep`` marks positions that survive CTC collapse: the first frame of
    each run of a non-blank token.
    """
    tokens = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
    prev = jnp.pad(tokens[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    keep = (tokens != prev) & (tokens != BLANK_ID)
    return tokens, keep


def batched_greedy_decode(logprobs, lengths=None) -> list[str]:
    """Decode a batch of logprobs to texts (device argmax/collapse, host join).

    Args:
        logprobs: (B, T, V) array (device or host).
        lengths: optional (B,) valid frame counts.
    """
    tokens, keep = greedy_collapse_tokens(jnp.asarray(logprobs))
    tokens, keep = np.asarray(tokens), np.asarray(keep)
    if lengths is not None:
        t = tokens.shape[1]
        keep = keep & (np.arange(t)[None, :] < np.asarray(lengths)[:, None])
    out = []
    for row_tokens, row_keep in zip(tokens, keep):
        ids = row_tokens[row_keep]
        out.append("".join(LABELS[i] for i in ids).strip())
    return out
