"""CTC loss with the reference's torch semantics.

Mirrors ``ToneForCTC.forward`` (reference tone/training/model_wrapper.py:
168-213): blank == pad id 34, ``reduction="mean"`` (per-sequence loss divided
by its target length, then averaged over the batch) and ``zero_infinity=True``
(sequences whose loss is infinite — e.g. targets longer than the output —
contribute zero).  Built on ``optax.ctc_loss`` (verified to match
``torch.nn.functional.ctc_loss`` per-sequence).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss(
    logprobs: jnp.ndarray,
    logprob_lens: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    blank_id: int,
    reduction: str = "mean",
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """Compute the CTC loss.

    Args:
        logprobs: (B, T, V) log-probabilities (already log-softmaxed; optax
            renormalizes internally, which is a no-op on normalized inputs).
        logprob_lens: (B,) valid output frames.
        labels: (B, L) int labels padded with -100 (HF convention,
            reference data_collator.py:81).
        blank_id: the CTC blank class id.
        reduction: "mean" (torch semantics), "sum", or "none".
        zero_infinity: zero out infinite per-sequence losses.

    Returns:
        scalar loss (or (B,) when reduction="none").
    """
    b, t, _ = logprobs.shape
    label_mask = labels >= 0
    label_lens = label_mask.sum(-1)
    labels_clean = jnp.where(label_mask, labels, 0)

    logit_paddings = (jnp.arange(t)[None, :] >= logprob_lens[:, None]).astype(jnp.float32)
    label_paddings = (~label_mask).astype(jnp.float32)

    per_seq = optax.ctc_loss(
        logprobs, logit_paddings, labels_clean, label_paddings, blank_id=blank_id)

    if zero_infinity:
        finite = jnp.isfinite(per_seq) & (per_seq < 1e5)
        per_seq = jnp.where(finite, per_seq, 0.0)

    if reduction == "none":
        return per_seq
    if reduction == "sum":
        return per_seq.sum()
    if reduction == "mean":
        # torch 'mean': divide each loss by its target length, then batch-mean.
        denom = jnp.maximum(label_lens, 1).astype(per_seq.dtype)
        return (per_seq / denom).mean()
    raise ValueError(f"unknown reduction {reduction!r}")
