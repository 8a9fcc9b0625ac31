"""Batched CTC forced alignment on device.

The host Viterbi (tone_tpu/align.py) costs ~1.5 ms per typical phrase —
fine for one stream, ~30 host cores at the chip's ~18k-stream scale.  This
op aligns a whole batch of (phrase, transcript) pairs in one jitted
program: forward DP over the blank-extended states with per-row masks, a
device-side backpointer walk, and host-side span/confidence readout.

Shapes are bucketed (T and S to powers of two) like the device beam
search, so a serving or bulk workload compiles a handful of programs.
Tie-breaking matches the host aligner exactly (stay ≻ prev ≻ skip), so the
best paths — not just the texts — are identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tone_tpu.config import BLANK_ID, LABELS

NEG = np.float32(-1e30)


@functools.partial(jax.jit, static_argnames=("blank_id",))
def _viterbi_path(lp, ext, can_skip, s_len, t_len, *, blank_id=BLANK_ID):
    """Best-path states for a (B, T, S) bucket.

    Args:
        lp: (B, T, V) natural-log probs.
        ext: (B, S) blank-extended label ids, padded (pad cells masked off
            via ``s_len``).
        can_skip: (B, S) skip-transition mask.
        s_len: (B,) valid extended-state counts (2·labels+1).
        t_len: (B,) valid frame counts.

    Returns:
        (path (B, T) int32 — state occupied at each frame (padded frames
        repeat the final state), score (B,) f32).
    """
    b, t_max, _ = lp.shape
    s_max = ext.shape[1]
    s_iota = jnp.arange(s_max)
    s_valid = s_iota[None, :] < s_len[:, None]

    def emit(t):
        e = jnp.take_along_axis(lp[:, t, :], ext, axis=1)
        return jnp.where(s_valid, e, NEG)

    alpha0 = jnp.where(s_iota[None, :] < 2, emit(0), NEG)
    alpha0 = jnp.where(s_valid, alpha0, NEG)

    def fwd(alpha, t):
        active = (t < t_len)[:, None]
        prev = jnp.concatenate([jnp.full((b, 1), NEG), alpha[:, :-1]], axis=1)
        skip = jnp.concatenate([jnp.full((b, 2), NEG), alpha[:, :-2]], axis=1)
        skip = jnp.where(can_skip, skip, NEG)
        # host-parity tie-breaking: stay unless strictly beaten
        choice = jnp.where(prev > alpha, 1, 0)
        best = jnp.maximum(alpha, prev)
        choice = jnp.where(skip > best, 2, choice)
        best = jnp.maximum(best, skip)
        return (jnp.where(active, best + emit(t), alpha),
                jnp.where(active, choice, 0).astype(jnp.int8))

    alpha, psi = jax.lax.scan(fwd, alpha0, jnp.arange(1, t_max))

    last = jnp.take_along_axis(alpha, (s_len - 1)[:, None], axis=1)[:, 0]
    last2 = jnp.take_along_axis(
        alpha, jnp.maximum(s_len - 2, 0)[:, None], axis=1)[:, 0]
    # host parity: argmax over [S-2, S-1] prefers S-2 on ties
    s_final = jnp.where(last2 >= last, jnp.maximum(s_len - 2, 0), s_len - 1)
    score = jnp.maximum(last, last2)

    def back(s, psi_t):
        # psi_t rows of inactive frames are 0 (identity), so padded frames
        # keep the final state.
        step = jnp.take_along_axis(psi_t, s[:, None], axis=1)[:, 0]
        return s - step, s

    s0, path_rev = jax.lax.scan(back, s_final, psi, reverse=True)
    # path_rev[k] = state at frame k+1 (scan emits the carry *entering*
    # each step, walking frames T-1..1 in reverse); s0 = state at frame 0.
    path = jnp.concatenate([s0[:, None], jnp.swapaxes(path_rev, 0, 1)], axis=1)
    return path, score


def _bucket(n: int, lo: int = 32) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def _extended_labels(text: str, blank_id: int = BLANK_ID) -> np.ndarray | None:
    """Blank-extended label ids for a transcript (None for empty text)."""
    words = text.split()
    if not words:
        return None
    ids = np.array([LABELS.index(c) for c in " ".join(words)], np.int32)
    ext = np.full(2 * len(ids) + 1, blank_id, np.int32)
    ext[1::2] = ids
    return ext


def _stage_bucket(logprobs_list, exts, idxs, t_pad: int, s_pad: int):
    """Padded numpy inputs of one (T, S) bucket for :func:`_viterbi_path`."""
    nb = len(idxs)
    v = logprobs_list[idxs[0]].shape[1]
    lp = np.full((nb, t_pad, v), 0.0, np.float32)
    ext = np.zeros((nb, s_pad), np.int32)
    can_skip = np.zeros((nb, s_pad), bool)
    s_len = np.zeros(nb, np.int32)
    t_len = np.zeros(nb, np.int32)
    for row, i in enumerate(idxs):
        phr = np.asarray(logprobs_list[i], np.float32)
        lp[row, :phr.shape[0]] = phr
        e = exts[i]
        ext[row, :e.size] = e
        can_skip[row, 3:e.size:2] = e[3::2] != e[1:-2:2]
        s_len[row] = e.size
        t_len[row] = phr.shape[0]
    return lp, ext, can_skip, s_len, t_len


def align_words_batch(logprobs_list, texts,
                      blank_id: int = BLANK_ID) -> list[list[tuple[str, int, int, float]]]:
    """Device-batched :func:`tone_tpu.align.align_words` over many phrases.

    Returns, per phrase, the same (word, first_frame, last_frame,
    confidence) tuples as the host aligner.  Phrases are grouped into
    (T, S) power-of-two buckets; each bucket is one device call.  Empty
    texts yield empty lists.
    """
    results: list[list[tuple[str, int, int, float]]] = [[] for _ in texts]
    groups: dict[tuple[int, int], list[int]] = {}
    exts: list[np.ndarray | None] = [None] * len(texts)
    for i, (lp, text) in enumerate(zip(logprobs_list, texts)):
        ext = _extended_labels(text, blank_id)
        if ext is None:
            continue
        # host-parity feasibility check (viterbi_align raises the same)
        ids = ext[1::2]
        needed = len(ids) + int(np.sum(ids[1:] == ids[:-1]))
        if lp.shape[0] < needed:
            raise ValueError(
                f"{len(ids)} labels cannot align to {lp.shape[0]} frames")
        exts[i] = ext
        key = (_bucket(lp.shape[0]), _bucket(ext.size))
        groups.setdefault(key, []).append(i)

    for (t_pad, s_pad), idxs in groups.items():
        lp, ext, can_skip, s_len, t_len = _stage_bucket(
            logprobs_list, exts, idxs, t_pad, s_pad)

        path, _ = _viterbi_path(jnp.asarray(lp), jnp.asarray(ext),
                                jnp.asarray(can_skip), jnp.asarray(s_len),
                                jnp.asarray(t_len), blank_id=blank_id)
        path = np.asarray(path)

        for row, i in enumerate(idxs):
            t_i = int(t_len[row])
            p = path[row, :t_i]
            e = exts[i]
            # first/last frame per odd (char) state: the path visits states
            # in nondecreasing order, so per-state spans are contiguous
            first = np.full(e.size, -1, np.int64)
            last = np.full(e.size, -1, np.int64)
            odd_t = np.flatnonzero((p % 2) == 1)
            odd_s = p[odd_t]
            first[odd_s[::-1]] = odd_t[::-1]  # earliest write wins
            last[odd_s] = odd_t
            lp_i = np.asarray(logprobs_list[i], np.float32)
            words = texts[i].split()
            out = []
            ci = 0  # char index within " ".join(words)
            for word in words:
                spans = [(int(first[2 * (ci + k) + 1]),
                          int(last[2 * (ci + k) + 1]),
                          int(e[2 * (ci + k) + 1]))
                         for k in range(len(word))]
                ci += len(word) + 1
                if any(f0 < 0 for f0, _, _ in spans):
                    raise ValueError("no feasible CTC alignment")
                logp = float(np.mean([lp_i[f, c]
                                      for f0, f1, c in spans
                                      for f in range(f0, f1 + 1)]))
                out.append((word, spans[0][0], spans[-1][1],
                            float(np.exp(logp))))
            results[i] = out
    return results
