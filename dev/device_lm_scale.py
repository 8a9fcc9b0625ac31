"""Scale envelope of the device-resident LM (VERDICT-r2 weak #2).

A production Russian-telephony LM has tens of millions of grams; the
device fusion path had only been measured at 626k.  This script
procedurally generates DeviceLM tables at increasing gram counts (the
vectorized twin of ``DeviceLM.from_ngrams`` — same chain hash, same
probe-table layout, realistic 300k-word vocab trie) and measures, per
size:

* host build time and HBM footprint of ``DeviceLMArrays``;
* steady-state fused-search throughput (``fused_beam_advance``,
  two-point slope so tunneled-chip ack skew cancels: RTFx from the
  marginal cost of extra frames).

Run:  python dev/device_lm_scale.py [--grams 0.6e6 2.5e6 10e6 25e6]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _chain_hash_cols(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized twin of device_lm._hash_ids over rows of an (N, K) id
    matrix (-1 columns = absent, must be trailing)."""
    from tone_tpu.decoding.device_lm import _M1, _M2, _SEED1, _SEED2

    h1 = np.full(len(ids), _SEED1, np.uint32)
    h2 = np.full(len(ids), _SEED2, np.uint32)
    with np.errstate(over="ignore"):
        for k in range(ids.shape[1]):
            col = ids[:, k]
            live = col >= 0
            u = (col.astype(np.int64) + 1).astype(np.uint32)
            h1 = np.where(live, (h1 * _M1) ^ u, h1)
            h2 = np.where(live, h2 * _M2 + u, h2)
    return h1, h2


def synth_device_lm(n_grams: int, n_words: int = 300_000, order: int = 3,
                    seed: int = 0):
    """A DeviceLM with ``n_grams`` total entries over a realistic vocab.

    Unigrams cover the whole vocab; the rest split 60/40 between bigrams
    and trigrams of uniformly random word ids (deduplicated).  Payloads
    are plausible log10 probabilities.  The trie is built from real
    generated word strings, so the search-side trie walk is realistic.
    """
    from tone_tpu.config import LABELS
    from tone_tpu.decoding.device_lm import DeviceLM, _build_vocab_trie, _probe_table

    rng = np.random.default_rng(seed)
    chars = [c for c in LABELS if c != " "]
    # word strings: base-32-ish encodings of their id — distinct, cheap,
    # realistic lengths (6-8 chars)
    t0 = time.monotonic()
    words = []
    for i in range(n_words):
        w, x = [], i + n_words
        while x:
            w.append(chars[x % len(chars)])
            x //= len(chars)
        words.append("".join(w))
    edge_keys, edge_child, node_word, edge_probe = _build_vocab_trie(
        (w, i + 3) for i, w in enumerate(words))
    t_trie = time.monotonic() - t0

    t0 = time.monotonic()
    n_uni = n_words + 3  # + <s> </s> <unk>
    n_bi = max(0, int((n_grams - n_uni) * 0.6))
    n_tri = max(0, n_grams - n_uni - n_bi)
    parts = []
    uni = np.full((n_uni, order), -1, np.int64)
    uni[:, 0] = np.arange(n_uni)
    parts.append(uni)
    for n, count in ((2, n_bi), (3, n_tri)):
        ids = np.full((count, order), -1, np.int64)
        ids[:, :n] = rng.integers(0, n_uni, (count, n))
        parts.append(ids)
    ids = np.concatenate(parts)
    k1, k2 = _chain_hash_cols(ids)
    # dedupe on the 64-bit hash (collisions here = same gram, effectively)
    _, keep = np.unique(k1.astype(np.uint64) << np.uint64(32) | k2, return_index=True)
    k1, k2 = k1[keep], k2[keep]
    pr = rng.uniform(-6.0, -0.5, len(k1)).astype(np.float32)
    bo = rng.uniform(-1.5, 0.0, len(k1)).astype(np.float32)
    keys1, keys2, (probs, backoffs), probe = _probe_table(k1, k2, (pr, bo))
    t_tables = time.monotonic() - t0

    lm = DeviceLM(
        order=order, unk_id=0, bos_id=1, n_words=n_uni,
        words=["<unk>", "<s>", "</s>", *words],
        keys1=keys1, keys2=keys2, probs=probs, backoffs=backoffs,
        edge_keys=edge_keys, edge_child=edge_child, node_word=node_word,
        probe=probe, edge_probe=edge_probe)
    return lm, len(k1), {"trie_s": round(t_trie, 1), "tables_s": round(t_tables, 1)}


def measure(lm, n_grams_actual: int, beam_width: int, batch: int) -> dict:
    import jax

    from tone_tpu.config import BLANK_ID, LABELS
    from tone_tpu.ops.beam_decode import (
        fused_beam_advance, fused_beam_nbest, init_fused_beam_state)

    arrs = lm.arrays()
    hbm = sum(int(np.asarray(a).nbytes)
              for a in jax.tree_util.tree_leaves(arrs))
    v = len(LABELS) + 1
    rng = np.random.default_rng(1)

    def logprobs(t):
        x = rng.normal(0, 3.0, (batch, t, v)).astype(np.float32)
        x[..., BLANK_ID] += 2.0
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    t_short, t_long = 64, 256
    lp_short, lp_long = logprobs(t_short), logprobs(t_long)
    lens_s = np.full(batch, t_short)
    lens_l = np.full(batch, t_long)

    def run(lp, lens):
        st = init_fused_beam_state(batch, beam_width, lm)
        st = fused_beam_advance(st, lp, arrs, lens)
        jax.block_until_ready(st.scores)
        return st

    run(lp_short, lens_s), run(lp_long, lens_l)  # compile both shapes
    reps = 3
    t0 = time.monotonic()
    for _ in range(reps):
        run(lp_short, lens_s)
    t_s = (time.monotonic() - t0) / reps
    t0 = time.monotonic()
    for _ in range(reps):
        st = run(lp_long, lens_l)
    t_l = (time.monotonic() - t0) / reps
    per_frame = (t_l - t_s) / (t_long - t_short)
    rtfx = (batch * 0.03) / per_frame  # 30 ms of audio per frame per stream
    return {
        "grams": n_grams_actual,
        "hbm_mb": round(hbm / 1e6, 1),
        "per_frame_us": round(per_frame * 1e6, 1),
        "rtfx_batch%d_w%d" % (batch, beam_width): round(rtfx, 1),
    }


def synth_probing_lm(n_grams: int, n_words: int = 100_000, seed: int = 0):
    """The flagship-path variant: write a PROBING ``kenlm.bin`` of
    ``n_grams`` entries through the first-party writer (the published
    artifact's format, reference tone/decoder.py:84-95), then load it
    back through DeviceProbingLM — binary write + parse + re-bucketing +
    vocab-trie build all at production scale."""
    import tempfile

    from tone_tpu.config import LABELS
    from tone_tpu.decoding.device_lm import DeviceProbingLM
    from tone_tpu.decoding.kenlm_binary import write_kenlm_binary

    rng = np.random.default_rng(seed)
    chars = [c for c in LABELS if c != " "]
    words = []
    for i in range(n_words):
        w, x = [], i + n_words
        while x:
            w.append(chars[x % len(chars)])
            x //= len(chars)
        words.append("".join(w))

    t0 = time.monotonic()
    uni = {("<unk>",): (-3.0, -0.5), ("<s>",): (-99.0, -0.4),
           ("</s>",): (-2.0, 0.0)}
    for w in words:
        uni[(w,)] = (round(float(rng.uniform(-6, -1)), 4), -0.3)
    n_bi = max(0, int((n_grams - len(uni)) * 0.6))
    n_tri = max(0, n_grams - len(uni) - n_bi)
    bi, tri = {}, {}
    ids = rng.integers(0, n_words, (n_bi, 2))
    for a, b in ids:
        bi[(words[a], words[b])] = (-1.5, -0.2)
    ids = rng.integers(0, n_words, (n_tri, 3))
    for a, b, c in ids:
        tri[(words[a], words[b], words[c])] = (-1.0, 0.0)
    t_tables = time.monotonic() - t0

    path = Path(tempfile.mkdtemp()) / "kenlm.bin"
    t0 = time.monotonic()
    write_kenlm_binary([uni, bi, tri], path)
    t_write = time.monotonic() - t0
    t0 = time.monotonic()
    lm = DeviceProbingLM.from_file(path)
    t_load = time.monotonic() - t0
    t0 = time.monotonic()
    DeviceProbingLM.from_file(path)  # second load rides the disk cache
    t_reload = time.monotonic() - t0
    total = len(uni) + len(bi) + len(tri)
    return lm, total, {"synth_s": round(t_tables, 1),
                       "write_s": round(t_write, 1),
                       "load_s": round(t_load, 1),
                       "cached_reload_s": round(t_reload, 1),
                       "bin_mb": round(path.stat().st_size / 1e6, 1),
                       "probe": lm.probe}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--grams", type=float, nargs="+",
                        default=[6e5, 2.5e6, 1e7, 2.5e7])
    parser.add_argument("--beam-width", type=int, default=16)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--probing", action="store_true",
                        help="go through a written probing kenlm.bin and "
                             "DeviceProbingLM (the published-artifact path) "
                             "instead of synthetic DeviceLM tables")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    for g in args.grams:
        if args.probing:
            lm, actual, build = synth_probing_lm(int(g))
        else:
            lm, actual, build = synth_device_lm(int(g))
        row = measure(lm, actual, args.beam_width, args.batch)
        row.update(build)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
