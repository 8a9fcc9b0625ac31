"""Word n-gram LM as device arrays, for shallow fusion on the TPU.

The reference fuses KenLM into the beam search through C++ callbacks on the
host (tone/decoder.py:108).  For the on-TPU search (tone_tpu/ops/
beam_decode.py) this module re-represents the same model as flat arrays a
jitted program can probe with gathers:

* per n-gram order: entries sorted by a 32-bit key hash, with a second
  32-bit hash for verification (64 bits total — collision probability for
  a 10M-gram model is ~1e-5 over the whole table) and float32
  (log10 prob, log10 backoff) payloads.  Lookup = ``searchsorted`` on the
  sorted keys + a bounded linear probe over the equal-key run;
* the vocabulary as a character trie: edges sorted by ``node * n_chars +
  char`` for the same searchsorted lookup, and a terminal word id per
  node.  Beams walk the trie as they emit characters, so the word id of a
  completed word is one gather at the space event;
* Katz backoff (tone_tpu/decoding/lm.py `ArpaLM.score`) as a statically
  unrolled walk from the longest context: masked adds of backoff weights,
  first-match probability.

Built from the same ``ngrams`` tables every host LM loader produces (ARPA
text or any of the six KenLM binary formats), so any artifact the host
decoders accept can also be fused on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from tone_tpu.config import LABELS


class DeviceLMArrays(NamedTuple):
    """The jit-traversable view of a DeviceLM (passed as an argument so XLA
    caches one program per LM shape).

    The fused search is gather-latency-bound, so the layout minimizes
    sequential lookup rounds: all orders share ONE open-addressing hash
    table (the chain hash of an id sequence depends on its length, so
    grams of different orders cannot structurally collide), bucket =
    h1 & (size-1), entries linearly probed — one contiguous-window gather
    replaces a ~20-round binary search.  The vocab trie's edges use the
    same scheme keyed by node*n_chars+char."""

    keys1: "np.ndarray"      # (S,) u32, open-addressed; empty = sentinel
    keys2: "np.ndarray"      # (S,) u32 verification
    probs: "np.ndarray"      # (S,) f32 log10
    backoffs: "np.ndarray"   # (S,) f32 log10
    edge_keys: "np.ndarray"  # (SE,) u32 node*n_chars+char; empty = 2^32-1
    edge_child: "np.ndarray" # (SE,) i32
    node_word: "np.ndarray"
    unk_id: "np.ndarray"     # () int32
    # context id for out-of-vocabulary completed words: hashes to nothing,
    # reproducing the host search's behavior of keeping the literal OOV
    # string in context (every lookup and backoff probe on it misses) —
    # substituting <unk> would wrongly pick up <unk>'s backoff/grams.
    oov_ctx_id: "np.ndarray"  # () int32 == n_words

_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_SEED1 = np.uint32(0x811C9DC5)
_SEED2 = np.uint32(0x85EBCA6B)
PROBE = 8             # linear-probe window (one contiguous gather)
_SENTINEL = np.uint32(0xFFFFFFFF)
_FIB = np.uint32(0x9E3779B1)


def _bucket(k1, size: int):
    """Fibonacci hashing: the chain hash's low bits carry structure (short
    chains differ mostly in high bits), so buckets come from the HIGH bits
    of a multiply."""
    shift = 32 - int(size).bit_length() + 1
    with np.errstate(over="ignore"):
        return (k1 * _FIB) >> np.uint32(shift)


def _probe_table(k1, k2, payloads, min_size: int = 64):
    """Open-addressing table: place each entry at the first free slot in
    its probe window (vectorized round per probe distance: first entry per
    slot wins, the rest retry at the next distance); grow and rebuild if
    anything would spill past PROBE (load factor starts at ~0.5, so spill
    is rare)."""
    n = len(k1)
    if n and bool(np.any((k1 == _SENTINEL) & (k2 == _SENTINEL))):
        raise ValueError("hash equals the empty-slot sentinel "
                         "(astronomically unlikely); rebuild the LM")
    size = max(min_size, 1 << int(np.ceil(np.log2(max(n, 1) * 2))))
    while True:
        tk1 = np.full(size, _SENTINEL, np.uint32)
        tk2 = np.full(size, _SENTINEL, np.uint32)
        tp = [np.zeros(size, p.dtype) for p in payloads]
        occupied = np.zeros(size, bool)
        base = _bucket(k1, size).astype(np.int64)
        remaining = np.arange(n)
        for d in range(PROBE):
            if not len(remaining):
                break
            slots = (base[remaining] + d) & (size - 1)
            free = ~occupied[slots]
            cand, cslots = remaining[free], slots[free]
            order = np.argsort(cslots, kind="stable")
            cs, ci = cslots[order], cand[order]
            first = np.ones(len(cs), bool)
            first[1:] = cs[1:] != cs[:-1]
            ps, pi = cs[first], ci[first]
            tk1[ps], tk2[ps] = k1[pi], k2[pi]
            for t, p in zip(tp, payloads):
                t[ps] = p[pi]
            occupied[ps] = True
            placed = np.zeros(n, bool)
            placed[pi] = True
            remaining = remaining[~placed[remaining]]
        if not len(remaining):
            return tk1, tk2, tp
        size *= 2


_M1_INT, _M2_INT = int(_M1), int(_M2)
_U32 = 0xFFFFFFFF


def _hash_ids(ids: "list[int] | np.ndarray") -> tuple[np.uint32, np.uint32]:
    """Chain hash of a word-id sequence (twin of the jnp version; plain
    Python ints — numpy scalar ops are ~20x slower per call)."""
    h1, h2 = 0x811C9DC5, 0x85EBCA6B
    for i in ids:
        u = (int(i) + 1) & _U32
        h1 = ((h1 * _M1_INT) & _U32) ^ u
        h2 = ((h2 * _M2_INT) + u) & _U32
    return np.uint32(h1), np.uint32(h2)


@dataclass
class DeviceLM:
    """Flat-array n-gram LM + vocab trie (host container; arrays are numpy
    and become device constants when closed over by a jitted search)."""

    order: int
    unk_id: int
    bos_id: int
    n_words: int
    words: list[str]
    # one combined sorted table over ALL orders (see DeviceLMArrays)
    keys1: np.ndarray     # (N,) u32, sorted
    keys2: np.ndarray     # (N,) u32
    probs: np.ndarray     # (N,) f32  log10
    backoffs: np.ndarray  # (N,) f32  log10
    # vocab trie: edges sorted by node * n_chars + char
    edge_keys: np.ndarray       # (E,) u32
    edge_child: np.ndarray      # (E,) i32
    node_word: np.ndarray       # (nodes,) i32  terminal word id or -1

    @classmethod
    def from_ngrams(cls, ngrams) -> "DeviceLM":
        """``ngrams[k]``: dict mapping (k+1)-word tuples -> (log10 prob,
        log10 backoff) — the shared table format of tone_tpu.decoding."""
        words = sorted({w for (w,) in ngrams[0]})
        wid = {w: i for i, w in enumerate(words)}
        if "<unk>" not in wid:
            raise ValueError("device LM requires an <unk> unigram")
        order = len(ngrams)

        total = sum(len(t) for t in ngrams)
        k1 = np.empty(total, np.uint32)
        k2 = np.empty(total, np.uint32)
        pr = np.empty(total, np.float32)
        bo = np.empty(total, np.float32)
        i = 0
        for table in ngrams:
            for gram, entry in table.items():
                ids = [wid.get(w, wid["<unk>"]) for w in gram]
                k1[i], k2[i] = _hash_ids(ids)
                pr[i] = entry[0]
                bo[i] = entry[1] if len(entry) > 1 else 0.0
                i += 1
        keys1, keys2, (probs, backoffs) = _probe_table(k1, k2, (pr, bo))

        # --- vocab trie over the decoder's character set -------------------
        n_chars = len(LABELS)
        children: list[dict[int, int]] = [{}]
        node_word = [-1]
        for w in words:
            if w in ("<s>", "</s>", "<unk>"):
                continue
            node = 0
            ok = True
            for ch in w:
                c = LABELS.find(ch)
                if c < 0:
                    ok = False  # word not producible by the decoder
                    break
                nxt = children[node].get(c)
                if nxt is None:
                    nxt = len(children)
                    children[node][c] = nxt
                    children.append({})
                    node_word.append(-1)
                node = nxt
            if ok:
                node_word[node] = wid[w]
        edges = [(node * n_chars + c, child)
                 for node, kids in enumerate(children)
                 for c, child in kids.items()]
        ek = np.array([k for k, _ in edges] or [0], np.uint32)
        ec = np.array([c for _, c in edges] or [-1], np.int32)
        if edges and int(ek.max()) >= int(_SENTINEL):
            raise ValueError("vocab trie too large for u32 edge keys")
        edge_keys, _, (edge_child,) = _probe_table(ek, ek, (ec,))

        return cls(
            order=order, unk_id=wid["<unk>"],
            bos_id=wid.get("<s>", wid["<unk>"]), n_words=len(words),
            words=words, keys1=keys1, keys2=keys2, probs=probs,
            backoffs=backoffs, edge_keys=edge_keys, edge_child=edge_child,
            node_word=np.asarray(node_word, np.int32))

    @classmethod
    def from_file(cls, path) -> "DeviceLM":
        """Build from an LM artifact: ARPA text (optionally .gz) or a KenLM
        trie-family binary, using load_lm's single format dispatch.
        Probing binaries store only hashed keys (the stored grams cannot be
        enumerated), so they work with host fusion and n-best rescoring but
        not device fusion — rebuild as trie (``build_binary trie``) or ARPA
        to fuse on device."""
        from tone_tpu.decoding.lm import ArpaLM, load_lm

        lm = load_lm(path)
        if isinstance(lm, ArpaLM):
            return cls.from_ngrams(lm._ngrams)
        from tone_tpu.decoding.kenlm_trie import KenLMTrie, trie_to_ngrams

        if isinstance(lm, KenLMTrie):
            return cls.from_ngrams(trie_to_ngrams(lm))
        raise ValueError(
            f"{path}: probing-format KenLM binaries cannot be enumerated "
            "into device-LM tables; rebuild as trie (`build_binary trie`) "
            "or ARPA, or use n-best rescoring "
            "(DeviceBeamSearchCTCDecoder without fusion)")

    def arrays(self) -> DeviceLMArrays:
        """Device-resident view, uploaded once and cached — passing numpy
        here would re-upload the (possibly 100MB+) tables on every
        fused_beam_advance call."""
        cached = getattr(self, "_device_arrays", None)
        if cached is None:
            import jax

            cached = DeviceLMArrays(*jax.device_put(tuple(DeviceLMArrays(
                keys1=self.keys1, keys2=self.keys2,
                probs=self.probs, backoffs=self.backoffs,
                edge_keys=self.edge_keys, edge_child=self.edge_child,
                node_word=self.node_word,
                unk_id=np.asarray(self.unk_id, np.int32),
                oov_ctx_id=np.asarray(self.n_words, np.int32)))))
            object.__setattr__(self, "_device_arrays", cached)
        return cached

    # -- host twins (for tests and trailing-word scoring) -------------------

    def _lookup_host(self, ids) -> tuple[bool, float, float]:
        k1, k2 = _hash_ids(ids)
        size = len(self.keys1)
        base = int(_bucket(k1, size))
        for d in range(PROBE):
            j = (base + d) & (size - 1)
            if self.keys1[j] == k1 and self.keys2[j] == k2:
                return True, float(self.probs[j]), float(self.backoffs[j])
        return False, 0.0, 0.0

    def score_ids(self, context_ids, word_id: int) -> float:
        """log10 P(word | context) with Katz backoff — id-level twin of
        ArpaLM.score (tone_tpu/decoding/lm.py)."""
        context_ids = list(context_ids)[-(self.order - 1):]
        backoff_sum = 0.0
        for start in range(len(context_ids) + 1):
            ctx = context_ids[start:]
            if len(ctx) + 1 <= self.order:
                found, prob, _ = self._lookup_host([*ctx, word_id])
                if found:
                    return prob + backoff_sum
            if ctx:
                cfound, _, cb = self._lookup_host(ctx)
                if cfound:
                    backoff_sum += cb
        found, prob, _ = self._lookup_host([word_id])
        return prob + backoff_sum  # <unk> is guaranteed present

    def word_id(self, word: str) -> int:
        import bisect

        i = bisect.bisect_left(self.words, word)
        if i < len(self.words) and self.words[i] == word:
            return i
        return self.unk_id

    def ctx_id(self, word: str) -> int:
        """Context id of a word: its vocab id, or the OOV sentinel (which
        misses every table probe — matching ArpaLM, which keeps the
        literal unknown string in context rather than substituting <unk>)."""
        import bisect

        i = bisect.bisect_left(self.words, word)
        if i < len(self.words) and self.words[i] == word:
            return i
        return self.n_words

    def score(self, context, word: str) -> float:
        """String-level scorer (LanguageModel-compatible), host-side."""
        return self.score_ids([self.ctx_id(w) for w in context],
                              self.word_id(word))

    def begin_context(self) -> tuple[str, ...]:
        return ("<s>",)
