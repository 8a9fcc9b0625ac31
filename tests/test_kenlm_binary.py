"""KenLM binary-format reader/writer tests.

The reference's published LM artifact is ``kenlm.bin`` (reference
tone/decoder.py:84-95) — KenLM's probing binary format.  With no KenLM in
this environment the format is validated by round-trip (our writer produces
the documented layout, our two independent readers — Python and C++ — parse
it back) plus score-equality fuzzing against the ARPA scorer on
suffix-closed synthetic models.
"""

import math
import random
from collections import Counter

import numpy as np
import pytest

from tone_tpu.decoding.kenlm_binary import (
    KenLMBinary,
    combine_word_hash,
    murmur64a,
    read_kenlm_binary,
    write_kenlm_binary,
)
from tone_tpu.decoding.lm import ArpaLM, load_lm


def _synthetic_ngrams(seed: int, order: int = 3, n_words: int = 8):
    """Suffix-closed n-gram tables from sampled sentences (the invariant real
    ARPA files satisfy and that KenLM's short-to-long matching requires)."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(n_words)] + ["да", "нет", "ёж"]
    sents = [[rng.choice(words) for _ in range(rng.randint(1, 7))]
             for _ in range(250)]
    counters = [Counter() for _ in range(order)]
    for s in sents:
        toks = ["<s>"] + s + ["</s>"]
        for n in range(1, order + 1):
            for i in range(len(toks) - n + 1):
                counters[n - 1][tuple(toks[i:i + n])] += 1
    counters[0][("<unk>",)] += 1
    ngrams = []
    for n, counter in enumerate(counters, start=1):
        tot = sum(counter.values())
        table = {}
        for gram, c in counter.items():
            backoff = 0.0 if n == order else round(rng.uniform(-0.9, -0.05), 4)
            table[gram] = (round(math.log10(c / tot), 4), backoff)
        ngrams.append(table)
    return ngrams


@pytest.fixture(scope="module")
def lm_pair(tmp_path_factory):
    ngrams = _synthetic_ngrams(0)
    path = tmp_path_factory.mktemp("kenlm") / "lm.bin"
    write_kenlm_binary(ngrams, path)
    return ngrams, path


def test_roundtrip_structure(lm_pair):
    ngrams, path = lm_pair
    parsed = read_kenlm_binary(path)
    assert parsed.order == 3
    assert parsed.counts == [len(t) for t in ngrams]
    # every vocab word present with a unique id
    assert len(parsed.vocab_ids) == len(ngrams[0]) - 1  # <unk> not in table
    assert parsed.words[0] == "<unk>"
    assert len(parsed.words) == len(ngrams[0])


def test_load_lm_dispatches_on_magic(lm_pair):
    _, path = lm_pair
    lm = load_lm(path)
    assert isinstance(lm, KenLMBinary)
    assert lm.order == 3


def test_scores_match_arpa(lm_pair):
    ngrams, path = lm_pair
    arpa = ArpaLM(ngrams)
    binlm = KenLMBinary(path)
    rng = random.Random(0)
    allw = [w for (w,) in ngrams[0]]
    for _ in range(2000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        word = rng.choice(allw + ["zzz-oov"])
        a = arpa.score(ctx, word)
        b = binlm.score(ctx, word)
        assert a == pytest.approx(b, abs=1e-4), (ctx, word)


def test_native_scorer_matches_python(lm_pair):
    from tone_tpu.decoding.native.beamsearch import NativeLM, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    _, path = lm_pair
    py = KenLMBinary(path)
    cc = NativeLM(path)
    assert cc.order == py.order
    ngrams = lm_pair[0]
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(1)
    for _ in range(2000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        word = rng.choice(allw + ["ёёё-oov"])
        assert cc.score(ctx, word) == pytest.approx(py.score(ctx, word), abs=1e-5)


def test_beam_decode_arpa_equals_binary(lm_pair, tmp_path):
    """BeamSearchCTCDecoder.from_local on .arpa and .bin of the same model
    produce identical transcripts (the from_hugging_face default path)."""
    from tone_tpu.decoder import BeamSearchCTCDecoder

    ngrams, bin_path = lm_pair
    arpa_path = tmp_path / "lm.arpa"
    with open(arpa_path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for n, t in enumerate(ngrams, 1):
            f.write(f"ngram {n}={len(t)}\n")
        for n, t in enumerate(ngrams, 1):
            f.write(f"\n\\{n}-grams:\n")
            for gram, (p, b) in t.items():
                line = f"{p}\t{' '.join(gram)}"
                if n < len(ngrams):
                    line += f"\t{b}"
                f.write(line + "\n")
        f.write("\n\\end\\\n")

    d_arpa = BeamSearchCTCDecoder.from_local(arpa_path)
    d_bin = BeamSearchCTCDecoder.from_local(bin_path)
    rng = np.random.default_rng(0)
    for _ in range(3):
        lp = np.log(rng.dirichlet(np.full(35, 0.3), size=50)).astype(np.float32)
        assert d_arpa.forward(lp) == d_bin.forward(lp)


def test_unknown_words_map_to_unk(lm_pair):
    _, path = lm_pair
    lm = KenLMBinary(path)
    assert lm.word_id("<unk>") == 0
    assert lm.word_id("<UNK>") == 0
    assert lm.word_id("definitely-not-in-vocab") == 0
    assert lm.word_id("да") > 0


def test_murmur64a_reference_vectors():
    # Self-consistency + stability pins for the vocab hash: these values are
    # load-bearing (they key the on-disk vocab table) and must never change.
    assert murmur64a(b"") == murmur64a(b"", 0)
    assert murmur64a(b"<unk>") != murmur64a(b"<UNK>")
    h1 = murmur64a("привет".encode("utf-8"))
    assert isinstance(h1, int) and 0 <= h1 < 2**64
    # chaining is order-sensitive
    assert combine_word_hash(combine_word_hash(5, 1), 2) != \
        combine_word_hash(combine_word_hash(5, 2), 1)


def test_trie_format_rejected(tmp_path):
    from tone_tpu.decoding.kenlm_binary import MAGIC, _MAGIC_PAD, _SANITY_SIZE
    import struct

    data = bytearray(MAGIC.ljust(_MAGIC_PAD, b"\x00"))
    data += b"\x00" * (_SANITY_SIZE - len(data))
    data += struct.pack("<B3xfIB3xI", 3, 1.5, 2, 0, 1)  # model_type=2 TRIE
    data += struct.pack("<3Q", 10, 10, 10)
    p = tmp_path / "trie.bin"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="TRIE"):
        read_kenlm_binary(p)


def test_rest_probing_layout(tmp_path):
    """The REST_PROBING (20-byte-entry) variant parses and scores like the
    plain probing layout of the same model — exercises the rest-weights
    strides in both the Python reader and the native scorer."""
    from tone_tpu.decoding.kenlm_binary import MODEL_REST_PROBING

    ngrams = _synthetic_ngrams(5)
    p_plain = tmp_path / "plain.bin"
    p_rest = tmp_path / "rest.bin"
    write_kenlm_binary(ngrams, p_plain)
    write_kenlm_binary(ngrams, p_rest, model_type=MODEL_REST_PROBING)
    assert p_rest.stat().st_size > p_plain.stat().st_size

    a, b = KenLMBinary(p_plain), KenLMBinary(p_rest)
    assert b._p.model_type == MODEL_REST_PROBING
    rng = random.Random(2)
    allw = [w for (w,) in ngrams[0]]
    for _ in range(500):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
        w = rng.choice(allw)
        assert a.score(ctx, w) == pytest.approx(b.score(ctx, w), abs=1e-6)

    from tone_tpu.decoding.native.beamsearch import NativeLM, native_available
    if native_available():
        cc = NativeLM(p_rest)
        for _ in range(500):
            ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
            w = rng.choice(allw)
            assert cc.score(ctx, w) == pytest.approx(a.score(ctx, w), abs=1e-5)


def test_bucket_count_uses_float32_like_kenlm():
    """KenLM computes (uint64)(multiplier * (float)entries) in single
    precision; for tables >= 2^24 entries the float64 result differs by one
    and every later section offset would be wrong."""
    from tone_tpu.decoding.kenlm_binary import _buckets

    entries = (1 << 24) + 1
    # float32 rounds entries to 2^24 exactly -> 1.5 * 2^24
    assert _buckets(entries, 1.5) == 25165824
    assert _buckets(entries, 1.5) != int(1.5 * float(entries))
    assert _buckets(10, 1.5) == 15  # small tables unchanged
