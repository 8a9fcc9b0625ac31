"""KenLM trie binary-format reader/writer tests.

Complements tests/test_kenlm_binary.py: the TRIE / QUANT_TRIE formats
(``build_binary trie``) are validated by round-trip through the first-party
writer plus score-equality fuzzing against the ARPA scorer, including pruned
models (blank materialization) and the trie -> probing conversion used by
the native C++ scorer.
"""

import math
import random
from collections import Counter

import numpy as np
import pytest

from tone_tpu.decoding.kenlm_binary import kenlm_model_type, write_kenlm_binary
from tone_tpu.decoding.kenlm_trie import (
    MODEL_QUANT_TRIE,
    MODEL_TRIE,
    KenLMTrie,
    read_kenlm_trie,
    trie_to_ngrams,
    write_kenlm_trie,
)
from tone_tpu.decoding.lm import ArpaLM, load_lm


def _synthetic_ngrams(seed: int, order: int = 3, n_words: int = 8,
                      n_sents: int = 250):
    """Suffix-closed n-gram tables (same construction as the probing tests)."""
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(n_words)] + ["да", "нет", "ёж"]
    sents = [[rng.choice(words) for _ in range(rng.randint(1, 7))]
             for _ in range(n_sents)]
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
def trie_pair(tmp_path_factory):
    ngrams = _synthetic_ngrams(0)
    path = tmp_path_factory.mktemp("kenlm_trie") / "lm.bin"
    write_kenlm_trie(ngrams, path)
    return ngrams, path


def test_roundtrip_structure(trie_pair):
    ngrams, path = trie_pair
    parsed = read_kenlm_trie(path)
    assert parsed.model_type == MODEL_TRIE
    assert parsed.search_version == 1
    assert parsed.order == 3
    # suffix-closed input => no blanks => counts match the source tables
    assert parsed.counts == [len(t) for t in ngrams]
    assert len(parsed.vocab_hashes) == len(ngrams[0]) - 1  # <unk> excluded
    assert parsed.words[0] == "<unk>"
    assert len(parsed.words) == len(ngrams[0])
    assert kenlm_model_type(path) == MODEL_TRIE


def test_load_lm_dispatches_to_trie(trie_pair):
    _, path = trie_pair
    lm = load_lm(path)
    assert isinstance(lm, KenLMTrie)
    assert lm.order == 3


def test_scores_match_arpa(trie_pair):
    ngrams, path = trie_pair
    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    rng = random.Random(0)
    allw = [w for (w,) in ngrams[0]]
    for _ in range(2000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        word = rng.choice(allw + ["zzz-oov"])
        a = arpa.score(ctx, word)
        b = trie.score(ctx, word)
        assert a == pytest.approx(b, abs=1e-4), (ctx, word)


def test_scores_match_probing_binary(trie_pair, tmp_path):
    """The same model in trie and probing form scores identically."""
    from tone_tpu.decoding.kenlm_binary import KenLMBinary

    ngrams, trie_path = trie_pair
    probing_path = tmp_path / "probing.bin"
    write_kenlm_binary(ngrams, probing_path)
    trie = KenLMTrie(trie_path)
    probing = KenLMBinary(probing_path)
    rng = random.Random(3)
    allw = [w for (w,) in ngrams[0]]
    for _ in range(1000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
        w = rng.choice(allw)
        assert trie.score(ctx, w) == pytest.approx(probing.score(ctx, w),
                                                   abs=1e-6)


def test_trie_to_ngrams_roundtrip(trie_pair):
    ngrams, path = trie_pair
    recovered = trie_to_ngrams(KenLMTrie(path))
    assert [len(t) for t in recovered] == [len(t) for t in ngrams]
    for n, (orig, rec) in enumerate(zip(ngrams, recovered), start=1):
        assert set(orig) == set(rec)
        for gram, (p, b) in orig.items():
            rp, rb = rec[gram]
            assert rp == pytest.approx(p, abs=1e-6), gram
            if n < len(ngrams):
                assert rb == pytest.approx(b, abs=1e-6), gram


def test_pruned_model_blanks(tmp_path):
    """Dropping a bigram that backs a trigram (a pruned model) forces the
    writer to materialize a blank; scoring still equals the ARPA scorer."""
    ngrams = _synthetic_ngrams(7, n_sents=120)
    # prune one bigram that is the suffix of some trigram
    victim = next(g[-2:] for g in ngrams[2] if g[-2:] in ngrams[1])
    del ngrams[1][victim]
    path = tmp_path / "pruned.bin"
    write_kenlm_trie(ngrams, path)
    parsed = read_kenlm_trie(path)
    assert parsed.counts[1] == len(ngrams[1]) + 1  # the blank

    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(1)
    # direct hit on the pruned path plus fuzz around it
    assert trie.score((victim[0],), victim[1]) == pytest.approx(
        arpa.score((victim[0],), victim[1]), abs=1e-4)
    for _ in range(1000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
        w = rng.choice(allw)
        assert trie.score(ctx, w) == pytest.approx(arpa.score(ctx, w),
                                                   abs=1e-4), (ctx, w)


def test_quant_trie_exact_when_bins_cover(tmp_path):
    """With more bins than distinct values, KenLM's equal-count binning is
    exact — QUANT_TRIE scores equal the ARPA scorer to f32 precision."""
    ngrams = _synthetic_ngrams(2, n_sents=100)
    path = tmp_path / "quant.bin"
    write_kenlm_trie(ngrams, path, quant_bits=(13, 13))
    parsed = read_kenlm_trie(path)
    assert parsed.model_type == MODEL_QUANT_TRIE
    assert parsed.prob_bits == 13 and parsed.backoff_bits == 13
    assert kenlm_model_type(path) == MODEL_QUANT_TRIE

    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(2)
    for _ in range(1500):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        w = rng.choice(allw + ["oov-word"])
        assert trie.score(ctx, w) == pytest.approx(arpa.score(ctx, w),
                                                   abs=2e-4), (ctx, w)


def test_quant_trie_lossy_bounded(tmp_path):
    """Coarse 8/8-bit quantization stays within the trained bin spread."""
    ngrams = _synthetic_ngrams(4)
    path = tmp_path / "quant8.bin"
    write_kenlm_trie(ngrams, path, quant_bits=(8, 8))
    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(4)
    diffs = []
    for _ in range(500):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
        w = rng.choice(allw)
        s = trie.score(ctx, w)
        assert math.isfinite(s)
        diffs.append(abs(s - arpa.score(ctx, w)))
    assert max(diffs) < 0.5
    assert sum(diffs) / len(diffs) < 0.05


def test_native_conversion_and_decode_parity(trie_pair, tmp_path):
    """BeamSearchCTCDecoder.from_local on a trie binary decodes identically
    to the ARPA form of the same model (covering the trie -> probing
    conversion feeding the native C++ scorer when available)."""
    from tone_tpu.decoder import BeamSearchCTCDecoder

    ngrams, trie_path = trie_pair
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
    d_trie = BeamSearchCTCDecoder.from_local(trie_path)
    rng = np.random.default_rng(0)
    for _ in range(3):
        lp = np.log(rng.dirichlet(np.full(35, 0.3), size=50)).astype(np.float32)
        assert d_arpa.forward(lp) == d_trie.forward(lp)


def test_native_scorer_matches_python_via_conversion(trie_pair):
    from tone_tpu.decoder import _native_lm_path
    from tone_tpu.decoding.native.beamsearch import NativeLM, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    ngrams, trie_path = trie_pair
    converted = _native_lm_path(trie_path)
    assert converted != trie_path
    py = KenLMTrie(trie_path)
    cc = NativeLM(converted)
    assert cc.order == py.order
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(5)
    for _ in range(1000):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        w = rng.choice(allw + ["ёёё-oov"])
        assert cc.score(ctx, w) == pytest.approx(py.score(ctx, w), abs=1e-5)


def test_non_trie_type_rejected(tmp_path):
    import struct

    from tone_tpu.decoding.kenlm_binary import MAGIC, _MAGIC_PAD, _SANITY_SIZE

    data = bytearray(MAGIC.ljust(_MAGIC_PAD, b"\x00"))
    data += b"\x00" * (_SANITY_SIZE - len(data))
    data += struct.pack("<B3xfIB3xI", 3, 1.5, 0, 0, 1)  # PROBING
    data += struct.pack("<3Q", 10, 10, 10)
    p = tmp_path / "probing.bin"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="probing"):
        read_kenlm_trie(p)


def test_unknown_words_map_to_unk(trie_pair):
    _, path = trie_pair
    lm = KenLMTrie(path)
    assert lm.word_id("<unk>") == 0
    assert lm.word_id("<UNK>") == 0
    assert lm.word_id("definitely-not-in-vocab") == 0
    assert lm.word_id("да") > 0
    # trie ids are hash-rank ids: dense in [0, vocab)
    ids = sorted(lm.word_id(w) for w in lm.words)
    assert ids == list(range(len(lm.words)))


def test_array_trie_roundtrip_and_scores(tmp_path):
    """ARRAY_TRIE (Bhiksha pointer compression): many bigrams over few
    trigrams forces a deep chop; scores still equal the ARPA scorer."""
    from tone_tpu.decoding.kenlm_trie import MODEL_ARRAY_TRIE, _BhikshaPlan

    ngrams = _synthetic_ngrams(9, n_words=30, n_sents=400)
    path = tmp_path / "array.bin"
    write_kenlm_trie(ngrams, path, bhiksha_bits=22)
    parsed = read_kenlm_trie(path)
    assert parsed.model_type == MODEL_ARRAY_TRIE
    assert parsed.counts == [len(t) for t in ngrams]
    # the bigram level's pointers actually got chopped
    plan = _BhikshaPlan.plan(parsed.counts[1] + 1, parsed.counts[2], 22)
    assert parsed.middles[0].bhiksha is not None
    assert parsed.middles[0].next_bits == plan.inline_bits

    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(9)
    for _ in range(1500):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        w = rng.choice(allw + ["oov"])
        assert trie.score(ctx, w) == pytest.approx(arpa.score(ctx, w),
                                                   abs=1e-4), (ctx, w)


def test_quant_array_trie(tmp_path):
    """QUANT_ARRAY_TRIE: quantization and pointer compression compose."""
    from tone_tpu.decoding.kenlm_trie import MODEL_QUANT_ARRAY_TRIE

    ngrams = _synthetic_ngrams(10, n_sents=100)
    path = tmp_path / "qa.bin"
    write_kenlm_trie(ngrams, path, quant_bits=(13, 13), bhiksha_bits=8)
    parsed = read_kenlm_trie(path)
    assert parsed.model_type == MODEL_QUANT_ARRAY_TRIE
    assert kenlm_model_type(path) == MODEL_QUANT_ARRAY_TRIE

    arpa = ArpaLM(ngrams)
    trie = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(10)
    for _ in range(1200):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        w = rng.choice(allw)
        assert trie.score(ctx, w) == pytest.approx(arpa.score(ctx, w),
                                                   abs=2e-4), (ctx, w)


def test_array_trie_smaller_when_chop_pays(tmp_path):
    """With many pointers over a small next level, the array form is
    smaller than the plain trie (the point of Bhiksha compression)."""
    ngrams = _synthetic_ngrams(11, n_words=40, n_sents=600)
    plain, arr = tmp_path / "plain.bin", tmp_path / "arr.bin"
    write_kenlm_trie(ngrams, plain)
    write_kenlm_trie(ngrams, arr, bhiksha_bits=22)
    t_plain, t_arr = KenLMTrie(plain), KenLMTrie(arr)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(11)
    for _ in range(800):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 3)))
        w = rng.choice(allw)
        assert t_plain.score(ctx, w) == pytest.approx(t_arr.score(ctx, w),
                                                      abs=1e-6)
    # enumeration agrees too (exercises bhiksha next_value on every entry)
    assert trie_to_ngrams(t_plain) == trie_to_ngrams(t_arr)


def test_array_trie_native_conversion(tmp_path):
    """The native scorer accepts ARRAY_TRIE artifacts via the probing
    conversion path used by BeamSearchCTCDecoder.from_local."""
    from tone_tpu.decoder import _native_lm_path
    from tone_tpu.decoding.native.beamsearch import NativeLM, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    ngrams = _synthetic_ngrams(12)
    path = tmp_path / "arr.bin"
    write_kenlm_trie(ngrams, path, bhiksha_bits=22)
    converted = _native_lm_path(path)
    assert converted != path
    cc = NativeLM(converted)
    py = KenLMTrie(path)
    allw = [w for (w,) in ngrams[0]]
    rng = random.Random(12)
    for _ in range(600):
        ctx = tuple(rng.choice(allw) for _ in range(rng.randint(0, 4)))
        w = rng.choice(allw)
        assert cc.score(ctx, w) == pytest.approx(py.score(ctx, w), abs=1e-5)


def test_writer_rejects_one_bit_backoff(tmp_path):
    """backoff bins 0/1 are reserved, so 1-bit backoff fields could only
    ever store the reserved values; the writer must refuse instead of
    silently truncating every backoff."""
    ngrams = _synthetic_ngrams(13)
    with pytest.raises(ValueError, match="backoff 2..25"):
        write_kenlm_trie(ngrams, tmp_path / "q.bin", quant_bits=(8, 1))
