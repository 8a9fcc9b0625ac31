"""First-party modified-Kneser-Ney estimation (tone_tpu.decoding.estimate).

The load-bearing oracle: an ARPA backoff model is a family of conditional
distributions — for EVERY observed context, the probabilities of all
predictable vocabulary words must sum to exactly 1.  That invariant holds
for interpolated KN if and only if the discounting, leftover-mass, and
suffix-closure bookkeeping are all right, so it catches essentially any
estimation bug at once.
"""

import math

import numpy as np
import pytest

from tone_tpu.decoding.estimate import (
    BOS, EOS, UNK, estimate_from_text, estimate_ngram_lm, write_arpa,
)
from tone_tpu.decoding.lm import ArpaLM

CORPUS = [
    "привет мир".split(),
    "привет большой мир".split(),
    "как дела в большом мире".split(),
    "дела идут хорошо".split(),
    "мир это хорошо".split(),
    "привет как дела".split(),
    "в мире идут дела".split(),
]


def _vocab(tables):
    return [g[0] for g in tables[0] if g != (BOS,)]


def _contexts(tables, order):
    ctxs = {()}
    for n in range(order - 1):
        for gram in tables[n]:
            if gram[-1] != EOS:
                ctxs.add(gram)
    return sorted(ctxs, key=lambda c: (len(c), c))


@pytest.mark.parametrize("order", [1, 2, 3])
def test_distributions_sum_to_one(order):
    tables = estimate_ngram_lm(CORPUS, order=order)
    lm = ArpaLM(tables)
    words = _vocab(tables)
    assert UNK in [w for (w,) in tables[0]]
    for ctx in _contexts(tables, order):
        total = sum(10.0 ** lm.score(ctx, w) for w in words)
        assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


def test_continuation_counting_is_kneser_ney():
    """A word with high raw frequency but a single left context gets a LOWER
    unigram probability than a same-frequency word seen after many distinct
    contexts — the defining KN property (raw-count MLE would tie them)."""
    corpus = []
    # "сан франциско": frequent bigram, "франциско" only ever follows "сан".
    corpus += [["сан", "франциско"]] * 8
    # "дом" appears 8 times after 8 different words.
    for left in ("мой", "твой", "наш", "ваш", "его", "её", "их", "тот"):
        corpus.append([left, "дом"])
    tables = estimate_ngram_lm(corpus, order=2)
    lm = ArpaLM(tables)
    assert lm.score((), "дом") > lm.score((), "франциско")


def test_bos_and_unk_conventions():
    tables = estimate_ngram_lm(CORPUS, order=3)
    prob, backoff = tables[0][(BOS,)]
    assert prob == -99.0  # never predicted
    assert backoff != 0.0  # but a real context for sentence starts
    assert tables[0][(UNK,)][0] > -99.0
    # Reserved tokens in the corpus are rejected, not silently mangled.
    with pytest.raises(ValueError, match="reserved"):
        estimate_ngram_lm([["привет", BOS]], order=2)
    with pytest.raises(ValueError, match="empty"):
        estimate_ngram_lm([], order=2)


def test_arpa_roundtrip(tmp_path):
    tables = estimate_ngram_lm(CORPUS, order=3)
    path = tmp_path / "lm.arpa"
    write_arpa(tables, path)
    reread = ArpaLM.from_file(path)
    lm = ArpaLM(tables)
    for ctx in _contexts(tables, 3):
        for w in _vocab(tables):
            assert math.isclose(reread.score(ctx, w), lm.score(ctx, w),
                                abs_tol=1e-6)


def test_kenlm_binary_roundtrip(tmp_path):
    """The estimated tables feed the first-party binary writers and come
    back with identical scores — the fine-tune -> domain LM -> kenlm.bin
    artifact path, no external tools."""
    from tone_tpu.decoding.kenlm_binary import write_kenlm_binary
    from tone_tpu.decoding.kenlm_trie import write_kenlm_trie
    from tone_tpu.decoding.lm import load_lm

    tables = estimate_ngram_lm(CORPUS, order=3)
    lm = ArpaLM(tables)
    write_kenlm_binary(tables, tmp_path / "lm.bin")
    write_kenlm_trie(tables, tmp_path / "lm_trie.bin")
    for reread in (load_lm(tmp_path / "lm.bin"),
                   load_lm(tmp_path / "lm_trie.bin")):
        for ctx in ((), (BOS,), ("привет",), (BOS, "привет"), ("как", "дела")):
            for w in ("мир", "дела", "хорошо", EOS):
                assert math.isclose(reread.score(ctx, w), lm.score(ctx, w),
                                    abs_tol=1e-4), (ctx, w)


def test_device_lm_accepts_estimated_tables():
    from tone_tpu.decoding.device_lm import DeviceLM

    tables = estimate_ngram_lm(CORPUS, order=2)
    dev = DeviceLM.from_ngrams(tables)
    lm = ArpaLM(tables)
    # Spot-check device scoring agreement on a few vocab words.
    for w in ("мир", "дела"):
        assert dev is not None and lm.score((), w) < 0.0


def test_estimate_from_text_and_heldout_likelihood():
    """Text front-end works, and the smoothed trigram beats the smoothed
    unigram on held-out in-domain text (the reason to estimate at all)."""
    lines = [" ".join(s) for s in CORPUS]
    tri = ArpaLM(estimate_from_text(lines, order=3))
    uni = ArpaLM(estimate_from_text(lines, order=1))
    held_out = ["привет большой мир".split(), "как дела".split()]

    def loglik(lm):
        total = 0.0
        for sent in held_out:
            ctx = (BOS,)
            for w in [*sent, EOS]:
                total += lm.score(ctx, w)
                ctx = (*ctx, w)
        return total

    assert loglik(tri) > loglik(uni)


@pytest.mark.parametrize("prune", [[0, 1], [0, 1, 1], [0, 1, 2]])
def test_pruned_models_stay_normalized(prune):
    """lmplz-style pruning drops rare n-grams but every surviving context's
    distribution still sums to exactly 1 (pruned words route via backoff)."""
    order = len(prune)
    full = estimate_ngram_lm(CORPUS, order=order)
    pruned = estimate_ngram_lm(CORPUS, order=order, prune=prune)
    assert sum(len(t) for t in pruned[1:]) < sum(len(t) for t in full[1:])
    assert len(pruned[0]) == len(full[0])  # unigrams unprunable
    lm = ArpaLM(pruned)
    words = _vocab(pruned)
    for ctx in _contexts(pruned, order):
        total = sum(10.0 ** lm.score(ctx, w) for w in words)
        assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


def test_prune_suffix_closure_repair():
    """A trigram kept for its many left contexts whose bigram suffix was
    seen after only one word: the suffix must be force-kept (else the
    stored trigram's interpolation would dangle)."""
    corpus = []
    for left in ("а", "б", "в", "г", "д", "е"):
        corpus.append([left, "икс", "игрек", "зет"])
    # ("игрек","зет") continues only from "икс" => adjusted bigram count 1,
    # below threshold; but ("икс","игрек","зет") has raw count 6, kept.
    tables = estimate_ngram_lm(corpus, order=3, prune=[0, 1, 1])
    assert ("икс", "игрек", "зет") in tables[2]
    assert ("игрек", "зет") in tables[1]  # force-kept suffix
    lm = ArpaLM(tables)
    words = _vocab(tables)
    for ctx in _contexts(tables, 3):
        total = sum(10.0 ** lm.score(ctx, w) for w in words)
        assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


def test_prune_validation():
    with pytest.raises(ValueError, match="non-decreasing"):
        estimate_ngram_lm(CORPUS, order=3, prune=[0, 2, 1])
    with pytest.raises(ValueError, match="unigrams"):
        estimate_ngram_lm(CORPUS, order=2, prune=[1, 1])
    with pytest.raises(ValueError, match="thresholds for order"):
        estimate_ngram_lm(CORPUS, order=2, prune=[0, 0, 0])


def test_prune_short_list_extends_last_value():
    """lmplz semantics: --prune 0 1 at order 3 means [0, 1, 1], not
    [0, 0, 1] — a ported lmplz command line must prune identically."""
    short = estimate_ngram_lm(CORPUS, order=3, prune=[0, 1])
    full = estimate_ngram_lm(CORPUS, order=3, prune=[0, 1, 1])
    assert short == full
    assert short != estimate_ngram_lm(CORPUS, order=3, prune=[0, 0, 1])


def test_prune_context_prefix_closure():
    """A kept n-gram whose context bigram falls below threshold: the
    context must be force-kept (it carries the backoff weight the ARPA
    format routes through), or the context's distribution over-assigns
    mass.  Construction: trigram (а, б, ц) raw count 3 (highest order
    keeps raw counts), while bigram (а, б) has continuation count 2 —
    both below a threshold of 2."""
    corpus = [["в1", "а", "б", "ц"], ["в1", "а", "б", "ц"],
              ["в2", "а", "б", "ц"]]
    # raw (а,б,ц) = 3 > 2 (kept); (а,б) continuation count = |{в1,в2}| = 2
    # <= 2 and no kept trigram has it as a suffix — only the prefix-closure
    # repair can store it.
    tables = estimate_ngram_lm(corpus, order=3, prune=[0, 2, 2])
    assert ("а", "б", "ц") in tables[2]
    assert ("а", "б") in tables[1]  # force-kept context prefix
    lm = ArpaLM(tables)
    words = _vocab(tables)
    for ctx in _contexts(tables, 3):
        total = sum(10.0 ** lm.score(ctx, w) for w in words)
        assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


@pytest.mark.parametrize("order,prune", [(4, None), (5, None), (4, [0, 1]),
                                         (5, [0, 1, 1, 2, 2])])
def test_high_order_normalization_fuzz(order, prune):
    """Orders 4-5 on a random corpus, pruned and unpruned: every stored
    context's distribution still sums to exactly 1."""
    import numpy as np

    rng = np.random.default_rng(order * 7 + (0 if prune is None else 1))
    vocab = [f"w{i}" for i in range(12)]
    corpus = [[vocab[i] for i in rng.integers(0, 12, rng.integers(1, 9))]
              for _ in range(60)]
    tables = estimate_ngram_lm(corpus, order=order, prune=prune)
    lm = ArpaLM(tables)
    words = _vocab(tables)
    ctxs = _contexts(tables, order)
    # sample contexts to keep the fuzz fast at order 5
    for ctx in ctxs[:: max(1, len(ctxs) // 150)]:
        total = sum(10.0 ** lm.score(ctx, w) for w in words)
        assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


def test_perplexity():
    from tone_tpu.decoding.estimate import perplexity

    tables = estimate_ngram_lm(CORPUS, order=3)
    lm = ArpaLM(tables)
    train_ppl = perplexity(lm, CORPUS)
    shuffled = perplexity(lm, [list(reversed(s)) for s in CORPUS])
    assert 1.0 < train_ppl < shuffled  # word order matters to the model
    with pytest.raises(ValueError, match="empty"):
        perplexity(lm, [])


def test_estimated_lm_drives_beam_search():
    """End to end: estimated LM biases CTC beam search toward in-domain
    words on an ambiguous logprob matrix."""
    from tone_tpu.config import LABELS
    from tone_tpu.decoder import BeamSearchCTCDecoder

    tables = estimate_ngram_lm([["мир"], ["мир"], ["миг"]], order=2)
    dec = BeamSearchCTCDecoder(ArpaLM(tables), beam_width=8)

    blank = len(LABELS)
    idx = {c: LABELS.index(c) for c in "мирг"}
    T, V = 5, len(LABELS) + 1
    logits = np.full((T, V), -8.0, np.float32)
    logits[0, idx["м"]] = 0.0
    logits[1, idx["и"]] = 0.0
    # Final letter acoustically ambiguous between р and г.
    logits[2, idx["р"]] = -0.6
    logits[2, idx["г"]] = -0.55
    logits[3:, blank] = 0.0
    logprobs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    assert dec.forward(logprobs) == "мир"


# --- native (C++) estimator twin -------------------------------------------


def _native_est():
    from tone_tpu.decoding.native import estimate as ne

    if not ne.native_available():
        pytest.skip("no C++ toolchain")
    return ne


def test_native_estimator_matches_python(tmp_path):
    """Corpus-file -> ARPA native path emits the same model as the Python
    estimator (gram sets exactly; probs/backoffs to float rounding) across
    orders and prune settings."""
    import random

    ne = _native_est()
    rng = random.Random(0)
    vocab = ["мир", "дом", "сан", "дата", "центр", "привет", "да", "нет"]
    for trial in range(8):
        lines = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
                 for _ in range(rng.randint(3, 50))]
        order = rng.randint(1, 5)
        prune = None
        if order > 1 and rng.random() < 0.5:
            k = rng.randint(1, order)
            prune = [0] + sorted(rng.randint(0, 2) for _ in range(k - 1))
        corpus = tmp_path / "c.txt"
        corpus.write_text("\n".join(lines) + "\n", encoding="utf-8")
        py = estimate_from_text(lines, order=order, prune=prune)
        ne.estimate_arpa_native(corpus, tmp_path / "lm.arpa",
                                order=order, prune=prune)
        nat = ArpaLM.from_file(tmp_path / "lm.arpa")._ngrams
        assert len(py) == len(nat)
        for n, (pt, nt) in enumerate(zip(py, nat)):
            assert set(pt) == set(nt), (trial, order, prune, n)
            for g in pt:
                assert pt[g][0] == pytest.approx(nt[g][0], abs=2e-7)
                assert pt[g][1] == pytest.approx(nt[g][1], abs=2e-7)


def test_native_estimator_lowercases_and_errors(tmp_path):
    """UTF-8 lowercasing (Cyrillic incl. Ё) matches the Python path; the
    error twins (reserved token, bad prune) raise like estimate_ngram_lm."""
    ne = _native_est()
    corpus = tmp_path / "c.txt"
    corpus.write_text("ЁЖ Привет МИР\nёж мир\n", encoding="utf-8")
    ne.estimate_arpa_native(corpus, tmp_path / "lm.arpa", order=2)
    nat = ArpaLM.from_file(tmp_path / "lm.arpa")._ngrams
    py = estimate_from_text(["ЁЖ Привет МИР", "ёж мир"], order=2)
    assert set(nat[0]) == set(py[0])
    assert ("ёж",) in nat[0] and ("привет",) in nat[0]

    corpus.write_text("привет <s> мир\n", encoding="utf-8")
    with pytest.raises(ValueError, match="reserved token"):
        ne.estimate_arpa_native(corpus, tmp_path / "x.arpa", order=2)
    corpus.write_text("привет мир\n", encoding="utf-8")
    with pytest.raises(ValueError, match="unigrams cannot be pruned"):
        ne.estimate_arpa_native(corpus, tmp_path / "x.arpa", order=2,
                                prune=[1, 1])
    with pytest.raises(ValueError, match="non-decreasing"):
        ne.estimate_arpa_native(corpus, tmp_path / "x.arpa", order=3,
                                prune=[0, 2, 1])
    (tmp_path / "empty.txt").write_text("\n\n", encoding="utf-8")
    with pytest.raises(ValueError, match="empty corpus"):
        ne.estimate_arpa_native(tmp_path / "empty.txt", tmp_path / "x.arpa",
                                order=2)


def test_cli_lm_native(tmp_path, capsys, monkeypatch):
    """tone_tpu lm --native: direct ARPA output and binary conversion both
    produce loadable artifacts with the same gram counts as the Python
    path."""
    import json
    import sys

    _native_est()
    from tone_tpu.__main__ import main as cli_main

    corpus = tmp_path / "c.txt"
    corpus.write_text("привет мир\nмир дом\nдом\n", encoding="utf-8")

    def run(argv):
        monkeypatch.setattr(sys, "argv", ["tone_tpu", *argv])
        cli_main()
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    r_py = run(["lm", str(corpus), str(tmp_path / "py.arpa"), "--order", "3"])
    r_nat = run(["lm", str(corpus), str(tmp_path / "nat.arpa"), "--order",
                 "3", "--native"])
    assert r_nat["ngrams"] == r_py["ngrams"]

    r_bin = run(["lm", str(corpus), str(tmp_path / "nat.bin"), "--order", "3",
                 "--native", "--ppl", str(corpus)])
    assert r_bin["ngrams"] == r_py["ngrams"] and r_bin["ppl"] > 0
    from tone_tpu.decoding.lm import load_lm

    lm = load_lm(tmp_path / "nat.bin")
    assert lm.score(("привет",), "мир") < 0
