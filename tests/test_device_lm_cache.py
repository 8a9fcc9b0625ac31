"""On-disk cache of the re-bucketed device-LM tables.

The reference's kenlm.bin loads instantly via mmap
(reference tone/decoder.py:108); the device layout needs a one-time
re-bucketing (~99 s at 10M grams), which the cache amortizes to an .npz
read keyed by artifact digest + layout version."""

from __future__ import annotations

import numpy as np
import pytest

import tone_tpu.decoding.device_lm as dlm
from tone_tpu.decoding.device_lm import DeviceLM, DeviceProbingLM, load_device_lm
from tests.test_fused_beam import _corpus_lm


@pytest.fixture()
def arpa_path(tmp_path):
    from tone_tpu.decoding.estimate import write_arpa

    ngrams, _ = _corpus_lm()
    path = tmp_path / "lm.arpa"
    write_arpa(ngrams, path)
    return path


@pytest.fixture()
def probing_path(tmp_path):
    from tone_tpu.decoding.kenlm_binary import write_kenlm_binary

    ngrams, _ = _corpus_lm()
    path = tmp_path / "lm.bin"
    write_kenlm_binary(ngrams, path, model_type=0)
    return path


def _array_fields(lm):
    return {f: getattr(lm, f) for f in
            ("keys1", "keys2", "probs", "backoffs",
             "edge_keys", "edge_child", "node_word")}


def test_device_lm_cache_roundtrip(arpa_path, monkeypatch):
    first = DeviceLM.from_file(arpa_path)
    caches = list(arpa_path.parent.glob("*.device-lm.v*.npz"))
    assert len(caches) == 1, caches

    # The second load must come from the cache: make a rebuild impossible.
    monkeypatch.setattr(DeviceLM, "from_ngrams", classmethod(
        lambda cls, ngrams: pytest.fail("cache miss: from_ngrams called")))
    second = DeviceLM.from_file(arpa_path)
    for name, a in _array_fields(first).items():
        np.testing.assert_array_equal(a, getattr(second, name), err_msg=name)
    assert (first.order, first.unk_id, first.bos_id, first.n_words,
            first.probe, first.edge_probe) == \
           (second.order, second.unk_id, second.bos_id, second.n_words,
            second.probe, second.edge_probe)
    assert first.words == second.words


def test_probing_lm_cache_roundtrip(probing_path, monkeypatch):
    first = load_device_lm(probing_path)
    assert isinstance(first, DeviceProbingLM)
    caches = list(probing_path.parent.glob("*.device-probing-lm.v*.npz"))
    assert len(caches) == 1, caches

    monkeypatch.setattr(dlm, "_probe_table", lambda *a, **k: pytest.fail(
        "cache miss: tables re-bucketed"))
    second = load_device_lm(probing_path)
    for name, a in _array_fields(first).items():
        np.testing.assert_array_equal(a, getattr(second, name), err_msg=name)
    np.testing.assert_array_equal(first.uni_prob, second.uni_prob)
    np.testing.assert_array_equal(first.uni_backoff, second.uni_backoff)
    # the host twin still scores (reconstructed from the binary, not cached)
    assert second.score(("<s>",), first.binary.words[1]) == pytest.approx(
        first.score(("<s>",), first.binary.words[1]))


def test_cache_keyed_by_content_and_stale_evicted(arpa_path):
    DeviceLM.from_file(arpa_path)
    # Rewriting the artifact with different content invalidates the key: a
    # new cache entry replaces the stale one (each entry is comparable in
    # size to the artifact, so rewrites must not accumulate dead tables on
    # long-lived model volumes).
    from tone_tpu.decoding.estimate import write_arpa

    ngrams, _ = _corpus_lm(seed=3, n_words=10)
    write_arpa(ngrams, arpa_path)
    relearned = DeviceLM.from_file(arpa_path)
    assert len(list(arpa_path.parent.glob("*.device-lm.v*.npz"))) == 1
    assert relearned.n_words == len({w for (w,) in ngrams[0]})
    # and the surviving entry is the NEW one: a reload is a cache hit
    reloaded = DeviceLM.from_file(arpa_path)
    assert reloaded.n_words == relearned.n_words


def test_cache_hit_skips_hashing_when_stat_unchanged(arpa_path, monkeypatch):
    """The stat (size, mtime_ns) fast path: an unchanged artifact loads
    from cache without re-reading+hashing the whole file (seconds per
    server start for a multi-GB probing binary)."""
    first = DeviceLM.from_file(arpa_path)
    monkeypatch.setattr(dlm, "_artifact_digest", lambda path: pytest.fail(
        "stat fast path missed: full-file digest computed on a cache hit"))
    second = DeviceLM.from_file(arpa_path)
    np.testing.assert_array_equal(first.keys1, second.keys1)
    # a touched artifact falls back to the digest check (and still hits)
    import os

    monkeypatch.undo()  # restore the real digest function
    st = os.stat(arpa_path)
    os.utime(arpa_path, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    monkeypatch.setattr(DeviceLM, "from_ngrams", classmethod(
        lambda cls, ngrams: pytest.fail("digest fallback missed the cache")))
    third = DeviceLM.from_file(arpa_path)
    np.testing.assert_array_equal(first.keys1, third.keys1)


def test_corrupt_cache_rebuilds(arpa_path):
    first = DeviceLM.from_file(arpa_path)
    cache, = arpa_path.parent.glob("*.device-lm.v*.npz")
    cache.write_bytes(b"not a zipfile")
    second = DeviceLM.from_file(arpa_path)
    np.testing.assert_array_equal(first.keys1, second.keys1)


def test_cache_disabled_by_env(arpa_path, monkeypatch):
    monkeypatch.setenv("TONE_TPU_LM_CACHE", "0")
    DeviceLM.from_file(arpa_path)
    assert not list(arpa_path.parent.glob("*.npz"))


def test_cache_save_falls_back_to_user_dir(arpa_path, tmp_path, monkeypatch):
    """Unwritable artifact directory (read-only model volume): the cache
    lands under XDG_CACHE_HOME and is found again on reload."""
    blocked = tmp_path / "blocker-file" / "x.npz"
    (tmp_path / "blocker-file").write_text("")  # mkdir under it -> OSError
    user_dir = tmp_path / "xdg" / "tone_tpu" / "device-lm"

    real = dlm._cache_candidates

    def candidates(path, digest, kind):
        orig = real(path, digest, kind)
        return [blocked, user_dir / orig[0].name]

    monkeypatch.setattr(dlm, "_cache_candidates", candidates)
    first = DeviceLM.from_file(arpa_path)
    assert len(list(user_dir.glob("*.npz"))) == 1
    monkeypatch.setattr(DeviceLM, "from_ngrams", classmethod(
        lambda cls, ngrams: pytest.fail("cache miss after fallback save")))
    second = DeviceLM.from_file(arpa_path)
    np.testing.assert_array_equal(first.keys1, second.keys1)
