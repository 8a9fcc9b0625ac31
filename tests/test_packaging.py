"""Installed-wheel smoke tests.

The reference is pip-installable with its data (reference pyproject.toml,
poetry packaging); a built tone-tpu wheel must likewise carry the browser
client, the C++ decoder sources + prebuilt scorer, and work from a
read-only site-packages (examples are synthesized into a user cache dir
when the package dir is unwritable)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _clean_build_residue():
    # setuptools reuses stale ``build/lib`` contents in later wheels and the
    # residue double-counts the package in line counts — scrub it both
    # before the build (correctness) and after (tree hygiene, `make clean`).
    import shutil

    for d in (REPO / "build", REPO / "tone_tpu.egg-info"):
        shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def wheel(tmp_path_factory):
    # The prebuilt native libraries are deliberately NOT tracked in git
    # (.gitignore: *.so) — build them here so a wheel from a fresh clone
    # still ships working binaries, not just their sources.
    from tone_tpu.decoding.native import build_native as build_decode
    from tone_tpu.decoding.native.estimate import build_native as build_estimate

    assert build_decode(), "g++ build of libtone_decode.so failed"
    assert build_estimate(), "g++ build of libtone_estimate.so failed"
    out = tmp_path_factory.mktemp("wheel")
    _clean_build_residue()
    try:
        subprocess.run(
            [sys.executable, "-m", "pip", "wheel", "--no-deps",
             "--no-build-isolation", "-w", str(out), str(REPO)],
            check=True, capture_output=True, text=True)
    finally:
        _clean_build_residue()
    wheels = list(out.glob("tone_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    return wheels[0]


@pytest.fixture(scope="module")
def installed(wheel, tmp_path_factory):
    """The wheel installed into a scratch prefix (no deps re-resolved)."""
    target = tmp_path_factory.mktemp("site")
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps", "--no-warn-script-location",
         "--target", str(target), str(wheel)],
        check=True, capture_output=True, text=True)
    return target


def _run_installed(installed: Path, code: str, tmp: Path, **env_extra) -> str:
    """Run ``code`` against the installed copy only (repo not importable)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(installed)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XDG_CACHE_HOME", str(tmp / "cache"))
    env.update(env_extra)
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(tmp),
                          capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_wheel_carries_data_files(wheel):
    names = zipfile.ZipFile(wheel).namelist()
    for probe in (
        "tone_tpu/py.typed",  # typing marker, like the reference's tone/py.typed
        "tone_tpu/runtime/static/index.html",
        "tone_tpu/decoding/native/src/tone_decode.cpp",
        "tone_tpu/decoding/native/src/tone_estimate.cpp",
        "tone_tpu/decoding/native/src/libtone_decode.so",
        "tone_tpu/decoding/native/src/libtone_estimate.so",
    ):
        assert probe in names, f"{probe} missing from wheel ({len(names)} files)"


def test_installed_examples_and_static_page(installed, tmp_path):
    # Make the installed package read-only, as root-owned site-packages
    # would be for a normal user: example synthesis must fall back to the
    # XDG cache dir instead of crashing.
    examples_parent = installed / "tone_tpu" / "audio"
    examples_parent.chmod(0o555)
    try:
        out = _run_installed(installed, """
import numpy as np
from tone_tpu import read_example_audio
audio = read_example_audio()
assert audio.dtype == np.int32 and audio.size > 8000, audio.shape

from pathlib import Path
import tone_tpu.runtime.server as server
page = Path(server.__file__).parent / "static" / "index.html"
assert page.exists() and page.stat().st_size > 1000

import tone_tpu.decoding.native as native
src = Path(native.__file__).parent / "src"
assert (src / "tone_decode.cpp").exists()
assert (src / "libtone_decode.so").exists()
print("ok", audio.shape)
""", tmp_path)
    finally:
        examples_parent.chmod(0o755)
    assert "ok" in out


def test_examples_fallback_unit(tmp_path, monkeypatch):
    """example_path falls back to XDG_CACHE_HOME when the package dir is
    unwritable (unit-level twin of the installed test above).  chmod-based
    read-only doesn't bind under root, so the unwritable dir is simulated
    with a file in the parent path (mkdir -> NotADirectoryError)."""
    import tone_tpu.audio.examples as ex

    blocker = tmp_path / "blocker"
    blocker.write_text("")
    monkeypatch.setattr(ex, "EXAMPLES_DIR", blocker / "examples")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    path = ex.example_path("audio_short.flac")
    assert path.exists()
    assert str(tmp_path / "cache") in str(path)


@pytest.mark.slow
def test_installed_cli_transcribe(installed, tmp_path):
    """`tone-tpu transcribe` runs end-to-end from the installed copy
    (random weights — exercises the full pipeline import + jit path)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = str(installed)
    env["JAX_PLATFORMS"] = "cpu"
    env["XDG_CACHE_HOME"] = str(tmp_path / "cache")
    audio = _run_installed(installed, """
from tone_tpu import read_example_audio  # bakes the example into the cache
from tone_tpu.audio.examples import example_path
print(example_path("audio_short.flac"))
""", tmp_path).strip()
    proc = subprocess.run(
        [sys.executable, "-m", "tone_tpu", "transcribe", audio],
        cwd=str(tmp_path), capture_output=True, text=True, env=env,
        timeout=1200)
    assert proc.returncode == 0, proc.stderr
