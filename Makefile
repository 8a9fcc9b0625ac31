.PHONY: test test-fast lint lint-full bench serve clean

# Full suite (incl. full-71M-model jit compiles + golden parity): ~30 min.
# (Counts are deliberately not written here — hand-synced numbers drifted
# twice; tests/test_docs.py fails the build if one is reintroduced.)
test:
	python -m pytest tests/ -q

# Inner loop: heavy compiles / e2e / golden-parity tests are marked `slow`.
# ~15 min measured on the 1-core dev host.
test-fast:
	python -m pytest tests/ -q -m "not slow"

# Always-available gate (no third-party lint tools in the dev image).
lint:
	python -m compileall -q tone_tpu tests examples bench.py __graft_entry__.py

# Full gate for machines that have the tools: ruff + mypy, configured in
# pyproject.toml (mirrors the reference's lint discipline).
lint-full: lint
	@if command -v ruff >/dev/null 2>&1; then ruff check tone_tpu tests; \
	else echo "ruff not installed; skipped (config in pyproject.toml)"; fi
	@if command -v mypy >/dev/null 2>&1; then mypy tone_tpu; \
	else echo "mypy not installed; skipped (config in pyproject.toml)"; fi

bench:
	python bench.py

serve:
	python -m tone_tpu serve

# Build residue poisons future wheels (setuptools reuses stale build/lib
# contents) and double-counts the package in line counts — keep it out.
clean:
	rm -rf build/ tone_tpu.egg-info/ dist/
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
	find . -name '*.pyc' -delete
