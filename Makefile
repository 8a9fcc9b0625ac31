.PHONY: test test-fast lint bench serve

# Full suite (incl. full-71M-model jit compiles + golden parity): ~25 min.
test:
	python -m pytest tests/ -q

# Inner loop: heavy compiles / e2e / golden-parity tests are marked `slow`.
# Measured ~8 min on the dev host (211 tests).
test-fast:
	python -m pytest tests/ -q -m "not slow"

lint:
	python -m compileall -q tone_tpu tests examples bench.py __graft_entry__.py

bench:
	python bench.py

serve:
	python -m tone_tpu serve
