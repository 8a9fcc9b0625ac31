.PHONY: test test-fast lint bench serve

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

lint:
	python -m compileall -q tone_tpu tests examples bench.py __graft_entry__.py

bench:
	python bench.py

serve:
	python -m tone_tpu serve
