# (reference: Makefile test/pep8 targets)

.PHONY: test lint bench all

test:
	python -m pytest tests/ -q

lint:
	@python -m flake8 deepblast_tpu tests --max-line-length 100 2>/dev/null \
	 || python -m pyflakes deepblast_tpu tests 2>/dev/null \
	 || echo "no linter installed (flake8/pyflakes); skipping"

bench:
	python bench.py

all: lint test
