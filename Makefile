.PHONY: test test-fast native bench clean

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/ -q -x -m "not slow"

native:
	$(MAKE) -C native

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
