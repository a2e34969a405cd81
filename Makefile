# Convenience targets. The package itself needs no build step; native
# C++ helpers compile on demand (ambigram_tpu/native.py).

.PHONY: test bench bench-docs golden

test:
	python -m pytest tests/ -x -q

# Run the benchmark on the attached chip and regenerate the README /
# docs/ARCHITECTURE.md benchmark blocks from the measured output, so
# published numbers can never drift from measurements.
bench-docs:
	python bench.py > .bench_out.txt 2>&1 || (cat .bench_out.txt; exit 1)
	python -m ambigram_tpu.scripts.bench_docs .bench_out.txt
	rm -f .bench_out.txt

bench:
	python bench.py

golden:
	python -m ambigram_tpu.scripts.golden_suite
