# Task orchestration — role parity with the reference's tox envs
# (/root/reference/tox.ini:22-85: unit-tests, speed-bench-*, memory-bench-*,
# *-quick smoke variants).

.PHONY: test bench bench-quick speed-bench memory-bench bench-suite

test:
	python -m pytest tests/ -q

bench:            ## headline K562-scale benchmark (run on TPU)
	python bench.py

bench-quick:      ## smoke-size variant
	python bench.py --quick

speed-bench:      ## pytest-marked speed benchmarks
	python -m pytest tests/test_benchmarks.py -m speed_bench -q -s

memory-bench:     ## pytest-marked memory benchmarks
	python -m pytest tests/test_benchmarks.py -m memory_bench -q -s

bench-suite:      ## versioned JSON results into .benchmarks/
	python benchmarks/run_benchmarks.py
