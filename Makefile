# Task orchestration — role parity with the reference's tox envs
# (/root/reference/tox.ini:22-85: unit-tests, speed-bench-*, memory-bench-*,
# *-quick smoke variants).

.PHONY: test test-tpu stress bench bench-quick speed-bench memory-bench bench-suite seed-cache

test:
	python -m pytest tests/ -q

test-tpu:         ## the same suite against the real TPU backend
	ILLICO_TPU_TEST_TPU=1 python -m pytest tests/ -q

stress:           ## randomized hardware exactness stress (real TPU)
	ILLICO_TPU_TEST_TPU=1 python -m pytest -m tpu_stress -q -s

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

seed-cache:       ## harvest the live XLA compile cache into the committed seed dir
	mkdir -p .xla_cache_seed
	cp -n "$${ILLICO_TPU_COMPILE_CACHE:-$$HOME/.cache/illico_tpu_xla}"/*-cache .xla_cache_seed/ 2>/dev/null || true
	@ls .xla_cache_seed | wc -l | xargs echo "seed entries:"
