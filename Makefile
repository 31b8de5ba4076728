.PHONY: test bench bench-scaling figures lint

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

bench-scaling:
	python bench_scaling.py

figures:
	python -m mjhmc_tpu figures --out figures_out

smoke:
	python -m mjhmc_tpu sample --config gauss2d --steps 200 --burn 100
