.PHONY: test bench bench-scaling figures lint goldens pretrain-phi claim

# regenerate the committed golden autocorrelation spectra (NumPy oracle)
goldens:
	python tests/make_goldens.py

# pretrain + persist the config-5 dictionary artifact (mjhmc_tpu/data/)
pretrain-phi:
	python -m mjhmc_tpu.models.dictionary_learning

# the paper's headline statistical-efficiency experiment (long; TPU)
claim:
	python -m mjhmc_tpu.experiments.efficiency_claim --out docs/figures/efficiency_claim

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
