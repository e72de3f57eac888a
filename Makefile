# Developer entry points

.PHONY: test test-quick test-cli bench native clean verify-contracts

test:
	python -m pytest tests/ -q

test-quick:  # quick lane: skips @pytest.mark.slow (full suite ~17 min, this ~6)
	python -m pytest tests/ -q -m "not slow"

test-cli:  # end-to-end subprocess drives of the entry scripts (slow)
	RTPE_CLI_TESTS=1 python -m pytest tests/test_scripts.py -q

bench:
	python bench.py

native:
	python -c "from rtpe_tpu.native import build; assert build(verbose=True)"

verify-contracts:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
	 "import jax; jax.config.update('jax_platforms','cpu'); \
	  import __graft_entry__ as g; fn, a = g.entry(); \
	  jax.jit(fn)(*a); g.dryrun_multichip(8)"

clean:
	rm -rf rtpe_tpu/native/librtpe_native.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
