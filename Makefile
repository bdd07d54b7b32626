# Developer entry points (counterpart of the reference's Makefile —
# its cookiecutter data/lint targets don't apply; these are the commands
# this framework is actually driven by).

.PHONY: test test-fast test-quick test-parity bench install dryrun profile clean

PYTHON := python

## Editable install (no deps — everything is baked into the TPU image)
install:
	$(PYTHON) -m pip install -e . --no-deps --no-build-isolation

## Full test suite (8-device virtual CPU mesh via tests/conftest.py)
test:
	$(PYTHON) -m pytest tests/ -q

## Fast iteration: skip the slow 3D/e2e tests
test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow" -x

## Quickest tier: also skip the golden-fixture parity pins.
## Measured (round 4): ~4 min warm / ~6 min cold on a 1-CPU host; the
## persistent JAX compile cache (tests/conftest.py, .pytest_jax_cache)
## makes repeat runs the warm case. On a multicore box add -n auto
## (pytest-xdist) to any tier.
test-quick:
	$(PYTHON) -m pytest tests/ -q -m "not slow and not parity" -x

## Only the cross-framework golden-fixture pins
test-parity:
	$(PYTHON) -m pytest tests/ -q -m parity

## Throughput benchmark (one JSON line; runs on the default platform)
bench:
	$(PYTHON) bench.py

## Multi-chip dry run on a virtual 8-device CPU mesh
dryrun:
	$(PYTHON) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'; \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

## Quick training run that captures a jax.profiler trace
profile:
	$(PYTHON) scripts/train_diffusion_mnist.py --steps 25 --batch 64 \
	    --channels 16 --profile --outdir runs/profile-smoke

clean:
	rm -rf runs/ __pycache__ .pytest_cache
	find . -name "*.pyc" -not -path "./.git/*" -delete
