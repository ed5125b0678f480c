# Convenience targets (CI uses the same invocations).

PYTEST_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test test-fast bench demo lint check-docs install-smoke

test:
	$(PYTEST_ENV) python -m pytest tests/ -q

check-docs:
	python tools/check_doc_drift.py

install-smoke:
	pip install -e . --no-deps --no-build-isolation -q
	python -c "import rayuela_tpu; \
	    from rayuela_tpu import api, models, ops, search, parallel, \
	        experiments, io; \
	    from rayuela_tpu.cli import main; \
	    print('install-smoke ok', rayuela_tpu.__version__)"

test-fast:
	$(PYTEST_ENV) python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

demo:
	python demos/train_query_base.py --dataset synthetic-small \
	    --m 4 --h 16 --niter 3 --knn 100

lint:
	python -m compileall -q rayuela_tpu demos tests
