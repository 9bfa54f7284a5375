# Development entry points (the CI/perf-regression harness the
# reference keeps in .travis.yml/appveyor.yml).

PYTHON ?= python

.PHONY: test test-full bench perf-gate check lint library

# fast tier: everything except @pytest.mark.slow (AD jets, MC sweeps,
# interpret-mode Pallas on big systems, examples) -- the iteration
# loop; every engine keeps at least one cross-pin here
test:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

# the whole suite, slow tests and example scripts included
test-full:
	$(PYTHON) -m pytest tests/ -q

# real-TPU benchmark; writes the one-line JSON and gates on it
bench:
	$(PYTHON) bench.py | tee bench.json

perf-gate: bench.json
	$(PYTHON) tools/perf_gate.py bench.json

# full gate: tests + bench + perf floor
check: test bench perf-gate

lint:
	$(PYTHON) -m pyflakes rayopt_tpu tests tools 2>/dev/null || \
	$(PYTHON) -m flake8 --select=F rayopt_tpu tests tools

# rebuild the bundled material catalog from a source corpus
library:
	$(PYTHON) tools/build_library.py
