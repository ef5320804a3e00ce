# Developer workflow targets (the reference's Makefile roles: build is a
# no-op for the Python package; native/ holds the C++ SA-IS kernel).

PY ?= python

.PHONY: all native test quicktest bench scaling clean

all: native

native: native/libsais.so

native/libsais.so: native/sais.cpp
	g++ -O3 -shared -fPIC $< -o $@

test:
	$(PY) -m pytest tests/ -q

# fast smoke: core parity + CLI surfaces only (the `make quicktest` role)
quicktest:
	$(PY) -m pytest tests/test_kernels.py tests/test_cli.py \
	    tests/test_formats.py -q

bench:
	$(PY) bench.py

scaling:
	JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) benchmarks/scaling.py

clean:
	rm -rf pfbwtf_tpu/__pycache__ tests/__pycache__ .pytest_cache
