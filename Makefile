# Convenience targets mirroring the reference's Makefile (ref Makefile:36-54):
#   make run SCHEME=1 DIM=1000 OUT=out.txt DEVICES=8 EV=-e
# NUMTASKS (MPI ranks) maps to DEVICES (mesh size); leaves are auto-planned.

PY ?= python
SCHEME ?= 1
DIM ?= 1000
OUT ?=
DEVICES ?=
EV ?=
INPUT ?=

DEVFLAG := $(if $(DEVICES),--devices $(DEVICES),)
INFLAG := $(if $(INPUT),-i $(INPUT),-s $(SCHEME) -n $(DIM))

.PHONY: run test bench native clean

run:
	$(PY) -m symmetric_eigenvalue_tpu $(INFLAG) $(EV) $(DEVFLAG) $(OUT)

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

native: symmetric_eigenvalue_tpu/native/_mtxio.so

symmetric_eigenvalue_tpu/native/_mtxio.so: symmetric_eigenvalue_tpu/native/mtxio.c
	$(CC) -O2 -shared -fPIC -o $@ $<

clean:
	rm -f symmetric_eigenvalue_tpu/native/_mtxio.so
	find . -name __pycache__ -type d -exec rm -rf {} +
