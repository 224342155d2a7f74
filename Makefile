# Development targets (cf. the reference's Makefile.am:60-84).

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fPIC -shared -pthread
PY ?= python

.PHONY: all native test test-chip roundtrip bench clean cloc fuzz-native fuzz-py ci-local

all: native

native: _build/libbz3n.so

_build/libbz3n.so: csrc/bz3n.cpp
	mkdir -p _build
	$(CXX) $(CXXFLAGS) $< -o $@

test: native
	$(PY) -m pytest tests/ -q

# On-chip kernel lane: Mosaic-compiled parity on the REAL TPU
# (tests/test_on_chip.py) — the regressions interpret mode cannot see
# (DMA drains, watchdog, Mosaic lowering).  Needs a visible TPU; each
# kernel shape is a multi-minute compile through the tunnel, so this
# is a separate lane, not part of `make test`.
test-chip: native
	BZ3_TPU_ON_CHIP=1 $(PY) -m pytest tests/test_on_chip.py -v

# Round-trip the repo's own survey through the CLI and compare
# (cf. `make roundtrip` compressing LICENSE, reference Makefile.am:72).
roundtrip: native
	$(PY) -m bzip3_tpu -e -b 1 -c SURVEY.md > /tmp/bz3t_rt.bz3
	$(PY) -m bzip3_tpu -d -c /tmp/bz3t_rt.bz3 | cmp - SURVEY.md
	@echo roundtrip OK

bench: native
	$(PY) bench.py

# ASan/UBSan lane for the native engine — the reference's sanitizer
# story (examples/fuzz-decode-block.c:53-66) applied to csrc/bz3n.cpp.
FUZZ_ITERS ?= 10000
fuzz-native:
	mkdir -p _build
	$(CXX) -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
		-pthread -Icsrc csrc/fuzz_bz3n.cpp -o _build/fuzz_bz3n
	_build/fuzz_bz3n $(FUZZ_ITERS)

# Python fuzz harnesses at CI volume — the single source of truth for
# the iteration counts (ci.yml calls this target).
fuzz-py:
	$(PY) examples/fuzz_round_trip.py 0 400
	$(PY) examples/fuzz_decode_block.py 0 800
	$(PY) examples/fuzz_decompress.py 0 500
	$(PY) examples/differential_engines.py 0 10

# Run the full CI workflow (.github/workflows/ci.yml) locally — the
# same steps a hosted runner would execute, plus the API example.
ci-local: native test roundtrip fuzz-py
	$(PY) examples/hl_api.py
	$(MAKE) fuzz-native FUZZ_ITERS=20000
	@echo ci-local OK

clean:
	rm -rf _build __pycache__ bzip3_tpu/__pycache__

cloc:
	@command -v cloc >/dev/null && cloc bzip3_tpu csrc tests || wc -l bzip3_tpu/**/*.py csrc/*.cpp
