# Local gate — run before every end-of-round snapshot. `make check`
# fails if any pytest fails OR any registered query diverges from its
# DuckDB oracle (the same comparison the driver's correctness gate
# runs), so a red board can never reach the snapshot unseen again
# (round 6 shipped 8 reds a single local run would have caught).

SF_DIR ?= /root/testdata/sf0.01

.PHONY: check test correctness bench

check: test correctness

test:
	python -m pytest tests/ -q

correctness:
	python tools/check_correctness.py $(SF_DIR)

bench:
	python bench.py
