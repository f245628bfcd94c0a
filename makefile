# Launch targets (reference: makefile — `make run` / `N=... make run` over
# mpiexec; here the parallelism is the device mesh, so no process count knob).

ROOT ?= .repos/jabref
STORE ?= .volumes/vstore
SUITE ?= search_1m

.PHONY: test run ingest search bench clean

test:
	python -m pytest tests/ -q

run:
	python -m better_search_rag_rust_tpu run --root $(ROOT) --store-dir $(STORE)

ingest:
	python -m better_search_rag_rust_tpu ingest --root $(ROOT) --store-dir $(STORE)

# Serve search from the persisted store (reference: SKIP_PROCESS=true make run)
search:
	python -m better_search_rag_rust_tpu search --store-dir $(STORE)

bench:
	BENCH_SUITE=$(SUITE) python bench.py

clean:
	rm -rf $(STORE) .pytest_cache
