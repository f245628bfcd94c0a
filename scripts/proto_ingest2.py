"""Instrumented Pipeline.ingest_shard on the chip: where do the non-encoder
milliseconds go? Monkeypatches timed wrappers around the encoder stages,
read_files, tokenize, append and checkpoint, then runs the real loop on the
same synthetic corpus the pipeline_nomic suite builds."""
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import better_search_rag_rust_tpu.pipeline as pl
from better_search_rag_rust_tpu.config import (CorpusConfig, EncoderConfig,
                                               PipelineConfig, SearchConfig,
                                               StoreConfig)
from better_search_rag_rust_tpu.models.encoder import EncoderService
from better_search_rag_rust_tpu.store.vectorstore import ParquetVectorStore

T = {}


def timed(name, fn):
    def w(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        T[name] = T.get(name, 0.0) + time.perf_counter() - t0
        return out
    return w


def main():
    tmp = tempfile.mkdtemp(prefix="bsr_probe_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    rng = np.random.default_rng(0)
    files = 1024
    for i in range(files):
        body = " ".join(f"tok{rng.integers(0, 5000)}" for _ in range(400))
        with open(os.path.join(src, f"F{i}.java"), "w") as f:
            f.write(f"class F{i} {{ {body} }}")

    cfg = PipelineConfig(
        corpus=CorpusConfig(root=src, extensions=("java",),
                            files_per_batch=256),
        encoder=EncoderConfig(backend="nomic", dim=768, batch_size=256),
        store=StoreConfig(dir=os.path.join(tmp, "vstore")),
        search=SearchConfig(top_k=50),
    )
    p = pl.Pipeline(cfg)
    print("warm...", flush=True)
    t0 = time.perf_counter()
    p.encoder.get_embeddings(["warm"])
    print(f"startup {time.perf_counter()-t0:.0f}s", flush=True)

    # timed wrappers
    svc = p.encoder
    svc.tokenize = timed("tokenize", svc.tokenize)
    svc.dispatch = timed("dispatch", svc.dispatch)
    svc.collect = timed("collect", svc.collect)
    pl.read_files = timed("read_files", pl.read_files)
    ParquetVectorStore.append_many = timed(
        "append", ParquetVectorStore.append_many)
    ParquetVectorStore.persist = timed("persist", ParquetVectorStore.persist)

    t0 = time.perf_counter()
    stats = p.ingest_shard(0, 1)
    el = time.perf_counter() - t0
    print(f"ingest: {el:.2f}s for {stats.embeddings} files "
          f"({stats.embeddings/el:.0f} f/s)", flush=True)
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v*1e3:8.0f} ms total", flush=True)
    main_thread = sum(
        T.get(k, 0.0) for k in ("dispatch", "collect", "append", "persist")
    )
    print(f"  main-thread accounted {main_thread*1e3:.0f} ms; "
          f"unaccounted {(el - main_thread)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
