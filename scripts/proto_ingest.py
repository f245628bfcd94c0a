"""Per-stage timing of the composed nomic ingest loop on the chip.

Replicates pipeline.ingest_shard's 3-stage loop over 8 batches of 256
synthetic docs and times each main-thread stage: prefetch wait, dispatch
(upload + issue), collect (device sync + readback), append. Also measures
the forward 3 ways to pin the true device time:
  pipelined  — 8 dispatches queued, one sync (device-resident rate)
  serial     — dispatch + collect per batch (what a sync loop pays)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from better_search_rag_rust_tpu.config import EncoderConfig
from better_search_rag_rust_tpu.models.encoder import create_encoder

B, NB = 256, 8


def main():
    rng = np.random.default_rng(0)
    docs = []
    for i in range(B * NB):
        body = " ".join(f"tok{rng.integers(0, 5000)}" for _ in range(400))
        docs.append(f"class F{i} {{ {body} }}")
    batches = [docs[i * B: (i + 1) * B] for i in range(NB)]

    svc = create_encoder(EncoderConfig(backend="nomic", dim=768, batch_size=B))
    print("warm compile...", flush=True)
    t0 = time.perf_counter()
    svc.get_embeddings(["warm"])
    print(f"startup {time.perf_counter()-t0:.1f}s", flush=True)

    tbs = [svc.tokenize(b) for b in batches]

    # pipelined: all dispatches first, then collect all
    t0 = time.perf_counter()
    pend = [svc.dispatch(tb) for tb in tbs]
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in pend:
        svc.collect(p)
    t_coll = time.perf_counter() - t0
    tot = t_disp + t_coll
    print(f"pipelined: dispatch-all {t_disp*1e3:.0f} ms, collect-all "
          f"{t_coll*1e3:.0f} ms -> {tot/NB*1e3:.0f} ms/batch "
          f"({B*NB/tot:.0f} f/s)", flush=True)

    # serial: dispatch+collect per batch
    t0 = time.perf_counter()
    for tb in tbs:
        svc.collect(svc.dispatch(tb))
    ser = time.perf_counter() - t0
    print(f"serial: {ser/NB*1e3:.0f} ms/batch ({B*NB/ser:.0f} f/s)",
          flush=True)

    # lag-1 (the ingest loop's shape), stage-timed
    t = {"disp": 0.0, "coll": 0.0}
    t0 = time.perf_counter()
    prev = None
    for tb in tbs:
        s = time.perf_counter()
        cur = svc.dispatch(tb)
        t["disp"] += time.perf_counter() - s
        if prev is not None:
            s = time.perf_counter()
            svc.collect(prev)
            t["coll"] += time.perf_counter() - s
        prev = cur
    s = time.perf_counter()
    svc.collect(prev)
    t["coll"] += time.perf_counter() - s
    lag = time.perf_counter() - t0
    print(f"lag-1: {lag/NB*1e3:.0f} ms/batch ({B*NB/lag:.0f} f/s); "
          f"dispatch {t['disp']/NB*1e3:.0f} ms, collect "
          f"{t['coll']/NB*1e3:.0f} ms per batch", flush=True)

    # upload-only cost of one batch's tokens
    import jax
    tb = tbs[0]
    t0 = time.perf_counter()
    for _ in range(NB):
        a = jax.device_put(tb.ids)
        b = jax.device_put(tb.mask)
        a.block_until_ready(); b.block_until_ready()
    print(f"token upload only: {(time.perf_counter()-t0)/NB*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
