"""Distributed exact top-k search engine over a sharded device store.

This is the TPU-native rebuild of the reference's parallel search coordinator
(reference: src/mpi_helpers/metrics.rs:174-206 ``parallel_top_k_similarity_search``):

reference (MPI)                               | here (JAX)
----------------------------------------------|----------------------------------
every rank re-parses global.parquet, slices   | store lives block-sharded in HBM
its `interval_by_rank` block (:23-33)         | (:class:`..store.DeviceStore`)
per-row scalar `cosine_distance` loop (:36-44)| MXU matmul inside `lax.scan`
local sort + truncate(k) (:47-50)             | running top-k merge (O(k) carry)
all_gather of candidate counts (:67-69) +     | `lax.all_gather` of fixed-size
hand-rolled p2p gather-v (:93-132)            | [k] candidate blocks (k is static,
                                              | so no ragged gather exists at all)
root-only sort + dedup-by-index (:141-171)    | replicated `lax.top_k` merge
barriers (:135,197)                           | XLA program order

The whole search is one jitted SPMD program; there is no root rank — every
host gets the identical replicated result.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..config import SearchConfig
from ..store.device_store import DeviceStore
from .distance import normalize_rows
from .topk import global_topk, local_topk, serial_topk

DATA_AXIS = "data"


#: Largest store size whose row ids are EXACT in float32 (2^24): above it
#: the packed single-readback path is disabled and collect falls back to
#: two transfers. Do NOT bitcast ids instead — small int32 bit patterns
#: are f32 denormals and TPU hardware flushes denormals to zero in any
#: copy/compute, silently zeroing the ids (observed on chip: recall 1.0 ->
#: 0.001 while every CPU test stayed green).
PACK_MAX_ROWS = 1 << 24


@jax.jit
def _pack_results(vals: jax.Array, ids: jax.Array) -> jax.Array:
    """``(sims f32 [Q,k], ids int [Q,k]) -> [Q, 2k]`` f32 with the ids
    VALUE-converted into the second half (exact for ids < 2^24)."""
    return jnp.concatenate(
        [vals.astype(jnp.float32), ids.astype(jnp.float32)], axis=1
    )


class SearchEngine:
    """Exact batched cosine top-k over a :class:`DeviceStore`."""

    def __init__(self, store: DeviceStore, config: Optional[SearchConfig] = None):
        self.store = store
        self.config = config or SearchConfig()
        self._compiled: Dict[Tuple[int, int, str], jax.stages.Compiled] = {}

    # -- public API -----------------------------------------------------------

    def _prepare_queries(self, queries: np.ndarray) -> np.ndarray:
        """2-D f32 queries, Matryoshka-truncated to the store dim when the
        store was truncated (the engine re-normalizes before scoring)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if (
            self.store.matryoshka_from is not None
            and queries.shape[1] == self.store.matryoshka_from
        ):
            queries = np.ascontiguousarray(queries[:, : self.store.dim])
        if queries.shape[1] != self.store.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != store dim {self.store.dim}"
            )
        return queries

    def _resolve_k(self, k: Optional[int]) -> int:
        k = self.config.top_k if k is None else k
        if k <= 0:
            raise ValueError(f"top_k must be positive, got {k}")
        return min(k, self.store.num_rows)

    def _dispatch(self, queries: np.ndarray, k_eff: int):
        """Prepare + zero-pad queries to the store's padded dim and launch
        the compiled search; returns device arrays (async)."""
        queries = self._prepare_queries(queries)
        padded_dim = self.store.data.shape[1]
        if padded_dim != queries.shape[1]:
            padded = np.zeros((queries.shape[0], padded_dim), dtype=np.float32)
            padded[:, : queries.shape[1]] = queries
            queries = padded
        fn = self._get_fn(queries.shape[0], k_eff)
        return fn(self.store.data, jnp.asarray(queries))

    def _pack(self, out):
        """Fuse (similarities f32, ids int32) into ONE ``[Q, 2k]`` f32
        buffer (ids value-converted — exact below ``PACK_MAX_ROWS``) so
        collect needs a single host readback — each synchronous
        device->host round trip costs a fixed ~26 ms through a relayed
        chip, and two separate device_gets pay it twice. Stores with ids
        beyond f32-exact range pass through unpacked."""
        if self.store.num_rows >= PACK_MAX_ROWS:
            return out
        vals, ids = out
        return _pack_results(vals, ids)

    @staticmethod
    def _collect(out) -> Tuple[np.ndarray, np.ndarray]:
        """Device (similarities, ids) -> host (ids int64, distances)."""
        if isinstance(out, jax.Array):  # packed buffer from _pack
            host = np.asarray(jax.device_get(out))
            k = host.shape[1] // 2
            sims = host[:, :k]
            indices = host[:, k:].astype(np.int64)
        else:
            vals, ids = out
            sims = np.asarray(jax.device_get(vals), dtype=np.float32)
            indices = np.asarray(jax.device_get(ids), dtype=np.int64)
        return indices, 1.0 - np.clip(sims, -1.0, 1.0)

    def search(
        self, queries: np.ndarray, k: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k rows for a batch of queries.

        Returns ``(indices [Q, k'], distances [Q, k'])`` with
        ``k' = min(k, num_rows)`` (the reference likewise returns at most the
        stored row count, src/mpi_helpers/metrics.rs:169), distances
        ascending, ties by lowest store row index.
        """
        return self._collect(self._pack(self._dispatch(queries, self._resolve_k(k))))

    def supports_store_upload(self) -> bool:
        """Whether ``upload="store"`` actually shrinks query upload bytes
        here: true for sub-f32 store dtypes — 2x for bf16/f16, 4x for
        int8."""
        return jnp.dtype(self.store.data.dtype).itemsize < 4

    def prepare_upload_queries(self, queries: np.ndarray) -> np.ndarray:
        """Host-side query prep for the halved-upload streaming path:
        :func:`normalize_rows`' arithmetic evaluated in host f32, then ONE
        rounding to the store dtype, padded to the store's padded dim.

        These are the exact bits the precast program scores with, so the
        oracle contract holds verbatim — feed the same array to
        :meth:`oracle_topk` via ``upload="store"``. The rounding is defined
        HOST-side on this path (the default path rounds on device after an
        on-device f32 normalize); the two can differ on elements whose f32
        normalized value sits within an f32 ulp of a store-dtype rounding
        boundary, so each path is exact against its own query bits.
        """
        queries = self._prepare_queries(queries)
        norms = np.sqrt(
            np.sum(queries * queries, axis=-1, keepdims=True, dtype=np.float32)
        )
        qn = queries / np.where(norms == 0.0, 1.0, norms)
        from .quantize import cast_rows_to_host

        padded_dim = self.store.data.shape[1]
        out = np.zeros((qn.shape[0], padded_dim), dtype=self.store.data.dtype)
        out[:, : qn.shape[1]] = cast_rows_to_host(qn, self.store.data.dtype)
        return out

    def _resolve_upload(self, upload: str) -> bool:
        """True when this dispatch should take the precast (store-dtype
        upload) program. ``"store"`` engages only where it shrinks bytes
        (sub-f32 stores); f32 stores keep the default device-side
        rounding."""
        if upload not in ("f32", "store"):
            raise ValueError(f"upload must be 'f32' or 'store', got {upload!r}")
        return upload == "store" and self.supports_store_upload()

    def _dispatch_cast(self, queries: np.ndarray, k_eff: int):
        """Launch the precast program on host-rounded store-dtype queries
        (from :meth:`prepare_upload_queries`) — half the upload bytes of
        :meth:`_dispatch` on bf16 stores."""
        qc = self.prepare_upload_queries(queries)
        fn = self._get_fn(qc.shape[0], k_eff, precast=True)
        return fn(self.store.data, jnp.asarray(qc))

    def _dispatch_device(self, queries: jax.Array, k_eff: int):
        """Launch the standard program on DEVICE-resident f32 queries (e.g.
        straight from the encoder) — no host round trip on the query side.
        Mirrors :meth:`_prepare_queries`' Matryoshka truncation and dim
        padding as (tiny, async) device ops."""
        if (
            self.store.matryoshka_from is not None
            and queries.shape[1] == self.store.matryoshka_from
        ):
            queries = queries[:, : self.store.dim]
        if queries.shape[1] != self.store.dim:
            raise ValueError(
                f"query dim {queries.shape[1]} != store dim {self.store.dim}"
            )
        if queries.dtype != jnp.float32:
            queries = queries.astype(jnp.float32)
        padded_dim = self.store.data.shape[1]
        if padded_dim != queries.shape[1]:
            queries = jnp.pad(
                queries, ((0, 0), (0, padded_dim - queries.shape[1]))
            )
        fn = self._get_fn(queries.shape[0], k_eff)
        return fn(self.store.data, queries)

    def search_async(
        self, queries: np.ndarray, k: Optional[int] = None,
        upload: str = "f32",
    ):
        """Dispatch a search WITHOUT waiting: launches the compiled program
        and starts the device->host copy of the packed result buffer
        asynchronously, so by :meth:`collect` time the bytes are already in
        flight. Returns an opaque handle for :meth:`collect`. This is the
        building block under :meth:`search_stream` and the serve loop's
        request pipelining.

        ``upload="store"`` rounds queries to the store dtype on the HOST
        (:meth:`prepare_upload_queries`) and uploads half the bytes — the
        win where the host->device link is the serving bottleneck.

        ``queries`` may also be a DEVICE array (``jax.Array``, e.g. straight
        from the encoder): then nothing uploads at all — the query side
        stays on device (``upload`` is ignored; results are bitwise the
        round trip's, since an f32 host round trip is lossless)."""
        k_eff = self._resolve_k(k)
        if isinstance(queries, jax.Array):
            buf = self._pack(self._dispatch_device(queries, k_eff))
        elif self._resolve_upload(upload):
            buf = self._pack(self._dispatch_cast(queries, k_eff))
        else:
            buf = self._pack(self._dispatch(queries, k_eff))
        for arr in (buf,) if isinstance(buf, jax.Array) else buf:
            arr.copy_to_host_async()
        return buf

    def collect(self, handle) -> Tuple[np.ndarray, np.ndarray]:
        """Wait for a :meth:`search_async` handle and return the host-facing
        ``(indices [Q, k'], distances [Q, k'])`` contract of :meth:`search`."""
        return self._collect(handle)

    def search_stream(
        self, batches, k: Optional[int] = None, depth: int = 1,
        upload: str = "f32",
    ):
        """Pipelined streaming search: yields ``(indices, distances)`` per
        query batch, keeping up to ``depth`` batches in flight on the device
        before batch results are pulled back, so host transfer overlaps
        device compute (BASELINE.json config 5: "streaming queries").

        Per batch, results are packed into a single readback buffer (see
        :meth:`_pack`) and the device->host copy starts ASYNCHRONOUSLY at
        dispatch time, so by collect time the bytes are already in flight —
        measured 8.5k -> 13.4k q/s on a relayed chip, reaching the
        query-upload bandwidth floor (~75 ms per 3 MB batch there). Deeper
        queues measured WORSE through the relay (its scheduler penalizes
        queued work), hence the conservative default; on directly-attached
        hosts a depth of 2-3 hides longer device compute.

        Batches sharing one shape reuse a single compiled program; a new
        shape compiles once.

        ``upload="store"`` uploads host-rounded store-dtype query bits —
        half the bytes on bf16 stores, the direct lever on an upload-bound
        stream (see :meth:`search_async`).
        """
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        from collections import deque

        k_eff = self._resolve_k(k)
        pending = deque()
        for q in batches:
            pending.append(self.search_async(q, k_eff, upload=upload))
            if len(pending) > depth:
                yield self.collect(pending.popleft())
        while pending:
            yield self.collect(pending.popleft())

    def prepare_device_queries(self, queries: np.ndarray) -> jax.Array:
        """Host ``[Q, D]`` queries -> normalized f32 device array padded to
        the store's padded dim — the exact input ``search_device`` wants."""
        queries = self._prepare_queries(queries)
        padded_dim = self.store.data.shape[1]
        if padded_dim != queries.shape[1]:
            padded = np.zeros((queries.shape[0], padded_dim), dtype=np.float32)
            padded[:, : queries.shape[1]] = queries
            queries = padded
        return jax.device_put(jnp.asarray(queries))

    def search_device(
        self, queries: jax.Array, k: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Device-resident search: queries already in HBM (e.g. straight from
        the encoder or :meth:`prepare_device_queries`), results stay on
        device as ``(similarities [Q, k], ids [Q, k])``.

        This is the serving hot path — no host transfer on either side, so
        dispatches pipeline freely. Use :meth:`search` for the host-facing
        ``(indices, distances)`` contract.
        """
        k_eff = self._resolve_k(k)
        if queries.shape[1] != self.store.data.shape[1]:
            raise ValueError(
                f"device queries must be padded to {self.store.data.shape[1]}"
                f" features (got {queries.shape[1]}); use"
                " prepare_device_queries"
            )
        fn = self._get_fn(queries.shape[0], k_eff)
        return fn(self.store.data, queries)

    def kernel_name(self, k: Optional[int] = None) -> str:
        """The kernel the engine will run for this ``k`` (public mirror of
        the internal resolution, for reporting/benchmarks)."""
        return self._resolve_kernel(self._resolve_k(k))

    def search_single(
        self, query: np.ndarray, k: Optional[int] = None
    ) -> list[tuple[int, float]]:
        """Single-query convenience matching the reference driver's shape:
        a ranked ``[(store row id, distance)]`` list
        (reference: src/mpi_helpers/metrics.rs:174-206)."""
        ids, dists = self.search(np.asarray(query).reshape(1, -1), k)
        return list(zip(ids[0].tolist(), dists[0].tolist()))

    # -- oracle hooks ----------------------------------------------------------

    def oracle_topk(
        self, queries: np.ndarray, k: Optional[int] = None,
        upload: str = "f32",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Serial-scan oracle over the *same scoring arithmetic* the engine
        uses (one full similarity matrix on one device, selection by stable
        numpy argsort). This is the faithful generalization of the
        reference's exactness check, where serial and parallel paths shared
        one cosine kernel (src/metrics.rs:143) and only the distribution
        machinery differed. ``top_k_overlap(oracle, engine) == 1.0`` is the
        correctness contract for every store size, dtype and mesh.

        ``upload`` selects which query-bit definition the oracle pins:
        ``"f32"`` = the default path's on-device normalize + rounding;
        ``"store"`` = the host-rounded bits of
        :meth:`prepare_upload_queries`, matching
        ``search_stream(..., upload="store")``.
        """
        import jax.numpy as jnp  # local alias for clarity

        queries = self._prepare_queries(queries)
        k = self.config.top_k if k is None else k
        store_host = np.asarray(jax.device_get(self.store.data))
        dev = jax.devices()[0]

        if self._resolve_upload(upload):
            qp = self.prepare_upload_queries(queries)

            @jax.jit
            def _sims_cast(data, qc):
                from .topk import xla_sims

                return xla_sims(qc, data)

            sims = np.asarray(
                _sims_cast(
                    jax.device_put(store_host, dev), jax.device_put(qp, dev)
                )
            )[:, : self.store.num_rows]
            return serial_topk(
                self.effective_store(), queries,
                min(k, self.store.num_rows), sims=sims,
            )

        padded_dim = self.store.data.shape[1]
        qp = np.zeros((queries.shape[0], padded_dim), dtype=np.float32)
        qp[:, : queries.shape[1]] = queries

        @jax.jit
        def _sims(data, q):
            # The barrier pins the query's store-dtype rounding: without
            # it XLA folds the convert into this small program's single
            # matmul and effectively scores with higher-precision queries
            # — ~1e-4 sims shifts vs the engine's materialized bf16 query
            # bits, which flipped near-ties on chip (engine kernels all
            # agreed with each other and differed from the oracle). The
            # contract is scores over store-rounded rows AND queries.
            from .quantize import cast_rows_to
            from .topk import xla_sims

            qc = jax.lax.optimization_barrier(
                cast_rows_to(normalize_rows(q), data.dtype))
            return xla_sims(qc, data)

        sims = np.asarray(
            _sims(jax.device_put(store_host, dev), jax.device_put(qp, dev))
        )[:, : self.store.num_rows]
        return serial_topk(
            self.effective_store(), queries, min(k, self.store.num_rows), sims=sims
        )

    # -- host-side reference oracle --------------------------------------------

    def effective_store(self) -> np.ndarray:
        """What the engine actually scores against (normalized + dtype-rounded
        valid rows, as float32) — feed this to :func:`..ops.topk.serial_topk`
        for the equal-memory exactness oracle."""
        return self.store.effective_matrix()

    def effective_queries(self, queries: np.ndarray) -> np.ndarray:
        """Queries after the engine's normalize + store-dtype cast, as f32
        (int8 stores: the lattice integers, exact in f32 — pair with
        :meth:`effective_store` through
        :func:`..ops.quantize.int8_sims_host`)."""
        from .quantize import cast_rows_to

        queries = self._prepare_queries(queries)
        qn = np.asarray(normalize_rows(jnp.asarray(queries)))
        return np.asarray(
            cast_rows_to(jnp.asarray(qn), self.store.data.dtype).astype(
                jnp.float32)
        )

    # -- compilation -----------------------------------------------------------

    def _f32_cert_wins(self, k_eff: int) -> bool:
        """Route f32 stores to the certified two-stage path
        (:func:`..topk.rescore_f32_certified`) when it is the measured
        win: real-TPU backend (Mosaic selection + XLA-HIGHEST rescore;
        on CPU the dense path is already exact-and-cheap), big shards
        (the pass amortizes over >= 2^19 rows — same floor as
        ``_rescore_wins``), and k small enough that the fixed ks=256
        candidate budget covers the certificate margin (chip-measured
        cert rate 1.000 at k=100, 1M x 768;
        scripts/proto_f32_rescore3.py). ``f32_certified="on"`` forces
        the path anywhere (tests drive both cert branches with it);
        "off" disables. Exactness never depends on the routing: the
        in-program certificate falls back to the dense branch whenever
        coverage cannot be proven."""
        mode = getattr(self.config, "f32_certified", "auto")
        if mode == "off" or jnp.dtype(self.store.data.dtype) != jnp.float32:
            return False
        if k_eff > 128:
            return False
        if mode == "on":
            return True
        if jax.default_backend() != "tpu":
            return False
        if self.store.per_device_rows < 1 << 19:
            return False
        from .topk_pallas import pick_bm2_row_tile

        try:
            rows_pad = self.store.per_device_rows
            rows_pad += (-rows_pad) % 1024
            pick_bm2_row_tile(rows_pad, self.store.data.shape[1], 512,
                              8, 256, 4)
        except ValueError:
            return False
        return True

    def _resolve_kernel(self, k_eff: int) -> str:
        kernel = self.config.kernel
        if kernel == "auto":
            if self._f32_cert_wins(k_eff):
                return "f32cert"
            if self._rescore_wins(k_eff):
                return "rescore"
            # Dense two-stage selection with macro chunking handles any
            # shard size at a bounded sims buffer. Fused Pallas scoring
            # wins on real TPUs (~20% over the XLA matmul+reduce); it is
            # bf16-only there (Mosaic's f32 matmul is not the oracle's
            # arithmetic — see topk_pallas.pallas_scoring_exact_for);
            # interpret mode elsewhere would crawl.
            from .topk_pallas import pallas_scoring_exact_for

            kernel = (
                "pallas"
                if jax.default_backend() == "tpu"
                and pallas_scoring_exact_for(self.store.data.dtype)
                else "global"
            )
        return kernel

    def _argmax_enabled(self) -> bool:
        """Whether the rescore argmax fast path runs for THIS store.

        "off" disables it everywhere; "auto" disables it for int8 LOW-DIM
        stores: the m2/argmax emission is ~3 VPU passes over the int32 accs
        that cannot hide under the HALVED-depth int8 MXU dot at low dim
        (+5.4 ms per 10M x 256 tile, docs/DESIGN.md round-8 isolation),
        while the full gather it avoids moves only ~ks*sub*dim bytes
        (~2 ms of DMA there) — chip-measured 15.5 vs 13.5 ms/tile
        (scripts/proto_r3_fullg.py, ids identical). High-dim int8 (768-d)
        keeps the fast path: the deeper dot hides the emission. Exactness
        never depends on the choice (both paths are oracle-exact)."""
        mode = self.config.rescore_argmax
        if mode == "off":
            return False
        dim = self.store.data.shape[1]
        itemsize = jnp.dtype(self.store.data.dtype).itemsize
        if (
            mode == "auto"
            and jnp.dtype(self.store.data.dtype) == jnp.int8
            and dim * max(itemsize, 2) < 1024
        ):
            return False
        return True

    def _rescore_geometry(self, k_eff: int):
        """(sub, block, cpg) for the sims-free rescore pipeline at this
        store's dim.

        High-dim stores: 16-row units cut the full-gather traffic 8x vs
        128-row blocks — but under the argmax fast path the selected
        units' rows are no longer gathered at all, and the dominant cost
        becomes the [R/sub, T] refine sources — bms plus the packed
        (m2, argmax) key (source-bytes bound, ~138 GB/s scan-select) —
        so sub WIDENS to 64 there: both source scans halve vs sub=32
        (chip-measured 6.34 -> 5.19 ms per [512, 1M x 768] tile at
        danger capacity 8, scripts/proto_tail.py). The doubled same-unit
        danger rate that kept round 5 at sub=32 stopped mattering once
        non-danger capacity slots became ~free (the dummy-id DMA-skip
        padding in ..topk.rescore_topk), so capacity 8 stays the default.
        Low-dim huge stores keep 128-row units / 1024-row blocks
        (sub=256 measured WORSE at 10M x 256 — the bm pass slows more
        than the smaller sources save).

        The high/low split keys on ``dim * max(itemsize, 2)``: the
        refine-source arrays that motivate wide subs are f32 and
        dtype-independent, so an int8 768-d store belongs with bf16 768-d,
        not with the byte-equivalent bf16 384-d."""
        dim = self.store.data.shape[1]
        itemsize = jnp.dtype(self.store.data.dtype).itemsize
        argmax = self._argmax_enabled()
        if dim * max(itemsize, 2) >= 1024:
            return (64, 128, 4) if argmax else (16, 128, 8)
        return 128, 1024, 4

    def _rescore_wins(self, k_eff: int) -> bool:
        """The sims-free rescore pipeline beats the dense two-stage path
        when its per-query traffic undercuts the sims write + gather-rescan
        (8 * rows bytes). Rescore traffic by variant:

        * argmax fast path (steady state when enabled): refine rescan of
          the TWO sub-level arrays (bms + the packed (m2, argmax) key,
          ~8 * rows / sub bytes) + the danger gather of only ``gd``
          units (~gd * sub * dim_bytes, weighted ~2.5x for the measured
          ~57 ns/unit DMA issue cost).
        * round-3 full gather: bm_sub write + refine rescan
          (~8 * rows / sub) + ALL ks selected units' rows
          (~ks * sub * dim_bytes, same 2.5x weight).

        Measured v5e wins: 10M x 256 bf16 2.2x (round 2, 128-unit form)
        and 1M x 768 bf16 ~1.7x (round 3, 16-unit two-level form). Small
        shards stay on the proven sims path: their sims buffers are cheap
        and the rescore pass has fixed costs."""
        from .topk_pallas import pallas_scoring_exact_for

        rows = self.store.per_device_rows
        dim = self.store.data.shape[1]
        itemsize = jnp.dtype(self.store.data.dtype).itemsize
        sub, _block, cpg = self._rescore_geometry(k_eff)
        if self._argmax_enabled():
            gd = max(1, self.config.danger_units)
            rescore_traffic = (8 * rows // sub
                               + 5 * gd * sub * dim * itemsize // 2)
        else:
            ks = k_eff + (-k_eff) % cpg
            rescore_traffic = (8 * rows // sub
                               + 5 * ks * sub * dim * itemsize // 2)
        return (
            rows >= 1 << 19
            and rescore_traffic < 8 * rows
            # The fast path needs the Mosaic dot (bf16-only on real TPUs);
            # the f32 rescore branch materializes sims and wins nothing.
            and pallas_scoring_exact_for(self.store.data.dtype)
        )

    def _device_profile(self):
        """Planner constants for the local device kind (config-overridable;
        see :mod:`.device_profile`). Exactness never depends on these."""
        if getattr(self, "_profile_cache", None) is None:
            from .device_profile import local_device_kind, resolve_profile

            cfg = self.config
            self._profile_cache = resolve_profile(
                cfg.device_kind or local_device_kind(),
                hbm_gb=cfg.hbm_gb,
                hbm_gbps=cfg.hbm_gbps,
                slice_ns=cfg.slice_ns,
                final_topk_us=cfg.final_topk_us,
            )
        return self._profile_cache

    def _vmem_q_cap(self) -> int:
        """Largest query tile for which the Pallas kernel's smallest row
        tile (rt = 8 * block) still fits the ~12 MB VMEM budget at this
        feature dim: 2*rt*dim*itemsize + 2*t*rt*4 + t*dim*itemsize <= 12 MB,
        so an auto-resolved pallas kernel can never hit the no-tile error."""
        dim = self.store.data.shape[1]
        itemsize = jnp.dtype(self.store.data.dtype).itemsize
        rt = 8 * self.config.row_block
        budget = 12 * 1024 * 1024 - 2 * rt * dim * itemsize
        if budget <= 0:
            return 8
        return max(8, budget // (8 * rt + dim * itemsize))

    def _plan(self, q: int, k_eff: int) -> Tuple[int, int]:
        """Jointly pick (q_tile, macro_rows) from a measured cost model.

        Store reads scale with the number of query tiles (each tile
        re-streams the shard); candidate-gather cost is slice-bound at
        ~130 ns per (query, block) dynamic slice and scales with the number
        of macro chunks (n_chunks ~ q_tile * rows * 4 / sims budget) — so
        wide tiles suit big-dim stores that fit one chunk (1M x 768 ->
        T=512) and narrower tiles suit huge stores where chunk count
        dominates (10M x 256 -> T=256). Constants come from the per-device
        profile table (:mod:`.device_profile`, v5e-measured, config-
        overridable); exactness never depends on this choice.
        """
        rows = self.store.per_device_rows
        dim = self.store.data.shape[1]
        itemsize = jnp.dtype(self.store.data.dtype).itemsize
        budget = self._sims_budget()
        cap = min(q, self._vmem_q_cap())
        align = 8 * self.config.row_block
        prof = self._device_profile()
        hbm_bps = prof.hbm_gbps * 1e9

        best = None
        for t in (128, 256, 512, 1024):
            t_eff = max(8, min(t, (cap // 8) * 8))
            n_tiles = -(-q // t_eff)
            n_chunks = max(1, -(-(t_eff * rows * 4) // budget))
            macro = -(-rows // n_chunks)
            macro = macro + (-macro) % align
            store_cost = n_tiles * rows * dim * itemsize / hbm_bps
            sims_cost = q * rows * 4 / hbm_bps
            slice_cost = q * k_eff * n_chunks * prof.slice_ns * 1e-9
            final_cost = q * n_chunks * prof.final_topk_us * 1e-6
            cost = store_cost + sims_cost + slice_cost + final_cost
            if best is None or cost < best[0]:
                best = (cost, t_eff, macro)
            if t_eff < t:  # cap reached; larger t won't differ
                break
        return best[1], best[2]

    def _sims_budget(self) -> int:
        """f32 sims-buffer budget in bytes for the dense sims-path kernels.
        ``config.sims_buffer_bytes`` when positive; otherwise sized from
        free HBM. The budget sets the macro-chunk count; each chunk pays a
        candidate-gather rescan of its sims plus fixed selection ops, so
        fewer chunks help until HBM pressure bites (measured optimum ~4 GB
        on 10M x 256 — though that config now routes to the sims-free
        rescore kernel entirely)."""
        b = self.config.sims_buffer_bytes
        if b > 0:
            return b
        free = 0
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            free = stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
        except Exception:
            pass
        if free <= 0:
            # memory_stats is empty on some PJRT transports (e.g. the
            # relayed test chip): size from the device profile instead,
            # minus what the store itself occupies per device.
            total = int(self._device_profile().hbm_gb * (1 << 30))
            if total:
                store_bytes = (
                    self.store.per_device_rows
                    * self.store.data.shape[1]
                    * jnp.dtype(self.store.data.dtype).itemsize
                )
                free = total - store_bytes
        if free > 0:
            # Cap at 4 GB: measured on the 10M x 256 config, macro chunks
            # beyond ~3.3M rows make the candidate gather's per-slice cost
            # grow (~130 ns/slice at NB=8k blocks -> ~414 ns at NB=26k), so
            # an 8 GB buffer (fewer, bigger chunks) ran SLOWER than 4 GB.
            return int(min(4 << 30, max(1 << 30, free - (2 << 30))))
        return 2 << 30

    def _macro_rows(self, q_tile: int) -> int:
        """Rows per macro chunk: bound the f32 sims buffer at this tile."""
        return max(
            8 * self.config.row_block,
            self._sims_budget() // (q_tile * 4),
        )

    def _get_fn(self, q: int, k_eff: int, precast: bool = False):
        kernel = self._resolve_kernel(k_eff)
        key = (q, k_eff, kernel, precast)
        cached = self._compiled.get(key)
        if cached is not None:
            return cached

        store = self.store
        mesh = store.mesh
        per_dev = store.per_device_rows
        chunk = store.chunk
        num_rows = store.num_rows
        store_dtype = store.data.dtype

        q_tile, macro_rows = self._plan(q, k_eff)
        if kernel == "rescore":
            # No sims buffer exists on this path, so ignore the sims-driven
            # plan. Nothing store-sized is allocated beyond the shard itself
            # (round 2's pre-relaid blocks cache is gone — the fused gather
            # DMAs straight from the [R, D] store), so the tile is bounded
            # only by the bm2 kernel's VMEM budget. T=512 measured best on
            # v5e; T=1024 gains nothing (pass + gather are tile-count
            # invariant) and doubles the in-register sims tile.
            q_tile = max(8, min(q, 512, self._vmem_q_cap()))
        sub, blk, cpg = self._rescore_geometry(k_eff)

        argmax_fast = self._argmax_enabled()
        danger_units = self.config.danger_units

        def shard_fn_rescore(shard, queries_cast):
            from .topk import rescore_topk

            base = jax.lax.axis_index(DATA_AXIS) * per_dev
            return rescore_topk(
                shard, queries_cast, k_eff, base, num_rows, q_tile,
                use_pallas=(jax.default_backend() == "tpu"),
                sub_block=sub, block=blk, cpg=cpg,
                argmax_fast=argmax_fast, danger_units=danger_units,
                danger_cpg=self.config.danger_cpg,
                sup_w=self.config.rescore_sup_w,
            )

        def shard_fn(shard, queries_cast):
            base = jax.lax.axis_index(DATA_AXIS) * per_dev
            if kernel == "f32cert":
                from .topk import rescore_f32_certified

                return rescore_f32_certified(
                    shard, queries_cast, k_eff, base, num_rows,
                    q_tile=max(8, min(q, 512)),
                )
            if kernel in ("global", "pallas"):
                return global_topk(
                    shard, queries_cast, k_eff, base, num_rows, q_tile,
                    use_pallas=(kernel == "pallas"),
                    block=self.config.row_block,
                    macro_rows=macro_rows,
                )
            return local_topk(
                shard, queries_cast, k_eff, chunk, base, num_rows, kernel
            )

        # Each shard emits a fixed-size [Q, k] candidate block; the out_specs
        # concatenate them along a sharded axis in shard order, replacing the
        # reference's counts-all_gather + ragged p2p gather-v
        # (src/mpi_helpers/metrics.rs:56-138) — k is static, so no
        # variable-length gather exists at all.
        mapped = _shard_map(
            shard_fn_rescore if kernel == "rescore" else shard_fn,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(None, None)),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
            # vma tracking rejects pallas_call outputs inside shard_map
            # (replicated queries x varying shard); correctness is covered
            # by the oracle-exactness harness instead.
            check_vma=False,
        )

        n_shards = mesh.devices.size

        def merge(cand_vals, cand_ids):
            # Final merge (≙ root-only compute_global_top_k,
            # src/mpi_helpers/metrics.rs:141-171) — XLA inserts the gather,
            # and shard order keeps ties resolving to the lowest index.
            # Every kernel emits its [Q, k] block already sorted
            # (value desc, gid asc), so with ONE shard the top_k is an
            # identity reorder — skip it.
            if n_shards == 1:
                return cand_vals, cand_ids
            top_vals, pos = jax.lax.top_k(cand_vals, k_eff)
            return top_vals, jnp.take_along_axis(cand_ids, pos, axis=1)

        sharded = NamedSharding(mesh, P(DATA_AXIS, None))
        replicated = NamedSharding(mesh, P(None, None))

        if precast:
            # Queries arrive already normalized + rounded to the store
            # dtype on the HOST (prepare_upload_queries) — the bits are
            # materialized by construction, so no barrier is needed.
            def search_fn(data, queries_cast):
                return merge(*mapped(data, queries_cast))
        else:
            from .quantize import cast_rows_to

            def search_fn(data, queries):
                # barrier: guarantee the kernels consume materialized
                # store-dtype query bits whatever XLA fusion decides (the
                # oracle pins the same — see oracle_topk)
                queries_cast = jax.lax.optimization_barrier(
                    cast_rows_to(normalize_rows(queries), store_dtype))
                return merge(*mapped(data, queries_cast))

        fn = jax.jit(search_fn, in_shardings=(sharded, replicated))
        self._compiled[key] = fn
        return fn
