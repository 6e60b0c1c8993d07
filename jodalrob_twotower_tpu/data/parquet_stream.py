"""Streaming pair input: train on pair sets too large for host memory.

The reference's four UnifiedBidDataset modes (SURVEY.md §2.4) reduce to two
regimes here:

* stores resident (host or HBM) + pairs resident  -> data/pipeline.py
* stores resident + **pairs streamed from parquet chunks** -> this module
  (the reference's mode 3: OFFSET/LIMIT chunk streaming with id-range
  scans, unified_bid_data_loader.py:183-219,375-406).

Chunks are read with pyarrow's batch iterator on a background thread,
key-joined to store rows with a vectorized sorted-array lookup, sharded
across hosts, shuffled within a chunk window, and emitted as [B, 2] int32
index batches ready for the indexed train step.

Multi-host sharding is LOCKSTEP by construction: every host reads and joins
every chunk identically, trims it to a multiple of host_count, and takes
the strided row slice [host_index::host_count]. Per chunk every host gets
exactly the same row count, so every host yields the same number of batches
— the invariant SPMD collectives require (a host running extra steps would
hang the mesh waiting for participants). Chunk round-robin (each host reads
every N-th chunk) was rejected: variable chunk sizes and per-chunk key
drops give hosts unequal batch counts. The cost — each host parses all pair
chunks — is two key columns per row, negligible next to feature IO.

(The reference's mode 4 — features too large for the host — is covered by
the host-streaming `train_batches` path plus sharded stores; on TPU the
feature matrices are small relative to HBM for this workload.)
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, Iterator, Sequence

import numpy as np

from jodalrob_twotower_tpu.data.feature_store import FeatureStore


class _KeyIndex:
    """Vectorized key -> row lookup (sorted array + searchsorted).

    The per-row python dict join it replaces cost ~20M dict gets per 10M-pair
    epoch per host — a multi-second host stall per epoch in a pipeline whose
    point is that the device never waits on the host.
    """

    def __init__(self, store: FeatureStore) -> None:
        keys = np.asarray(store.keys).astype(str)
        self._order = np.argsort(keys).astype(np.int64)
        self._sorted = keys[self._order]

    def lookup(self, query: np.ndarray) -> np.ndarray:
        """rows [N] int64; -1 where the key is absent."""
        query = np.asarray(query).astype(str)
        if not len(self._sorted):
            return np.full(len(query), -1, dtype=np.int64)
        pos = np.searchsorted(self._sorted, query)
        pos_c = np.minimum(pos, len(self._sorted) - 1)
        rows = self._order[pos_c]
        return np.where(self._sorted[pos_c] == query, rows, -1)


def stream_pair_chunks(
    paths: Sequence[str | Path] | str | Path,
    notice_store: FeatureStore,
    company_store: FeatureStore,
    *,
    chunk_rows: int = 1_000_000,
    host_index: int = 0,
    host_count: int = 1,
    on_missing: str = "drop",
) -> Iterator[np.ndarray]:
    """Yield pair-index chunks (int64 [<=chunk_rows//host_count, 2]).

    Files hold (notice_key, company_key) columns (data/parquet_dataset.py).
    Keys are joined to store rows chunk-by-chunk; missing keys drop
    (reference guaranteed-ID-match semantics) or raise per ``on_missing``.
    Every host receives exactly ``kept // host_count`` rows of each chunk
    (strided slice after an identical join), keeping hosts in lockstep.
    """
    import pyarrow.parquet as pq

    if isinstance(paths, (str, Path)):
        paths = [paths]
    n_idx = _KeyIndex(notice_store)
    c_idx = _KeyIndex(company_store)
    for path in paths:
        pf = pq.ParquetFile(str(path))
        for batch in pf.iter_batches(batch_size=chunk_rows, columns=["notice_key", "company_key"]):
            n_rows = n_idx.lookup(batch.column(0).to_numpy(zero_copy_only=False))
            c_rows = c_idx.lookup(batch.column(1).to_numpy(zero_copy_only=False))
            ok = (n_rows >= 0) & (c_rows >= 0)
            if on_missing == "error" and not ok.all():
                i = int(np.argmin(ok))
                raise KeyError(
                    "pair references missing key "
                    f"({batch.column(0)[i].as_py()!r}, {batch.column(1)[i].as_py()!r})"
                )
            rows = np.stack([n_rows[ok], c_rows[ok]], axis=1)
            # lockstep trim: same count on every host, no matter how many
            # rows this chunk had or how many keys dropped
            per_host = len(rows) // host_count
            if per_host:
                yield np.ascontiguousarray(rows[host_index::host_count][:per_host])


def streaming_index_batches(
    pair_chunks: Iterable[np.ndarray],
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    prefetch_chunks: int = 2,
) -> Iterator[np.ndarray]:
    """Background-prefetched chunk reader -> shuffled [B, 2] int32 batches.

    Within-chunk shuffling (the reference's streaming mode shuffled within
    the loaded window too); the carry between chunks keeps remainder rows so
    nothing is dropped mid-stream. An exception in the chunk iterator is
    re-raised HERE, on the consuming thread — swallowing it would turn a
    broken data source into a silently shorter "successful" epoch.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch_chunks)
    _DONE, _ERROR = object(), object()

    def reader():
        try:
            for chunk in pair_chunks:
                q.put(chunk)
        except BaseException as e:  # noqa: BLE001 - relayed to the consumer
            q.put((_ERROR, e))
            return
        q.put(_DONE)

    threading.Thread(target=reader, daemon=True).start()
    rng = np.random.default_rng(seed)
    carry = np.empty((0, 2), dtype=np.int64)
    while True:
        chunk = q.get()
        if chunk is _DONE:
            break
        if isinstance(chunk, tuple) and chunk[0] is _ERROR:
            raise chunk[1]
        if shuffle:
            chunk = chunk[rng.permutation(len(chunk))]
        if len(carry):
            chunk = np.concatenate([carry, chunk])
        n_full = len(chunk) // batch_size
        for i in range(n_full):
            yield np.ascontiguousarray(
                chunk[i * batch_size : (i + 1) * batch_size], dtype=np.int32
            )
        carry = chunk[n_full * batch_size :]
    if len(carry) and not drop_remainder:
        yield np.ascontiguousarray(carry, dtype=np.int32)
