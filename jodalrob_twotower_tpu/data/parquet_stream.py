"""Streaming pair input: train on pair sets too large for host memory.

The reference's four UnifiedBidDataset modes (SURVEY.md §2.4) reduce to two
regimes here:

* stores resident (host or HBM) + pairs resident  -> data/pipeline.py
* stores resident + **pairs streamed from parquet chunks** -> this module
  (the reference's mode 3: OFFSET/LIMIT chunk streaming with id-range
  scans, unified_bid_data_loader.py:183-219,375-406).

Chunks are read with pyarrow's batch iterator on a background thread,
key-joined to store rows, shuffled within a chunk window, and emitted as
[B, 2] int32 index batches ready for the indexed train step. Per-host
sharding for multi-host training takes every process_count-th chunk.

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
    """Yield pair-index chunks (int64 [<=chunk_rows, 2]) from parquet files.

    Files hold (notice_key, company_key) columns (data/parquet_dataset.py).
    Keys are joined to store rows chunk-by-chunk; missing keys drop
    (reference guaranteed-ID-match semantics) or raise per ``on_missing``.
    Chunks are round-robined across hosts for multi-host data sharding.
    """
    import pyarrow.parquet as pq

    if isinstance(paths, (str, Path)):
        paths = [paths]
    n_map = notice_store.key_to_row
    c_map = company_store.key_to_row
    chunk_idx = 0
    for path in paths:
        pf = pq.ParquetFile(str(path))
        for batch in pf.iter_batches(batch_size=chunk_rows, columns=["notice_key", "company_key"]):
            take = chunk_idx % host_count == host_index
            chunk_idx += 1
            if not take:
                continue
            n_keys = batch.column(0).to_pylist()
            c_keys = batch.column(1).to_pylist()
            rows = np.empty((len(n_keys), 2), dtype=np.int64)
            kept = 0
            for nk, ck in zip(n_keys, c_keys):
                ni = n_map.get(nk)
                ci = c_map.get(ck)
                if ni is None or ci is None:
                    if on_missing == "error":
                        raise KeyError(f"pair references missing key ({nk!r}, {ck!r})")
                    continue
                rows[kept] = (ni, ci)
                kept += 1
            if kept:
                yield rows[:kept]


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
    nothing is dropped mid-stream.
    """
    q: queue.Queue = queue.Queue(maxsize=prefetch_chunks)

    def reader():
        try:
            for chunk in pair_chunks:
                q.put(chunk)
        finally:
            q.put(None)

    threading.Thread(target=reader, daemon=True).start()
    rng = np.random.default_rng(seed)
    carry = np.empty((0, 2), dtype=np.int64)
    while True:
        chunk = q.get()
        if chunk is None:
            break
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
