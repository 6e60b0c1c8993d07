"""Batch pipeline: pair indices -> device-resident PairBatch stream.

The reference's documented bottleneck was host-side batch assembly
(README.md:31-57: 23 it/s at 40% GPU util with a python collate building
per-batch KJTs). Here assembly is two contiguous row-gathers per side from
the column-major FeatureStore, and batches are double-buffered onto the
device with `jax.device_put` ahead of compute, so the TPU never waits on the
host (the tf.data/grain role from SURVEY.md §7, without the dependency).

The four load modes of the reference's UnifiedBidDataset
(unified_bid_data_loader.py:80-105 — streaming × load_all_features) collapse
into one design: stores are resident column matrices (mode 1/3 capability);
`epoch_batches` streams shuffled index batches over them; chunked parquet
streaming for > host-memory datasets is layered on top by the caller
(data/parquet_stream.py).
"""

from __future__ import annotations

import collections
import threading
import queue
from typing import Iterable, Iterator, Sequence

import jax
import numpy as np

from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch


def assemble_pair_batch(
    notice_store: FeatureStore,
    company_store: FeatureStore,
    pairs: np.ndarray,
) -> PairBatch:
    """Gather one aligned batch. pairs: int64 [B, 2] rows into the stores.

    One native thread-pool pass assembles all four matrices (numpy fallback
    inside when the toolchain is absent)."""
    from jodalrob_twotower_tpu import native

    n_dense, n_cat, c_dense, c_cat = native.gather_pair_batch(
        notice_store.dense, notice_store.cat_ids,
        company_store.dense, company_store.cat_ids,
        pairs[:, 0], pairs[:, 1],
    )
    return PairBatch(
        notice=TowerBatch(dense=n_dense, cat_ids=n_cat),
        company=TowerBatch(dense=c_dense, cat_ids=c_cat),
    )


def epoch_batches(
    pairs: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
) -> Iterator[np.ndarray]:
    """Yield [B, 2] index batches for one epoch."""
    n = pairs.shape[0]
    order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    end = n - (n % batch_size) if drop_remainder else n
    for start in range(0, end, batch_size):
        yield pairs[order[start : start + batch_size]]


def _device_put(batch: PairBatch, sharding=None) -> PairBatch:
    if sharding is None:
        return jax.tree.map(jax.device_put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def prefetch_to_device(
    host_batches: Iterable[PairBatch],
    *,
    size: int = 2,
    sharding=None,
) -> Iterator[PairBatch]:
    """Keep `size` batches in flight on the device ahead of the consumer.

    `jax.device_put` is async, so simply issuing the transfer early overlaps
    H2D DMA with the previous step's compute (the role of the reference's
    CUDA-stream `_to_device_async`, scripts/train.py:258-273).
    """
    buf: collections.deque[PairBatch] = collections.deque()
    it = iter(host_batches)
    try:
        for _ in range(size):
            buf.append(_device_put(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_device_put(next(it), sharding))
        except StopIteration:
            pass
        yield out


class BackgroundAssembler:
    """Assemble host batches on a worker thread while the device computes.

    Two-stage design the reference attempted and abandoned
    (async_batch_preprocessor.py, "fake pipeline" per its README): here the
    worker only does the two numpy row-gathers (GIL-released memcpy inside
    numpy) and the consumer thread does the async device_put, so there is
    real overlap without fighting the GIL.
    """

    def __init__(
        self,
        notice_store: FeatureStore,
        company_store: FeatureStore,
        index_batches: Iterable[np.ndarray],
        *,
        depth: int = 4,
    ) -> None:
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stores = (notice_store, company_store)
        self._thread = threading.Thread(
            target=self._run, args=(index_batches,), daemon=True
        )
        self._thread.start()

    _DONE, _ERROR = object(), object()

    def _run(self, index_batches: Iterable[np.ndarray]) -> None:
        try:
            for idx in index_batches:
                self._q.put(assemble_pair_batch(self._stores[0], self._stores[1], idx))
        except BaseException as e:  # noqa: BLE001 - re-raised on the consumer
            # swallowing would launder a data-pipeline bug into a silently
            # shorter "successful" epoch
            self._q.put((self._ERROR, e))
            return
        self._q.put(self._DONE)

    def __iter__(self) -> Iterator[PairBatch]:
        while True:
            item = self._q.get()
            if item is self._DONE:
                return
            if isinstance(item, tuple) and item and item[0] is self._ERROR:
                raise item[1]
            yield item


def index_batches(
    pairs: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    prefetch: int = 2,
) -> Iterator[jax.Array]:
    """Device-resident stream of [B, 2] int32 index batches.

    Companion to the indexed train step (train_step.make_indexed_train_step):
    when the feature stores live in HBM, this is the ONLY per-step host→device
    traffic (64 KB at B=8192 vs tens of MB of features).
    """
    host = (
        np.ascontiguousarray(b, dtype=np.int32)
        for b in epoch_batches(
            pairs, batch_size, shuffle=shuffle, seed=seed, drop_remainder=drop_remainder
        )
    )
    buf: collections.deque = collections.deque()
    for b in host:
        buf.append(jax.device_put(b))
        if len(buf) > prefetch:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def index_stacks(
    pairs: np.ndarray,
    batch_size: int,
    n_inner: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    prefetch: int = 2,
) -> Iterator[jax.Array]:
    """Device-resident [n_inner, B, 2] int32 windows for scanned multi-step
    dispatch (train_step.make_scanned_train_steps).

    Each window is assembled CONTIGUOUSLY on host and shipped in ONE async
    `jax.device_put` — versus stacking n_inner individually-transferred
    [B, 2] arrays on device, which pays the tunnel's ~1 ms dispatch latency
    n_inner+1 times per window. Keeping `prefetch` windows in flight
    overlaps window k+1's H2D DMA with the device's execution of window k.
    Trailing batches that don't fill a window are dropped (same epoch
    semantics as drop_remainder)."""
    def host_windows() -> Iterator[np.ndarray]:
        buf: list[np.ndarray] = []
        for idx in epoch_batches(pairs, batch_size, shuffle=shuffle, seed=seed):
            buf.append(idx)
            if len(buf) == n_inner:
                yield np.stack(buf).astype(np.int32, copy=False)
                buf.clear()

    dq: collections.deque = collections.deque()
    for w in host_windows():
        dq.append(jax.device_put(w))
        if len(dq) > prefetch:
            yield dq.popleft()
    while dq:
        yield dq.popleft()


def train_batches(
    notice_store: FeatureStore,
    company_store: FeatureStore,
    pairs: np.ndarray,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    prefetch: int = 2,
    background: bool = True,
    sharding=None,
) -> Iterator[PairBatch]:
    """Full pipeline: shuffle -> gather (worker thread) -> device prefetch."""
    idx = epoch_batches(
        pairs, batch_size, shuffle=shuffle, seed=seed, drop_remainder=drop_remainder
    )
    if background:
        host = BackgroundAssembler(notice_store, company_store, idx)
    else:
        host = (assemble_pair_batch(notice_store, company_store, b) for b in idx)
    if prefetch <= 0:
        yield from (_device_put(b, sharding) for b in host)
    else:
        yield from prefetch_to_device(host, size=prefetch, sharding=sharding)
