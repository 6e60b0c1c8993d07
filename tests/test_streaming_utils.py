"""Parquet pair streaming, multi-host helpers, profiling utilities."""

import json

import numpy as np
import pytest

from jodalrob_twotower_tpu.data.parquet_dataset import save_pairs_parquet
from jodalrob_twotower_tpu.data.parquet_stream import (
    stream_pair_chunks,
    streaming_index_batches,
)
from jodalrob_twotower_tpu.parallel.distributed import (
    host_shard_pairs,
    initialize,
    process_info,
)
from jodalrob_twotower_tpu.utils.profiling import (
    MetricsLogger,
    StepTimer,
    device_flops_estimate,
    utilization,
)


@pytest.fixture()
def pair_file(tiny_dataset, tmp_path):
    ds = tiny_dataset
    pairs = ds.pairs[:2500]
    save_pairs_parquet(
        tmp_path / "pairs.parquet",
        ds.notice_store.keys[pairs[:, 0]],
        ds.company_store.keys[pairs[:, 1]],
    )
    return tmp_path / "pairs.parquet", pairs


def test_stream_pair_chunks_joins_keys(tiny_dataset, pair_file):
    ds = tiny_dataset
    path, pairs = pair_file
    chunks = list(
        stream_pair_chunks(path, ds.notice_store, ds.company_store, chunk_rows=1000)
    )
    assert [len(c) for c in chunks] == [1000, 1000, 500]
    np.testing.assert_array_equal(np.concatenate(chunks), pairs)


def test_stream_host_sharding(tiny_dataset, pair_file):
    ds = tiny_dataset
    path, pairs = pair_file
    host_chunks = [
        list(
            stream_pair_chunks(
                path, ds.notice_store, ds.company_store,
                chunk_rows=500, host_index=i, host_count=2,
            )
        )
        for i in range(2)
    ]
    # LOCKSTEP invariant: every host sees the same number of chunks and the
    # same rows-per-chunk (strided slice of the identically-joined chunk,
    # trimmed to a multiple of host_count) — so every host yields the same
    # number of batches and SPMD collectives can't desync on epoch length.
    assert len(host_chunks[0]) == len(host_chunks[1])
    for c0, c1 in zip(host_chunks[0], host_chunks[1]):
        assert len(c0) == len(c1)
    total = sum(len(c) for chunks in host_chunks for c in chunks)
    n_chunks = len(host_chunks[0])
    # the trim drops at most (host_count - 1) rows per chunk
    assert len(pairs) - n_chunks <= total <= len(pairs)
    # per-chunk strided split: host 0 takes rows 0,2,4,... of the chunk
    np.testing.assert_array_equal(host_chunks[0][0], pairs[0:500][0::2][:250])
    np.testing.assert_array_equal(host_chunks[1][0], pairs[0:500][1::2][:250])


def test_streaming_index_batches_cover_all(tiny_dataset, pair_file):
    ds = tiny_dataset
    path, pairs = pair_file
    batches = list(
        streaming_index_batches(
            stream_pair_chunks(path, ds.notice_store, ds.company_store, chunk_rows=700),
            batch_size=128,
            seed=1,
            drop_remainder=False,
        )
    )
    assert batches[0].dtype == np.int32 and batches[0].shape == (128, 2)
    all_rows = np.concatenate(batches)
    assert len(all_rows) == len(pairs)  # carry between chunks loses nothing
    assert set(map(tuple, all_rows.astype(np.int64))) == set(map(tuple, pairs))


def test_streaming_drop_remainder(tiny_dataset, pair_file):
    ds = tiny_dataset
    path, pairs = pair_file
    batches = list(
        streaming_index_batches(
            stream_pair_chunks(path, ds.notice_store, ds.company_store, chunk_rows=700),
            batch_size=128,
        )
    )
    assert all(b.shape == (128, 2) for b in batches)
    assert len(batches) == len(pairs) // 128


def test_distributed_single_process_noops():
    initialize()  # no-op, must not raise
    idx, count = process_info()
    assert (idx, count) == (0, 1)
    pairs = np.arange(20).reshape(10, 2)
    np.testing.assert_array_equal(host_shard_pairs(pairs), pairs)


def test_step_timer_and_metrics_logger(tmp_path):
    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop(fetch=np.ones(3))
    s = t.summary(batch_size=128)
    assert s["steps"] == 3 and s["examples_per_sec"] > 0

    log = MetricsLogger(tmp_path / "m.jsonl")
    log.log(0, {"loss": np.float32(1.5)}, epoch=0)
    log.log(1, {"loss": 1.2}, epoch=0)
    log.close()
    rows = MetricsLogger.read(tmp_path / "m.jsonl")
    assert len(rows) == 2 and rows[0]["loss"] == 1.5 and rows[1]["step"] == 1


def test_device_flops_and_utilization():
    peak = device_flops_estimate(dtype="float32", n=256)
    assert peak > 1e9  # even CPU does > 1 GFLOP/s
    u = utilization(step_time_s=1.0, flops_per_step=peak / 2, dtype="float32", n=256)
    assert u == pytest.approx(0.5, rel=1e-6)


def test_index_stacks_windows_match_epoch_batches():
    """index_stacks yields device [n_inner, B, 2] int32 windows that are
    exactly epoch_batches(seed) grouped n_inner at a time, trailing partial
    window dropped."""
    from jodalrob_twotower_tpu.data.pipeline import epoch_batches, index_stacks

    rng = np.random.default_rng(0)
    pairs = rng.integers(0, 1000, size=(1000, 2)).astype(np.int64)
    b, n_inner = 64, 4
    windows = list(index_stacks(pairs, b, n_inner, seed=3, prefetch=2))
    flat = [w for win in windows for w in np.asarray(win)]
    want = list(epoch_batches(pairs, b, shuffle=True, seed=3))
    # 1000 // 64 = 15 batches -> 3 full windows of 4; 3 batches dropped
    assert len(windows) == 3 and len(flat) == 12
    for win in windows:
        assert win.shape == (n_inner, b, 2) and np.asarray(win).dtype == np.int32
    for got, exp in zip(flat, want):
        np.testing.assert_array_equal(got, exp.astype(np.int32))
