"""Chunked parquet conversion (reference convert_to_parquet.py parity):
multi-file output + manifest, re-batching, loader round-trip, parallel
multi-table conversion — all hermetic (synthetic chunk iterators)."""

import numpy as np
import pytest

from jodalrob_twotower_tpu.etl.parquet_chunks import (
    convert_tables_parallel,
    iter_parquet_chunks,
    load_parquet_chunks,
    read_manifest,
    write_parquet_chunks,
)


def _chunks(n_chunks=3, rows=10, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n_chunks):
        yield {
            "pk": np.arange(i * rows, (i + 1) * rows, dtype=np.int64),
            "x": rng.normal(size=rows).astype(np.float32),
            "name": np.asarray([f"row{i}_{j}" for j in range(rows)], dtype=object),
            "emb": rng.normal(size=(rows, 4)).astype(np.float32),
        }


def test_roundtrip_one_file_per_chunk(tmp_path):
    manifest = write_parquet_chunks(_chunks(), tmp_path / "t", table_name="t")
    assert manifest["n_rows"] == 30
    assert manifest["n_files"] == 3  # rows_per_file=None -> file per chunk
    assert manifest["columns"] == ["pk", "x", "name", "emb"]
    assert read_manifest(tmp_path / "t") == manifest

    data = load_parquet_chunks(tmp_path / "t")
    np.testing.assert_array_equal(data["pk"], np.arange(30))
    assert data["emb"].shape == (30, 4)  # fixed-size list -> 2-D round-trip
    assert data["name"][0] == "row0_0" and data["name"][-1] == "row2_9"
    ref = {k: np.concatenate([c[k] for c in _chunks()], axis=0) for k in data}
    np.testing.assert_allclose(data["x"], ref["x"])
    np.testing.assert_allclose(data["emb"], ref["emb"])


def test_rebatching_rows_per_file(tmp_path):
    # 30 rows re-batched into files of 12 -> 12, 12, 6
    manifest = write_parquet_chunks(
        _chunks(), tmp_path / "t", table_name="t", rows_per_file=12
    )
    assert [f["rows"] for f in manifest["files"]] == [12, 12, 6]
    assert [f["file"] for f in manifest["files"]] == [
        "chunk_0000.parquet", "chunk_0001.parquet", "chunk_0002.parquet",
    ]
    # streamed chunks follow the FILE layout, and the loader reassembles
    sizes = [len(c["pk"]) for c in iter_parquet_chunks(tmp_path / "t")]
    assert sizes == [12, 12, 6]
    np.testing.assert_array_equal(load_parquet_chunks(tmp_path / "t")["pk"], np.arange(30))


def test_column_projection(tmp_path):
    write_parquet_chunks(_chunks(), tmp_path / "t", table_name="t")
    data = load_parquet_chunks(tmp_path / "t", columns=["pk", "emb"])
    assert set(data.keys()) == {"pk", "emb"}


def test_parallel_multi_table(tmp_path):
    manifests = convert_tables_parallel(
        {
            "notice": lambda: _chunks(2, 8, seed=1),
            "company": lambda: _chunks(4, 5, seed=2),
        },
        tmp_path,
        rows_per_file=10,
        max_workers=2,
    )
    assert manifests["notice"]["n_rows"] == 16
    assert manifests["company"]["n_rows"] == 20
    for table in ("notice", "company"):
        loaded = load_parquet_chunks(tmp_path / table)
        assert len(loaded["pk"]) == manifests[table]["n_rows"]
        assert read_manifest(tmp_path / table)["table"] == table


def test_empty_stream(tmp_path):
    manifest = write_parquet_chunks(iter(()), tmp_path / "t", table_name="t")
    assert manifest["n_rows"] == 0 and manifest["n_files"] == 0
    assert load_parquet_chunks(tmp_path / "t") == {}


def test_schema_drift_is_unified(tmp_path):
    """Per-chunk arrow inference can drift (ints then floats, or an all-NULL
    chunk inferring 'null'); chunks sharing a file must be cast back to the
    first chunk's schema instead of crashing mid-export."""
    def chunks():
        yield {"pk": np.arange(4, dtype=np.int64),
               "x": np.asarray([1.0, 2.0, None, 4.0], dtype=object)}
        yield {"pk": np.arange(4, 8, dtype=np.int64),
               "x": np.asarray([None, None, None, None], dtype=object)}  # 'null' type
        yield {"pk": np.arange(8, 12, dtype=np.int64),
               "x": np.asarray([1, 2, 3, 4], dtype=object)}  # int64 -> cast

    manifest = write_parquet_chunks(chunks(), tmp_path / "t", table_name="t",
                                    rows_per_file=100)
    assert manifest["n_rows"] == 12 and manifest["n_files"] == 1
    data = load_parquet_chunks(tmp_path / "t")
    assert data["x"][1] == 2.0 and np.isnan(data["x"][4]) and data["x"][8] == 1.0


def test_incompatible_schema_drift_raises(tmp_path):
    def chunks():
        yield {"x": np.asarray([1.0, 2.0], dtype=np.float32)}
        yield {"x": np.asarray([["a", "b"], ["c", "d"]], dtype=object)}  # list<str>

    with pytest.raises(ValueError, match="schema drifted"):
        write_parquet_chunks(chunks(), tmp_path / "t", table_name="t",
                             rows_per_file=100)


def test_rows_per_file_must_be_positive(tmp_path):
    with pytest.raises(ValueError, match="rows_per_file"):
        write_parquet_chunks(_chunks(), tmp_path / "t", table_name="t",
                             rows_per_file=0)
