"""Native gather library + TFRecord IO."""

import numpy as np
import pytest

from jodalrob_twotower_tpu import native
from jodalrob_twotower_tpu.io.tfrecord import (
    TFRecordReader,
    TFRecordWriter,
    decode_example,
    encode_example,
    inspect_tfrecord,
    table_to_tfrecord,
)


def test_native_lib_builds():
    assert native.lib() is not None, "g++ toolchain present but native build failed"


def test_gather_rows_matches_numpy(rng):
    src = rng.normal(size=(1000, 37)).astype(np.float32)
    rows = rng.integers(0, 1000, size=513)
    np.testing.assert_array_equal(native.gather_rows(src, rows), src[rows])
    # int32 matrix path
    src_i = rng.integers(0, 100, size=(500, 8)).astype(np.int32)
    np.testing.assert_array_equal(native.gather_rows(src_i, rows % 500), src_i[rows % 500])
    # empty batch
    assert native.gather_rows(src, np.empty(0, np.int64)).shape == (0, 37)


def test_gather_pair_batch_matches_numpy(rng):
    nd = rng.normal(size=(300, 16)).astype(np.float32)
    nc = rng.integers(0, 9, size=(300, 4)).astype(np.int32)
    cd = rng.normal(size=(200, 8)).astype(np.float32)
    cc = rng.integers(0, 9, size=(200, 2)).astype(np.int32)
    nr = rng.integers(0, 300, size=128)
    cr = rng.integers(0, 200, size=128)
    o = native.gather_pair_batch(nd, nc, cd, cc, nr, cr)
    np.testing.assert_array_equal(o[0], nd[nr])
    np.testing.assert_array_equal(o[1], nc[nr])
    np.testing.assert_array_equal(o[2], cd[cr])
    np.testing.assert_array_equal(o[3], cc[cr])


def test_gather_pair_batch_noncontiguous_views(rng):
    """Sliced (non-contiguous) sources must gather correctly: the native
    call takes strides from the contiguous copies, not the original views."""
    nd = rng.normal(size=(300, 16)).astype(np.float32)
    nc = rng.integers(0, 9, size=(300, 4)).astype(np.int32)
    cd = rng.normal(size=(200, 8)).astype(np.float32)
    cc = rng.integers(0, 9, size=(200, 2)).astype(np.int32)
    nr = rng.integers(0, 300, size=64)
    cr = rng.integers(0, 200, size=64)
    o = native.gather_pair_batch(nd[:, :5], nc[:, :2], cd[:, :3], cc[:, :1], nr, cr)
    np.testing.assert_array_equal(o[0], nd[nr][:, :5])
    np.testing.assert_array_equal(o[1], nc[nr][:, :2])
    np.testing.assert_array_equal(o[2], cd[cr][:, :3])
    np.testing.assert_array_equal(o[3], cc[cr][:, :1])


def test_gather_out_of_bounds_raises(rng):
    """Bad row indices raise IndexError on native AND fallback paths (the
    C++ kernel would otherwise memcpy from arbitrary memory)."""
    src = rng.normal(size=(50, 4)).astype(np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([0, 50], np.int64))
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([-51], np.int64))
    cat = rng.integers(0, 5, size=(50, 2)).astype(np.int32)
    with pytest.raises(IndexError):
        native.gather_pair_batch(
            src, cat, src, cat, np.array([49], np.int64), np.array([50], np.int64)
        )


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C
    assert native.crc32c(b"") == 0
    assert native.crc32c(b"123456789") == 0xE3069283
    assert native.crc32c(bytes(32)) == 0x8A9136AA
    # native and python fallback agree
    data = bytes(range(256)) * 3 + b"tail"
    assert native.crc32c(data) == native._crc32c_py(data)
    # streaming (crc chaining) equals one-shot
    if native.lib() is not None:
        part = native.crc32c(b"12345")
        assert native.crc32c(b"6789", part) == 0xE3069283


def test_example_roundtrip():
    ex = {
        "name": b"notice-42",
        "price": [1.5, -2.25, 0.0],
        "region": [3, -7, 1 << 40],
        "title": "hello world",
    }
    data = encode_example(ex)
    out = decode_example(data)
    assert out["name"] == [b"notice-42"]
    np.testing.assert_allclose(out["price"], ex["price"])
    assert out["region"] == ex["region"]
    assert out["title"] == [b"hello world"]


def test_example_numpy_scalars_roundtrip():
    """numpy scalars are not python float/int subclasses — without explicit
    handling np.float32(1.75) fell into the int64 branch and decoded as 1
    (silent truncation of every exported scalar float feature)."""
    ex = {
        "f32": np.float32(1.75),
        "f64": np.float64(-2.5),
        "i32": np.int32(-7),
        "i64": np.int64(1 << 40),
        "f_list": [np.float32(0.5), np.float32(2.25)],
    }
    out = decode_example(encode_example(ex))
    np.testing.assert_allclose(out["f32"], [1.75])
    np.testing.assert_allclose(out["f64"], [-2.5])
    assert out["i32"] == [-7]
    assert out["i64"] == [1 << 40]
    np.testing.assert_allclose(out["f_list"], [0.5, 2.25])


@pytest.mark.parametrize("compress", [False, True])
def test_tfrecord_roundtrip(tmp_path, compress, rng):
    path = tmp_path / ("x.tfrecord" + (".gz" if compress else ""))
    cols = {
        "id": np.array([f"k{i}" for i in range(10)]),
        "vec": rng.normal(size=(10, 5)).astype(np.float32),
        "cat": rng.integers(0, 9, size=10).astype(np.int64),
    }
    n = table_to_tfrecord(path, cols, compress=compress)
    assert n == 10
    back = list(TFRecordReader(path).examples())
    assert len(back) == 10
    assert back[3]["id"] == [b"k3"]
    np.testing.assert_allclose(back[3]["vec"], cols["vec"][3], rtol=1e-6)
    assert back[3]["cat"] == [int(cols["cat"][3])]
    info = inspect_tfrecord(path, limit=2)
    assert info["count"] == 10 and len(info["preview"]) == 2


def test_count_and_search_records(tmp_path, rng):
    from jodalrob_twotower_tpu.io.tfrecord import count_records, search_records

    for fname, n in (("a.tfrecord", 7), ("b.tfrecord", 4)):
        cols = {
            "id": np.array([f"k{i}" for i in range(n)]),
            "val": np.arange(n).astype(np.int64),
        }
        table_to_tfrecord(tmp_path / fname, cols, compress=False)
    assert count_records(tmp_path / "a.tfrecord") == 7
    assert count_records(str(tmp_path / "*.tfrecord")) == 11
    assert count_records([tmp_path / "a.tfrecord", tmp_path / "b.tfrecord"]) == 11
    # search by scalar (wrapped to the single-element feature list)
    hits = search_records(tmp_path / "a.tfrecord", "val", 3)
    assert len(hits) == 1 and hits[0]["id"] == [b"k3"]
    hits = search_records(tmp_path / "a.tfrecord", "id", b"k5")
    assert len(hits) == 1 and hits[0]["val"] == [5]
    assert search_records(tmp_path / "a.tfrecord", "val", 99) == []
    many = search_records(tmp_path / "a.tfrecord", "missing", 0, max_results=2)
    assert many == []


def test_tfrecord_corruption_detected(tmp_path):
    path = tmp_path / "x.tfrecord"
    with TFRecordWriter(path) as w:
        w.write(b"hello records")
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(IOError, match="corrupt"):
        list(TFRecordReader(path))


def test_tfrecord_tensorflow_compat(tmp_path):
    """If TF is importable, our records must parse with tf.train.Example."""
    tf = pytest.importorskip("tensorflow")
    path = tmp_path / "compat.tfrecord"
    with TFRecordWriter(path) as w:
        w.write_example({"a": [1.0, 2.0], "b": [3], "c": b"bytes"})
    recs = list(tf.data.TFRecordDataset(str(path)).as_numpy_iterator())
    assert len(recs) == 1
    ex = tf.train.Example()
    ex.ParseFromString(recs[0])
    assert list(ex.features.feature["a"].float_list.value) == [1.0, 2.0]
    assert list(ex.features.feature["b"].int64_list.value) == [3]
    assert ex.features.feature["c"].bytes_list.value[0] == b"bytes"
