"""ETL: numeric / categorical / text preprocessing + parquet pipeline."""

import json

import numpy as np
import pytest

from jodalrob_twotower_tpu.etl.categorical import (
    NULL_ID,
    RARE_ID,
    UNKNOWN_ID,
    CategoricalColumnConfig,
    CategoricalPreprocessor,
)
from jodalrob_twotower_tpu.etl.numeric import NumericColumnConfig, NumericPreprocessor
from jodalrob_twotower_tpu.etl.pipeline import load_preprocessed, run_pipeline
from jodalrob_twotower_tpu.etl.text import HashTextEmbedder, TextColumnConfig, TextPreprocessor


# -- numeric ----------------------------------------------------------------


def test_numeric_zscore_and_null_flags():
    x = np.array([1.0, 2.0, 3.0, np.nan, 5.0])
    pre = NumericPreprocessor({"a": {"fill": "median", "scale": "zscore"}})
    out = pre.fit_transform({"a": x})
    assert out["a"].dtype == np.float32
    np.testing.assert_array_equal(out["a_is_null"], [0, 0, 0, 1, 0])
    # zscore stats computed on the valid values (1,2,3,5)
    st = pre.stats["a"]
    assert st.center == pytest.approx(np.mean([1, 2, 3, 5]))
    assert st.spread == pytest.approx(np.std([1, 2, 3, 5]))
    np.testing.assert_allclose(out["a"][0], (1.0 - st.center) / st.spread, rtol=1e-6)
    # transform is frozen: new data uses fit-time stats
    out2 = pre.transform({"a": np.array([np.nan])})
    filled = 2.5
    st = pre.stats["a"]
    np.testing.assert_allclose(out2["a"][0], (filled - st.center) / st.spread, rtol=1e-6)


def test_numeric_clip_modes():
    x = np.array([0.0, 1.0, 2.0, 100.0])
    pre = NumericPreprocessor(
        {"a": {"clip_values": (0.0, 2.0), "scale": "none", "null_flag": False}}
    ).fit({"a": x})
    np.testing.assert_allclose(pre.transform({"a": x})["a"], [0, 1, 2, 2])
    # clip_to_null: out-of-bounds become null -> filled + flagged
    pre2 = NumericPreprocessor(
        {"a": {"clip_values": (0.0, 2.0), "clip_to_null": True, "fill": "constant",
               "fill_constant": -1.0, "scale": "none"}}
    ).fit({"a": x})
    out = pre2.transform({"a": x})
    np.testing.assert_allclose(out["a"], [0, 1, 2, -1])
    np.testing.assert_array_equal(out["a_is_null"], [0, 0, 0, 1])


def test_numeric_log1p_and_minmax():
    x = np.array([-5.0, 0.0, 10.0, 1000.0])
    pre = NumericPreprocessor({"a": {"log1p": True, "scale": "minmax", "null_flag": False}})
    out = pre.fit_transform({"a": x})["a"]
    assert out.min() == pytest.approx(0.0) and out.max() == pytest.approx(1.0)
    assert np.all(np.isfinite(out))  # offset made log1p argument >= 0


def test_numeric_json_roundtrip(tmp_path):
    x = np.array([1.0, np.nan, 3.0, 4.0, 100.0])
    pre = NumericPreprocessor({"a": {"clip_percentiles": (0, 95), "log1p": True}})
    pre.fit({"a": x})
    pre.save(tmp_path / "num.json")
    loaded = NumericPreprocessor.load(tmp_path / "num.json")
    np.testing.assert_allclose(
        loaded.transform({"a": x})["a"], pre.transform({"a": x})["a"]
    )


def test_numeric_errors():
    pre = NumericPreprocessor()
    with pytest.raises(RuntimeError):
        pre.transform({"a": np.ones(3)})
    pre.fit({"a": np.ones(3)})
    with pytest.raises(KeyError):
        pre.transform({"b": np.ones(3)})


# -- categorical -------------------------------------------------------------


def test_categorical_special_tokens_and_rare():
    vals = np.array(["a", "a", "a", "b", "b", "c", None, ""], dtype=object)
    pre = CategoricalPreprocessor({"col": {"rare_threshold": 2}})
    out = pre.fit_transform({"col": vals})
    ids = out["col"]
    vocab = pre.vocabs["col"]
    assert vocab["[NULL]"] == NULL_ID and vocab["[RARE]"] == RARE_ID
    assert "c" not in vocab  # collapsed (count 1 < threshold 2)
    assert ids[0] == vocab["a"] and ids[3] == vocab["b"]
    assert ids[5] == RARE_ID  # seen-but-rare -> [RARE] (reference semantics)
    assert ids[6] == NULL_ID and ids[7] == NULL_ID
    np.testing.assert_array_equal(out["col_is_null"][-2:], [1.0, 1.0])
    # unseen at transform -> UNKNOWN (distinct from fit-time-rare -> RARE)
    assert pre.transform({"col": np.array(["zzz"], object)})["col"][0] == UNKNOWN_ID
    # the rare set survives a JSON roundtrip
    loaded = CategoricalPreprocessor.from_dict(pre.to_dict())
    assert loaded.transform({"col": np.array(["c"], object)})["col"][0] == RARE_ID


def test_categorical_input_dims_and_roundtrip(tmp_path):
    vals = np.array(["x", "y", "z", "x"], dtype=object)
    pre = CategoricalPreprocessor()
    pre.fit({"c1": vals, "c2": vals[:2]})
    dims = pre.input_dims()
    assert dims["c1"] == 3 + 3  # 3 specials + x,y,z
    spec = pre.model_spec()
    assert spec["columns"][0]["input_dim"] == dims["c1"]
    pre.save(tmp_path / "cat.json")
    loaded = CategoricalPreprocessor.load(tmp_path / "cat.json")
    np.testing.assert_array_equal(
        loaded.transform({"c1": vals, "c2": vals[:4]})["c1"],
        pre.transform({"c1": vals, "c2": vals[:4]})["c1"],
    )


def test_categorical_max_vocab_frequency_order():
    vals = np.array(["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"], dtype=object)
    pre = CategoricalPreprocessor({"col": {"max_vocab": 2}})
    pre.fit({"col": vals})
    vocab = pre.vocabs["col"]
    assert "a" in vocab and "b" in vocab and "c" not in vocab and "d" not in vocab


# -- text --------------------------------------------------------------------


def test_hash_embedder_deterministic_and_normalized():
    emb = HashTextEmbedder(64)
    cfg = TextColumnConfig(normalize=True)
    v1 = emb.encode(["hello world", "hello world", "different"], cfg)
    assert v1.shape == (3, 64)
    np.testing.assert_allclose(v1[0], v1[1])
    assert not np.allclose(v1[0], v1[2])
    np.testing.assert_allclose(np.linalg.norm(v1, axis=1), 1.0, rtol=1e-5)
    # shared tokens -> higher similarity than disjoint
    v2 = emb.encode(["alpha beta", "alpha gamma", "delta epsilon"], cfg)
    assert (v2[0] @ v2[1]) > (v2[0] @ v2[2])


def test_text_preprocessor_columns():
    pre = TextPreprocessor(
        {"title": {"max_length": 8, "lowercase": True}}, embedder=HashTextEmbedder(32)
    )
    out = pre.transform({"title": np.array(["Hello", None, "WORLD"], object)})
    assert out["title"].shape == (3, 32)
    # lowercase: "Hello" == "hello"
    out2 = pre.transform({"title": np.array(["hello"], object)})
    np.testing.assert_allclose(out["title"][0], out2["title"][0])


# -- pipeline ----------------------------------------------------------------


def test_pipeline_end_to_end(tmp_path, rng):
    n = 100
    def make_chunk(seed, rows):
        r = np.random.default_rng(seed)
        return {
            "id": np.array([f"k{seed}_{i}" for i in range(rows)], object),
            "price": r.normal(100, 20, rows),
            "region": r.choice(["seoul", "busan", "daegu"], rows).astype(object),
            "title": np.array([f"notice {seed} {i}" for i in range(rows)], object),
        }

    chunks = [make_chunk(0, n), make_chunk(1, n)]
    chunks[0]["price"][3] = np.nan
    manifest = run_pipeline(
        "notice",
        chunks,
        tmp_path,
        pk_columns=["id"],
        numeric_columns=["price"],
        categorical_columns=["region"],
        text_columns=["title"],
        text_embedder=HashTextEmbedder(16),
    )
    assert manifest["rows"] == 2 * n
    assert manifest["categorical_input_dims"]["region"] == 3 + 3
    assert manifest["text_embed_dim"] == 16
    assert (tmp_path / "notice_numeric.json").exists()
    spec = json.loads((tmp_path / "notice_categorical.json").read_text())
    assert spec["model_spec"]["columns"][0]["name"] == "region"

    data = load_preprocessed(tmp_path, "notice")
    assert data["price"].shape == (2 * n,)
    assert data["title"].shape == (2 * n, 16)
    assert data["region"].dtype == np.int32
    assert data["price_is_null"].sum() == 1.0
    assert set(np.unique(data["region"])) <= {3, 4, 5}


def test_update_text_embeddings(tmp_path):
    from jodalrob_twotower_tpu.etl.pipeline import update_text_embeddings
    from jodalrob_twotower_tpu.etl.text import HashTextEmbedder

    n = 50
    chunk = {
        "id": np.array([f"k{i}" for i in range(n)], object),
        "price": np.arange(n, dtype=float),
        "region": np.array(["a"] * n, object),
        "title": np.array([f"old text {i}" for i in range(n)], object),
    }
    emb = HashTextEmbedder(16)
    run_pipeline(
        "notice", [chunk], tmp_path,
        pk_columns=["id"], numeric_columns=["price"],
        categorical_columns=["region"], text_columns=["title"],
        text_embedder=emb,
    )
    before = load_preprocessed(tmp_path, "notice")["title"].copy()
    updated = update_text_embeddings(
        tmp_path, "notice", "title",
        {"k3": "completely new words", "k7": "other new words"},
        embedder=emb,
    )
    assert updated == 2
    after = load_preprocessed(tmp_path, "notice")["title"]
    assert not np.allclose(after[3], before[3])
    assert not np.allclose(after[7], before[7])
    untouched = [i for i in range(n) if i not in (3, 7)]
    np.testing.assert_allclose(after[untouched], before[untouched])
    with pytest.raises(KeyError, match="not a text column"):
        update_text_embeddings(tmp_path, "notice", "price", {}, embedder=emb)
