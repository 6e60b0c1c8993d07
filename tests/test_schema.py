"""Schema construction, metadata.csv classification, (de)serialization."""

import json

import pytest

from jodalrob_twotower_tpu.schema import (
    CategoricalSpec,
    NumericSpec,
    SideSchema,
    TextSpec,
    TwoTowerSchema,
    classify_columns,
    reference_shaped_schema,
    schema_from_metadata_csv,
    tiny_synthetic_schema,
    vocab_rows,
)

# Reference-format metadata (Korean headers, data/column_classifier.py:12-19).
_METADATA_KO = """\
테이블명,컬럼명,타입,사용 여부,PK,범주형 여부,범주 갯수
notice,bidntceno,character varying(40),Y,Y,,
notice,bidntceord,character varying(3),Y,Y,,
notice,presmptprce,numeric,Y,,,
notice,asignbdgtamt,bigint,Y,,,
notice,bidmethdnm,character varying(100),Y,,Y,7
notice,bidntcenm,text,Y,,,
notice,unused_col,text,N,,,
notice,ignored_date,timestamp,Y,,,
company,bizno,character varying(10),Y,Y,,
company,empl_cnt,integer,Y,,,
company,region_cd,character(2),Y,,Y,17
company,nocount_cat,varchar(5),Y,,Y,
"""


@pytest.fixture()
def metadata_csv(tmp_path):
    p = tmp_path / "metadata.csv"
    p.write_text(_METADATA_KO, encoding="utf-8")
    return p


def test_classify_columns_reference_semantics(metadata_csv):
    cls = classify_columns("notice", metadata_csv)
    assert cls["pk"] == ["bidntceno", "bidntceord"]
    assert cls["numeric"] == ["presmptprce", "asignbdgtamt"]
    assert cls["categorical"] == [("bidmethdnm", 7)]
    assert cls["text"] == ["bidntcenm"]
    # unused and non-text/non-numeric SQL types are skipped
    for bucket in cls.values():
        assert "unused_col" not in bucket
        assert "ignored_date" not in bucket


def test_vocab_margin_and_fallback(metadata_csv):
    cls = classify_columns("company", metadata_csv)
    counts = dict(cls["categorical"])
    assert vocab_rows(counts["region_cd"]) == 17 + 10  # margin (cat_embed.py:76)
    assert vocab_rows(counts["nocount_cat"]) == 1000  # fallback


def test_schema_from_metadata_csv(metadata_csv):
    schema = schema_from_metadata_csv(metadata_csv)
    assert schema.notice.pk == ("bidntceno", "bidntceord")
    assert schema.notice.num_numeric == 2
    assert schema.notice.text_names == ("bidntcenm",)
    assert schema.notice.dense_dim == 2 + 768
    assert schema.company.pk == ("bizno",)
    assert schema.company.vocab_sizes == (27, 1000)
    # restricting text columns drops the embedding
    schema2 = schema_from_metadata_csv(metadata_csv, notice_text_columns=())
    assert schema2.notice.text == ()


def test_schema_json_roundtrip(tmp_path):
    schema = reference_shaped_schema()
    p = tmp_path / "schema.json"
    schema.to_json(p)
    loaded = TwoTowerSchema.from_json(p)
    assert loaded == schema
    json.loads(p.read_text())  # valid json


def test_tiny_synthetic_schema_dims():
    s = tiny_synthetic_schema()
    assert s.notice.num_numeric == 16
    assert s.notice.num_categorical == 8
    assert s.notice.vocab_sizes == (1000,) * 8
    assert s.notice.dense_dim == 16


def test_side_schema_validation():
    with pytest.raises(ValueError, match="duplicate"):
        SideSchema(table="t", pk=("id",), numeric=(NumericSpec("a"),), text=(TextSpec("a"),))
    with pytest.raises(ValueError, match="PK"):
        SideSchema(table="t", pk=())
    with pytest.raises(ValueError, match="positive"):
        CategoricalSpec("c", 0)


def test_reference_shaped_schema_matches_survey():
    """SURVEY.md §2.2: notice = 29 num + 32 cat + 1 text(768); company = 1 + 6."""
    s = reference_shaped_schema()
    assert (s.notice.num_numeric, s.notice.num_categorical, len(s.notice.text)) == (29, 32, 1)
    assert (s.company.num_numeric, s.company.num_categorical, len(s.company.text)) == (1, 6, 0)
    assert s.notice.dense_dim == 29 + 768
