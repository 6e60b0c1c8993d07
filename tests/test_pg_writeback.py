"""Executed PG write-back against a fake psycopg3-style connection.

VERDICT r1's one 'partial' capability row: round 1 built the write-back SQL
(etl/sql.py) but never executed it. etl/pg_writeback.py executes it; these
tests drive the full create + COPY + vector UPDATE flow through a recording
fake connection and assert the statement sequence, the COPY payloads
(CSV framing, \\N nulls, pgvector '[...]' literals) and the transaction
boundary — reference behavior: preprocess/upload_database.py:64-266 and
data/database_connector.py:85-131.
"""

import numpy as np
import pytest

from jodalrob_twotower_tpu.etl.pg_writeback import (
    PreprocessedUploader,
    build_create_preprocessed,
    collapse_embedding_columns,
    execute_vector_update,
    infer_pg_type,
    vector_literal,
)


class FakeCopy:
    def __init__(self, sink):
        self.sink = sink

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def write(self, data):
        self.sink.append(data)


class FakeCursor:
    def __init__(self, log):
        self.log = log

    def execute(self, sql, params=None):
        self.log.append(("execute", sql))

    def copy(self, sql):
        payload = []
        self.log.append(("copy", sql, payload))
        return FakeCopy(payload)


class FakeConn:
    def __init__(self):
        self.log = []
        self.commits = 0

    def cursor(self):
        return FakeCursor(self.log)

    def commit(self):
        self.commits += 1
        self.log.append(("commit",))


def test_infer_pg_type():
    assert infer_pg_type(np.asarray([1, 2, 3])) == "bigint"
    assert infer_pg_type(np.asarray([1.5, 2.0])) == "double precision"
    assert infer_pg_type(np.asarray([True, False])) == "boolean"
    assert infer_pg_type(np.asarray(["a", "b"], object)) == "text"
    assert infer_pg_type(np.asarray([1, None, 3], object)) == "bigint"
    assert infer_pg_type(np.asarray([1, 2.5], object)) == "double precision"


def test_collapse_embedding_columns():
    cols = ["pk", "x", "title_emb000", "title_emb001", "title_emb002"]
    scalars, groups = collapse_embedding_columns(cols)
    assert scalars == ["pk", "x"]
    assert groups == {"title": ("title_emb000", "title_emb001", "title_emb002")}
    with pytest.raises(ValueError, match="non-contiguous"):
        collapse_embedding_columns(["t_emb000", "t_emb002"])
    # wider zero-padding is accepted and the REAL names are carried through
    _, g4 = collapse_embedding_columns(["t_emb0000", "t_emb0001"])
    assert g4 == {"t": ("t_emb0000", "t_emb0001")}


def test_build_create_preprocessed_ddl():
    stmts = build_create_preprocessed(
        "public", "notice_preprocessed", {"pk": "text", "v": "double precision"},
        {"title": 768},
    )
    assert stmts[0] == "CREATE EXTENSION IF NOT EXISTS vector;"
    assert 'DROP TABLE IF EXISTS "public"."notice_preprocessed";' in stmts
    assert '"title" vector(768)' in stmts[-1]
    # no vector cols -> no extension statement
    assert build_create_preprocessed("s", "t", {"a": "bigint"}, {})[0].startswith(
        "DROP"
    )


def test_build_create_preprocessed_pk_cols():
    """PK columns become text NOT NULL (leading-zero ids survive the round
    trip) + a PRIMARY KEY constraint (reference upload_database.py table
    shape)."""
    stmts = build_create_preprocessed(
        "public", "notice_preprocessed",
        {"bidntceno": "bigint", "bidntceord": "bigint", "v": "double precision"},
        {}, pk_cols=["bidntceno", "bidntceord"],
    )
    create = next(s for s in stmts if s.startswith("CREATE TABLE"))
    assert '"bidntceno" text NOT NULL' in create
    assert '"bidntceord" text NOT NULL' in create
    assert '"v" double precision' in create
    alter = stmts[-1]
    # wrapped in a DO block: replace=False re-runs hit an existing table
    # whose constraint (or a prior PK) must not abort the upload
    assert alter.startswith("DO $$")
    assert "ALTER TABLE" in alter
    assert 'PRIMARY KEY ("bidntceno", "bidntceord")' in alter
    assert "duplicate_object" in alter and "invalid_table_definition" in alter
    with pytest.raises(ValueError, match="pk_cols not in"):
        build_create_preprocessed("s", "t", {"a": "bigint"}, {}, pk_cols=["zz"])


def test_uploader_rejects_missing_pk_col():
    """A typo'd/mis-cased pk col must raise, not silently create a keyless
    table."""
    conn = FakeConn()
    up = PreprocessedUploader(conn, pk_cols=["bidNtceNo"])
    chunk = {"bidntceno": np.asarray(["1"], object), "v": np.asarray([1.0])}
    with pytest.raises(ValueError, match="bidNtceNo"):
        up.upload_chunk("t", chunk)


def test_uploader_nonfinite_vector_rows_null():
    """A vector row containing NaN/Inf lands as \\N, not a 'nan' literal
    pgvector would reject and abort the COPY on (reference
    upload_database.py _collapse_embeddings NULL-on-non-finite)."""
    conn = FakeConn()
    up = PreprocessedUploader(conn, pk_cols=["pk"])
    chunk = {
        "pk": np.asarray(["a", "b", "c"], object),
        "title_emb000": np.asarray([0.1, float("nan"), 0.3], np.float32),
        "title_emb001": np.asarray([1.0, 2.0, float("inf")], np.float32),
    }
    up.upload_chunk("t", chunk)
    payload = "".join(next(e[2] for e in conn.log if e[0] == "copy"))
    lines = payload.strip().split("\n")
    assert lines[0].startswith('a,"[')
    assert lines[1] == "b,\\N"
    assert lines[2] == "c,\\N"
    executes = [s for e, *rest in conn.log if e == "execute" for s in rest]
    assert any("PRIMARY KEY" in s for s in executes)


def test_vector_update_nonfinite_rows_null():
    conn = FakeConn()
    execute_vector_update(
        conn, schema="s", table="t", pk_cols=["pk"], vec_col="v",
        rows=[("a", [1.0, 2.0]), ("b", [float("nan"), 1.0])], dims=2,
    )
    payload = "".join(next(e[2] for e in conn.log if e[0] == "copy"))
    lines = payload.strip().split("\n")
    assert lines[0] == 'a,"[1.0,2.0]"'
    assert lines[1] == "b,\\N"


def test_uploader_create_and_copy_flow():
    conn = FakeConn()
    up = PreprocessedUploader(conn, schema="public")
    chunk = {
        "pk": np.asarray(["a", "b,c", None], object),
        "score": np.asarray([1.0, float("nan"), 3.5]),
        "title_emb000": np.asarray([0.1, 0.2, 0.3], np.float32),
        "title_emb001": np.asarray([1.0, 2.0, 3.0], np.float32),
    }
    n = up.upload_chunk("notice_preprocessed", chunk)
    assert n == 3
    # second chunk: no DDL again, just COPY
    up.upload_chunk("notice_preprocessed", chunk)
    up.commit()

    executes = [s for e, *rest in conn.log if e == "execute" for s in rest]
    copies = [entry for entry in conn.log if entry[0] == "copy"]
    assert any("CREATE EXTENSION" in s for s in executes)
    assert any("CREATE TABLE" in s and "vector(2)" in s for s in executes)
    assert len([s for s in executes if "CREATE TABLE" in s]) == 1
    assert len(copies) == 2
    copy_sql = copies[0][1]
    assert '"pk", "score", "title"' in copy_sql and "FROM STDIN" in copy_sql
    payload = "".join(copies[0][2])
    lines = payload.strip().split("\n")
    # row 0: scalar fields + the vector literal round-trips to float32
    pk0, score0, vec0 = lines[0].split(",", 2)
    assert (pk0, score0) == ("a", "1.0")
    parsed = np.asarray(
        [float(x) for x in vec0.strip('"[]').split(",")], np.float32
    )
    np.testing.assert_array_equal(parsed, np.asarray([0.1, 1.0], np.float32))
    # quoted comma field, nulls as \N (both the text None and the float nan)
    assert lines[1].startswith('"b,c",\\N,')
    assert lines[2].startswith("\\N,3.5,")
    assert conn.commits == 1


def test_execute_vector_update_flow():
    conn = FakeConn()
    rows = [("n1", "01", [0.5, 0.25]), ("n2", "01", [1.0, 2.0])]
    n = execute_vector_update(
        conn, schema="public", table="notice", pk_cols=("bidntceno", "bidntceord"),
        vec_col="bidntcenm_vec", rows=rows, dims=2,
    )
    assert n == 2
    executes = [s for e, *rest in conn.log if e == "execute" for s in rest]
    assert executes[0] == "CREATE EXTENSION IF NOT EXISTS vector;"
    assert any("ADD COLUMN IF NOT EXISTS" in s for s in executes)
    assert any(s.startswith("CREATE TEMP TABLE") for s in executes)
    update = [s for s in executes if s.startswith("UPDATE")]
    assert update and 't."bidntceno" = s."bidntceno"' in update[0]
    copies = [entry for entry in conn.log if entry[0] == "copy"]
    payload = "".join(copies[0][2])
    assert payload.splitlines()[0] == 'n1,01,"[0.5,0.25]"'
    # transaction committed AFTER the update
    assert conn.log[-1] == ("commit",)
    assert conn.log[-2][1].startswith("UPDATE")


def test_uploader_2d_array_vector_columns():
    """This framework's native chunk shape: embeddings as [N, D] blocks
    (etl/pipeline.py fixed-size-list columns) upload as vector columns."""
    conn = FakeConn()
    up = PreprocessedUploader(conn)
    chunk = {
        "pk": np.asarray(["a", "b"], object),
        "title": np.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32),
    }
    assert up.upload_chunk("t", chunk) == 2
    executes = [s for e, *rest in conn.log if e == "execute" for s in rest]
    assert any("vector(3)" in s for s in executes)
    copies = [entry for entry in conn.log if entry[0] == "copy"]
    payload = "".join(copies[0][2])
    assert payload.splitlines()[0] == 'a,"[1,2,3]"'


def test_chunk_csv_float32_nan_is_null():
    from jodalrob_twotower_tpu.etl.pg_writeback import _csv_field

    assert _csv_field(np.float32("nan")) == "\\N"
    assert _csv_field(float("nan")) == "\\N"
    assert _csv_field(np.float32(1.5)) == "1.5"


def test_uploader_wide_zero_padded_group():
    """4-digit emb suffixes (reference tables beyond 1000 dims) upload via
    the carried column names, not a re-derived 3-digit format."""
    conn = FakeConn()
    up = PreprocessedUploader(conn)
    chunk = {
        "pk": np.asarray(["a"], object),
        "t_emb0000": np.asarray([1.0], np.float32),
        "t_emb0001": np.asarray([2.0], np.float32),
    }
    assert up.upload_chunk("t", chunk) == 1
    copies = [entry for entry in conn.log if entry[0] == "copy"]
    assert "".join(copies[0][2]).splitlines()[0] == 'a,"[1,2]"'


def test_pipeline_chunks_to_pg_upload_end_to_end(tmp_path):
    """run_pipeline parquet output streams straight into the uploader."""
    from jodalrob_twotower_tpu.etl.pipeline import (
        iter_preprocessed_chunks,
        run_pipeline,
    )
    from jodalrob_twotower_tpu.etl.text import HashTextEmbedder

    rng = np.random.default_rng(0)
    n = 10
    table = {
        "pk": np.asarray([f"k{i}" for i in range(n)], object),
        "amount": rng.normal(size=n).astype(np.float64),
        "cat": np.asarray([f"c{i % 3}" for i in range(n)], object),
        "title": np.asarray([f"text number {i}" for i in range(n)], object),
    }
    run_pipeline(
        "notice",
        [table],
        tmp_path,
        pk_columns=["pk"],
        numeric_columns=["amount"],
        categorical_columns=["cat"],
        text_columns=["title"],
        fit_table=table,
        text_embedder=HashTextEmbedder(embed_dim=4),
    )
    conn = FakeConn()
    up = PreprocessedUploader(conn)
    total = 0
    for chunk in iter_preprocessed_chunks(tmp_path, "notice"):
        total += up.upload_chunk("notice_preprocessed", chunk)
    up.commit()
    assert total == n
    executes = [s for e, *rest in conn.log if e == "execute" for s in rest]
    create = [s for s in executes if "CREATE TABLE" in s]
    assert create and "vector(4)" in create[0]  # the title embedding block
    assert conn.commits == 1


def test_vector_literal_roundtrip_precision():
    v = np.asarray([0.1, -2.5e-7, 3.0], np.float32)
    lit = vector_literal(v)
    parsed = np.asarray([float(x) for x in lit[1:-1].split(",")], np.float32)
    np.testing.assert_array_equal(parsed, v)  # repr round-trips exactly
