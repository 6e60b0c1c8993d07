"""SQL shim: pure query-building logic (no database needed) + gating."""

import numpy as np
import pytest

from jodalrob_twotower_tpu.etl.sql import (
    DEFAULT_PK,
    DatabaseConnector,
    build_bid_participants,
    build_company_bid_history,
    build_pk_lookup,
    build_select,
    connection_url,
)
from jodalrob_twotower_tpu.train.trainer import Trainer


def test_build_select():
    sql = build_select("notice", ["bidntceno", "presmptprce"], limit=100, offset=50)
    assert sql == 'SELECT "bidntceno", "presmptprce" FROM "notice" LIMIT 100 OFFSET 50'
    sql = build_select("company", [], where="bizno = '123'", order_by=["bizno"])
    assert sql == "SELECT * FROM \"company\" WHERE bizno = '123' ORDER BY \"bizno\""


def test_build_select_rejects_injection():
    with pytest.raises(ValueError, match="unsafe"):
        build_select("notice; DROP TABLE x", ["a"])
    with pytest.raises(ValueError, match="unsafe"):
        build_select("notice", ["a", "b; --"])


def test_build_pk_lookup_simple_and_composite():
    sql = build_pk_lookup("company", DEFAULT_PK["company"], 3)
    assert sql == 'SELECT * FROM "company" WHERE "bizno" IN (%s, %s, %s)'
    sql = build_pk_lookup("notice", DEFAULT_PK["notice"], 2)
    assert (
        sql
        == 'SELECT * FROM "notice" WHERE ("bidntceno", "bidntceord") IN ((%s, %s), (%s, %s))'
    )


def test_build_bid_participants():
    sql = build_bid_participants(company_columns=["bizno", "prcbdramt"])
    assert 'c."bizno", c."prcbdramt"' in sql
    assert 'FROM "bid_two_tower" b' in sql
    assert 'LEFT JOIN "company" c ON b."bizno" = c."bizno"' in sql
    # parameterized, never interpolated (unlike the reference f-strings)
    assert sql.count("%s") == 2 and "'" not in sql
    assert "c.*" in build_bid_participants()


def test_build_company_bid_history():
    sql = build_company_bid_history(limit=25)
    assert 'b."bidntceno", b."bidntceord"' in sql
    assert 'n."bidnm", n."rgstdt"' in sql
    assert 'ON b."bidntceno" = n."bidntceno" AND b."bidntceord" = n."bidntceord"' in sql
    assert sql.count("%s") == 1
    assert sql.endswith('ORDER BY n."rgstdt" DESC LIMIT 25')
    with pytest.raises(ValueError, match="unsafe"):
        build_company_bid_history(order_by="rgstdt; DROP")


def test_build_pgvector_ddl_and_update():
    from jodalrob_twotower_tpu.etl.sql import build_pgvector_ddl, build_vector_update

    ddl = build_pgvector_ddl("public", "notice", "bidntcenm_emb", 768)
    assert ddl[0].startswith("CREATE EXTENSION")
    assert 'ADD COLUMN IF NOT EXISTS "bidntcenm_emb" vector(768)' in ddl[1]
    stmts = build_vector_update("public", "notice", ["bidntceno", "bidntceord"],
                                "bidntcenm_emb", 768)
    assert '"bidntceno" text, "bidntceord" text' in stmts["create_temp"]
    assert stmts["copy"].startswith('COPY "tmp_vec"')
    assert 't."bidntceno" = s."bidntceno" AND t."bidntceord" = s."bidntceord"' in stmts["update"]
    with pytest.raises(ValueError, match="unsafe"):
        build_vector_update("public", "x; DROP", ["a"], "v", 3)


def test_connection_url_from_env():
    env = {"DB_HOST": "h", "DB_PORT": "5433", "DB_NAME": "d", "DB_USER": "u", "DB_PASSWORD": "p"}
    assert connection_url(env) == "postgresql+psycopg://u:p@h:5433/d"
    assert connection_url({}) == "postgresql+psycopg://postgres@localhost:5432/postgres"


def test_connector_gated_without_sqlalchemy():
    pytest.importorskip("sqlalchemy", reason="only test the gate when absent")


def test_connector_raises_clear_error():
    try:
        import sqlalchemy  # noqa: F401

        pytest.skip("sqlalchemy installed; gate not triggerable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="parquet data plane"):
        DatabaseConnector("postgresql://x")


def test_verify_pair_alignment():
    pairs = np.array([[1, 2], [3, 4], [5, 6]])
    Trainer.verify_pair_alignment(np.array([[3, 4], [1, 2]]), pairs)  # ok
    with pytest.raises(AssertionError, match="not known positive"):
        Trainer.verify_pair_alignment(np.array([[1, 4]]), pairs)
