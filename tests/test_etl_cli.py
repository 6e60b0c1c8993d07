"""End-to-end tests of the standalone ETL / TFRecord CLIs (scripts/etl.py,
scripts/tfrecord_tool.py) — parity with the reference's auxiliary mains
(SURVEY.md §2.8: column_classifier.py:133, pipeline.py:125,
text_vector_updator.py:34, to_tfrecord.py:138, tfrecord_viewer.py:168)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import etl as etl_cli  # noqa: E402
import tfrecord_tool  # noqa: E402

_METADATA_KO = """\
테이블명,컬럼명,타입,사용 여부,PK,범주형 여부,범주 갯수
notice,bidntceno,character varying(40),Y,Y,,
notice,presmptprce,numeric,Y,,,
notice,bidmethdnm,character varying(100),Y,,Y,3
notice,bidntcenm,text,Y,,,
company,bizno,character varying(10),Y,Y,,
company,empl_cnt,integer,Y,,,
company,region_cd,character(2),Y,,Y,5
"""


@pytest.fixture()
def metadata_csv(tmp_path):
    p = tmp_path / "metadata.csv"
    p.write_text(_METADATA_KO, encoding="utf-8")
    return p


@pytest.fixture()
def raw_notice_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0)
    n = 64
    tbl = pa.table(
        {
            "bidntceno": pa.array([f"N{i:04d}" for i in range(n)]),
            "presmptprce": pa.array(rng.lognormal(10, 1, n)),
            "bidmethdnm": pa.array(rng.choice(["open", "limited", "direct"], n)),
            "bidntcenm": pa.array([f"공사 notice {i}" for i in range(n)]),
        }
    )
    path = tmp_path / "notice_raw.parquet"
    pq.write_table(tbl, str(path))
    return path


def test_classify_cli(metadata_csv, capsys):
    assert etl_cli.main(["classify", "--table", "notice", "--metadata", str(metadata_csv)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pk"] == ["bidntceno"]
    assert out["numeric"] == ["presmptprce"]
    assert out["categorical"] == [{"column": "bidmethdnm", "n_categories": 3}]
    assert out["text"] == ["bidntcenm"]


def test_schema_cli_roundtrip(metadata_csv, tmp_path):
    from jodalrob_twotower_tpu.schema import TwoTowerSchema

    out = tmp_path / "schema.json"
    assert (
        etl_cli.main(
            ["schema", "--metadata", str(metadata_csv), "--out", str(out), "--text-embed-dim", "16"]
        )
        == 0
    )
    schema = TwoTowerSchema.from_json(out)
    assert schema.notice.text[0].embed_dim == 16
    assert schema.company.categorical[0].vocab_size == 5 + 10  # margin


def test_run_and_update_text_cli(metadata_csv, raw_notice_parquet, tmp_path, capsys):
    out_dir = tmp_path / "pre"
    rc = etl_cli.main(
        [
            "run",
            "--table",
            "notice",
            "--metadata",
            str(metadata_csv),
            "--input",
            str(raw_notice_parquet),
            "--out-dir",
            str(out_dir),
            "--chunk-rows",
            "40",
        ]
    )
    assert rc == 0
    manifest = json.loads((out_dir / "notice_manifest.json").read_text())
    assert manifest["rows"] == 64
    assert len(manifest["chunks"]) == 2  # 40 + 24
    assert "bidntcenm" in manifest["text_outputs"]

    from jodalrob_twotower_tpu.etl.pipeline import load_preprocessed

    before = load_preprocessed(out_dir, "notice")
    emb_before = before["bidntcenm"][3].copy()

    texts = tmp_path / "texts.json"
    texts.write_text(json.dumps({"N0003": "totally different text"}), encoding="utf-8")
    rc = etl_cli.main(
        [
            "update-text",
            "--out-dir",
            str(out_dir),
            "--table",
            "notice",
            "--column",
            "bidntcenm",
            "--texts",
            str(texts),
        ]
    )
    assert rc == 0
    after = load_preprocessed(out_dir, "notice")
    assert not np.allclose(after["bidntcenm"][3], emb_before)  # row re-embedded
    assert np.allclose(after["bidntcenm"][4], before["bidntcenm"][4])  # others intact


def test_tfrecord_tool_roundtrip(metadata_csv, raw_notice_parquet, tmp_path, capsys):
    out_dir = tmp_path / "pre"
    etl_cli.main(
        [
            "run",
            "--table",
            "notice",
            "--metadata",
            str(metadata_csv),
            "--input",
            str(raw_notice_parquet),
            "--out-dir",
            str(out_dir),
        ]
    )
    capsys.readouterr()
    chunk = out_dir / "notice_chunk_0000.parquet"
    rec = tmp_path / "notice.tfrecord.gz"

    assert (
        tfrecord_tool.main(["export", "--input", str(chunk), "--out", str(rec)]) == 0
    )
    capsys.readouterr()

    assert tfrecord_tool.main(["count", str(rec)]) == 0
    assert capsys.readouterr().out.strip() == "64"

    assert tfrecord_tool.main(["inspect", str(rec), "--limit", "2"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["count"] == 64 and len(info["preview"]) == 2
    assert "bidntceno" in info["preview"][0]

    assert (
        tfrecord_tool.main(
            ["search", str(rec), "--key", "bidntceno", "--value", "N0007", "--bytes"]
        )
        == 0
    )
    hits = json.loads(capsys.readouterr().out)
    assert len(hits) == 1 and hits[0]["bidntceno"] == ["N0007"]


def test_integration_real_skips_cleanly_offline(tmp_path):
    """scripts/integration_real.py (VERDICT r2 #8): without DATABASE_URL /
    TEXT_EMBEDDING_MODEL both phases skip and the exit code is 0."""
    import json
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("DATABASE_URL", "TEXT_EMBEDDING_MODEL")}
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "scripts/integration_real.py"],
        capture_output=True, text=True, timeout=120, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    lines = [json.loads(l) for l in proc.stdout.splitlines()]
    assert {l["phase"] for l in lines} == {
        "live_pg", "real_hf_text", "default_train"
    }
    assert all(l["status"] == "skipped" for l in lines)
