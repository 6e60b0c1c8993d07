"""End-to-end eval CLI: train -> standalone evaluation report.

Covers the reference's evaluate_comprehensive surface as a CLI
(SURVEY.md §3.4) plus the corpus-level retrieval eval and prediction demo."""

import json
import os
import subprocess
import sys

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)


import pytest


def _run(script_args, timeout=600, devices=1):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if devices > 1:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices}"
        ).strip()
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, *script_args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd="/root/repo",
    )


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("evalcli")
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(num_epochs=2),
        data=DataConfig(batch_size=64, pair_limit=2000),
        results_csv=str(tmp_path / "results.csv"),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)
    out_dir = tmp_path / "out"
    proc = _run([
        "scripts/train.py", "--config", str(cfg_path), "--synthetic",
        "--output-dir", str(out_dir), "--no-corpus-eval",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    return tmp_path, out_dir


def test_eval_cli_end_to_end(trained_dir):
    tmp_path, out_dir = trained_dir
    report_path = tmp_path / "eval.json"
    proc = _run([
        "scripts/eval.py", "--model-dir", str(out_dir), "--synthetic",
        "--ks", "5,50", "--demo-queries", "2", "--output", str(report_path),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(report_path.read_text())

    ib = report["in_batch"]
    for key in ("loss", "accuracy", "mrr", "recall@5", "recall@10",
                "similarity_gap", "positive_similarity", "negative_similarity"):
        assert key in ib, key
    # a trained model beats random on its own validation split
    assert ib["accuracy"] > 3 * report["random_baselines"]["accuracy"]
    assert "x the random baseline" in report["assessment"]

    corpus = report["corpus"]
    assert corpus["recall@50"] >= corpus["recall@5"]
    assert 0.0 <= corpus["mrr"] <= 1.0
    assert corpus["num_queries"] == report["num_val_pairs"]

    demo = report["demo"]
    assert len(demo) == 2 and len(demo[0]["top_k"]) == 10
    scores = [h["score"] for h in demo[0]["top_k"]]
    assert scores == sorted(scores, reverse=True)


def test_eval_cli_mesh_rows_matches_single(trained_dir):
    """--mesh-devices 8 --store-sharding rows: device-resident eval over
    ROW-SHARDED stores from the CLI (VERDICT r3 #4 'eval CLI defaulting
    to it') — the report matches the single-device one."""
    tmp_path, out_dir = trained_dir
    single = tmp_path / "eval_single.json"
    proc = _run([
        "scripts/eval.py", "--model-dir", str(out_dir), "--synthetic",
        "--no-corpus-eval", "--output", str(single),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    meshed = tmp_path / "eval_mesh.json"
    proc = _run([
        "scripts/eval.py", "--model-dir", str(out_dir), "--synthetic",
        "--mesh-devices", "8", "--store-sharding", "rows",
        "--no-corpus-eval", "--output", str(meshed),
    ], devices=8)
    assert proc.returncode == 0, proc.stderr[-2000:]
    a = json.loads(single.read_text())["in_batch"]
    b = json.loads(meshed.read_text())["in_batch"]
    for key in ("loss", "accuracy", "mrr", "similarity_gap", "z_gap"):
        assert abs(a[key] - b[key]) < 1e-3, (key, a[key], b[key])
