"""End-to-end serving CLI: train -> serve queries -> persist/reload index."""

import json
import os
import subprocess
import sys

import pytest

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)


def _run(script_args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [sys.executable, *script_args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd="/root/repo",
    )


def test_serve_cli_end_to_end(tmp_path):
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
        optimizer=OptimizerConfig(num_epochs=1),
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

    results = tmp_path / "hits.jsonl"
    idx_path = tmp_path / "company.idx.npz"
    proc = _run([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--index", "int8", "--k", "5", "--queries", "70",
        "--output", str(results), "--save-index", str(idx_path),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in results.read_text().splitlines()]
    assert len(lines) == 70
    assert len(lines[0]["top_k"]) == 5
    assert all("company" in h and "score" in h for h in lines[0]["top_k"])
    # scores descend
    scores = [h["score"] for h in lines[0]["top_k"]]
    assert scores == sorted(scores, reverse=True)
    assert idx_path.exists()

    # serve again from the persisted index, no corpus re-encode
    results2 = tmp_path / "hits2.jsonl"
    proc = _run([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--load-index", str(idx_path), "--k", "5", "--queries", "70",
        "--output", str(results2),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines2 = [json.loads(l) for l in results2.read_text().splitlines()]
    assert [l["top_k"] for l in lines2] == [l["top_k"] for l in lines]

    # --target-recall auto-config (serving/autoconfig.py): picks the
    # measured frontier config and serves end-to-end
    results3 = tmp_path / "hits3.jsonl"
    proc = _run([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--target-recall", "0.95", "--k", "5", "--queries", "10",
        "--output", str(results3),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "auto-config for recall>=0.95" in proc.stderr
    assert "--approx-recall 0.9" in proc.stderr  # the dominating config
    assert len(results3.read_text().splitlines()) == 10

    # manual knobs conflict with --target-recall: fail fast
    proc = _run([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--target-recall", "0.95", "--approx-recall", "0.8",
    ])
    assert proc.returncode != 0
    assert "--target-recall picks" in proc.stderr


def test_serve_cli_mesh_matches_single(tmp_path):
    """serve.py --mesh-devices (round 5): the ShardedIndex CLI path serves
    the same top-k as the single-device exact index, and the incompatible
    flag combinations fail fast."""
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
        optimizer=OptimizerConfig(num_epochs=1),
        data=DataConfig(batch_size=64, pair_limit=2000),
        results_csv="",
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)
    out_dir = tmp_path / "out"

    def run8(script_args, timeout=600):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
        env.pop("PYTHONPATH", None)
        return subprocess.run(
            [sys.executable, *script_args], capture_output=True, text=True,
            timeout=timeout, env=env, cwd="/root/repo",
        )

    proc = run8([
        "scripts/train.py", "--config", str(cfg_path), "--synthetic",
        "--output-dir", str(out_dir), "--no-corpus-eval",
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]

    single = tmp_path / "single.jsonl"
    proc = run8([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--index", "exact", "--k", "5", "--queries", "40",
        "--output", str(single),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]

    meshed = tmp_path / "mesh.jsonl"
    proc = run8([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--index", "exact", "--k", "5", "--queries", "40",
        "--mesh-devices", "8", "--output", str(meshed),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "corpus row-sharded" in proc.stderr

    got_s = [json.loads(l) for l in single.read_text().splitlines()]
    got_m = [json.loads(l) for l in meshed.read_text().splitlines()]
    assert [h["top_k"] for h in got_m] == [h["top_k"] for h in got_s]

    # incompatible combinations fail fast with a clear message
    proc = run8([
        "scripts/serve.py", "--model-dir", str(out_dir), "--synthetic",
        "--mesh-devices", "8", "--target-recall", "0.95",
    ])
    assert proc.returncode != 0
    assert "--mesh-devices cannot be combined" in proc.stderr
