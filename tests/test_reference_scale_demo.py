"""Smoke test of the reference-scale demo driver (real metadata.csv)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest


def test_reference_scale_demo_smoke(tmp_path):
    if not Path("/root/reference/meta/metadata.csv").exists():
        pytest.skip("reference meta not mounted")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/reference_scale_demo.py",
            "--rows", "600",
            "--pairs", "3000",
            "--batch-size", "64",
            "--workdir", str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the real metadata produced the surveyed production schema
    assert "notice 29 num / 32 cat / 1 text" in proc.stdout
    assert "company 1 / 6 / 0" in proc.stdout
    assert "29 numeric, 32 categorical adapted" in proc.stdout
    assert (tmp_path / "train_results.csv").exists()
    assert (tmp_path / "metrics.jsonl").exists()
