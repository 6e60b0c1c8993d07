"""Hermetic smoke of the headline-artifact driver (scripts/train_headline.py).

The committed artifact itself is produced on the chip (gated); this proves
the DRIVER — both legs, artifact files, summary schema, the learned/
tolerance gates — end to end at tiny scale on CPU."""

import json
import os
import subprocess
import sys
from pathlib import Path


def test_train_headline_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "scripts/train_headline.py", "--smoke", "--epochs", "2"],
        capture_output=True, text=True, timeout=1200, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    line = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith('{"bench"')][-1]
    )
    assert line["chip_learned"] is True
    assert line["within_tolerance"] is True
    art = Path(line["artifacts"])
    summary = json.loads((art / "summary.json").read_text())
    for leg in ("chip", "control"):
        assert summary[leg]["epochs"] == 2
        assert summary[leg]["final_corpus_recall_at_100"] > 0.1
    # both legs' per-epoch streams and ledgers landed
    for f in ("metrics.jsonl", "train_results.csv",
              "control_metrics.jsonl", "control_train_results.csv"):
        assert (art / f).exists(), f
    # the smoke never touches the committed artifact directory
    committed = json.loads(
        Path("/root/repo/artifacts/headline_b8192/summary.json").read_text()
    )
    assert committed["scale"].startswith("bench")
