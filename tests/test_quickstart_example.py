"""examples/quickstart.py must keep running end-to-end (ETL -> stores ->
training -> eval -> serving) — it is the first thing a new user tries."""

import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def test_quickstart_runs():
    env = dict(os.environ)
    env["QUICKSTART_FAST"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, "examples/quickstart.py"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "ETL notice:" in out and "ETL company:" in out
    assert "corpus retrieval over" in out
    assert "done" in out.splitlines()[-1]
