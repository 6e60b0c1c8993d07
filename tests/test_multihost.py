"""Multi-process (multi-host recipe) training smoke, run for real.

Spawns 2 worker processes with jax.distributed over a local coordinator,
a global 8-device mesh (4 virtual CPU devices per process), per-host data
shards, and the sharded train step (scripts/multihost_smoke.py). This is
the actual pod-slice recipe, minus ICI.
"""

import json
import os
import subprocess
import sys


def test_multihost_smoke():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "scripts/multihost_smoke.py"],
        capture_output=True, text=True, timeout=900, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.splitlines()[-1])
    assert out["ok"] is True
    assert out["processes"] == 2 and out["global_devices"] == 8
    assert out["table_rows_on_this_host"] * 2 == out["table_rows_global"]
    assert out["losses"][-1] < out["losses"][0]
    # the shard_mapped fused CE ran across processes and matched XLA
    assert out["fused_matches_xla"] is True
