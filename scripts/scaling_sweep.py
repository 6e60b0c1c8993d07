"""Strong-scaling sweep of the sharded train step over device meshes.

BASELINE config 4 harness: the same `make_sharded_train` program is run on
1/2/4/8-device meshes with a FIXED GLOBAL batch and we report examples/s
and efficiency vs the 1-device run. Strong scaling (not weak) because the
in-batch-negatives loss is O(B²) in the global batch — growing B with the
mesh conflates loss growth with scaling loss.

On this sandbox the mesh is 8 virtual CPU devices sharing one host's cores
(no multi-chip TPU is attached), so examples/s cannot actually rise with n —
the meaningful signal is that step time stays ~flat while per-device memory
and compute shrink n×, i.e. the program has no replicated bottleneck and no
collective blow-up. A real pod slice runs this file unchanged: row-sharded
tables + data-parallel towers + global in-batch negatives
(parallel/sharded_train.py).

Usage:
  python scripts/scaling_sweep.py            # sweep 1,2,4,8 via subprocesses
  python scripts/scaling_sweep.py --one N    # single measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

GLOBAL_BATCH = 4096
STEPS = 12


def measure(n_devices: int) -> dict:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from jodalrob_twotower_tpu.config import ModelConfig, TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_train import make_sharded_train

    b = GLOBAL_BATCH
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=32,
            dense_projection_dim=64,
            tower_hidden_dims=(256, 128),
            final_embedding_dim=64,
            dropout_rate=0.0,
        )
    )
    ds = make_synthetic_dataset(
        n_notices=20_000, n_companies=20_000, n_pairs=4 * b, n_clusters=64, seed=0
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    mesh = make_mesh(jax.devices()[:n_devices])
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    state, step, shard_batch = make_sharded_train(model, cfg, mesh, batch, 100)
    dev_batch = shard_batch(batch)
    state, m = step(state, dev_batch)  # compile + 1st step
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, dev_batch)
    assert np.isfinite(float(m["loss"]))
    dt = time.perf_counter() - t0
    return {
        "devices": n_devices,
        "global_batch": b,
        "examples_per_sec": round(STEPS * b / dt, 1),
        "step_ms": round(dt / STEPS * 1e3, 2),
    }


def sweep(ns=(1, 2, 4, 8)) -> list[dict]:
    rows = []
    for n in ns:
        out = subprocess.run(
            [sys.executable, __file__, "--one", str(n)],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"sweep n={n} failed:\n{out.stdout}\n{out.stderr}")
        rows.append(json.loads(line[-1]))
    base = rows[0]["examples_per_sec"]
    for r in rows:
        # strong scaling: ideal is flat examples/s on shared virtual devices
        # (real chips: ideal is examples/s = base * devices)
        r["vs_1dev"] = round(r["examples_per_sec"] / base, 3)
    return rows


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        print(json.dumps(measure(int(sys.argv[2]))), flush=True)
    else:
        for row in sweep():
            print(json.dumps({"bench": "scaling_sweep_cpu_mesh", **row}), flush=True)
