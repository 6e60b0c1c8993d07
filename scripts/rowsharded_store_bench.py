"""Row-sharded feature-store training at too-big-to-replicate scale.

Runs on the 8-virtual-CPU-device mesh (this sandbox has ONE physical TPU
chip; the mesh path needs 8 devices). The store is sized so that the
replicated placement would cost 8x the per-chip budget of the sharded one:
1M notices x 256-d dense f32 + 1M companies x 64-d = ~1.3 GB total store,
~160 MB/device sharded. CPU wall-clock is NOT a TPU number — the row
demonstrates (a) the mode executes end-to-end at scale, (b) per-device
residency is 1/n, (c) the exchange's overhead vs the replicated gather on
identical shapes/devices. Reference capability anchor: the
features-too-large-for-memory streaming mode
(unified_bid_data_loader.py:408-456), answered device-resident here
(parallel/sharded_store.py).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from jodalrob_twotower_tpu.config import (
        DataConfig,
        LossConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_train import (
        make_sharded_indexed_train,
    )
    from jodalrob_twotower_tpu.schema import (
        CategoricalSpec,
        NumericSpec,
        SideSchema,
        TwoTowerSchema,
    )

    n_rows = 1_000_000
    schema = TwoTowerSchema(
        notice=SideSchema(
            table="notice",
            pk=("pk",),
            numeric=tuple(NumericSpec(f"n{i}") for i in range(256)),
            categorical=tuple(
                CategoricalSpec(f"c{i}", vocab_size=1000) for i in range(8)
            ),
        ),
        company=SideSchema(
            table="company",
            pk=("pk",),
            numeric=tuple(NumericSpec(f"n{i}") for i in range(64)),
            categorical=tuple(
                CategoricalSpec(f"c{i}", vocab_size=1000) for i in range(4)
            ),
        ),
    )
    rng = np.random.default_rng(0)
    n_dense = rng.normal(size=(n_rows, 256)).astype(np.float32)
    n_cat = rng.integers(0, 1000, size=(n_rows, 8)).astype(np.int32)
    c_dense = rng.normal(size=(n_rows, 64)).astype(np.float32)
    c_cat = rng.integers(0, 1000, size=(n_rows, 4)).astype(np.int32)
    pairs = rng.integers(0, n_rows, size=(100_000, 2)).astype(np.int32)

    batch = 1024
    n_inner = 4
    mesh = make_mesh(jax.devices()[:8])
    store_bytes = sum(m.nbytes for m in (n_dense, n_cat, c_dense, c_cat))

    for mode in ("rows", "replicated"):
        cfg = TrainConfig(
            model=ModelConfig(
                tower_hidden_dims=(256, 128), final_embedding_dim=64,
                dropout_rate=0.0, compute_dtype="float32",
            ),
            loss=LossConfig(temperature=1.0),
            optimizer=OptimizerConfig(),
            data=DataConfig(batch_size=batch),
            mesh=MeshConfig(store_sharding=mode),
            results_csv="",
        )
        model = TwoTowerModel(schema, cfg.model)
        example_idx = pairs[:batch]
        n_store_h = (n_dense, n_cat)
        c_store_h = (c_dense, c_cat)
        from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch

        example = PairBatch(
            notice=TowerBatch(dense=n_dense[example_idx[:, 0]],
                              cat_ids=n_cat[example_idx[:, 0]]),
            company=TowerBatch(dense=c_dense[example_idx[:, 1]],
                               cat_ids=c_cat[example_idx[:, 1]]),
        )
        state, tx, scan_steps, single_step, put_idx, put_store = (
            make_sharded_indexed_train(model, cfg, mesh, example, 100,
                                       n_inner=n_inner)
        )
        n_store = put_store(n_store_h)
        c_store = put_store(c_store_h)
        per_dev = sum(
            max(sh.data.nbytes for sh in m.addressable_shards)
            for m in (*n_store, *c_store)
        )
        stack = put_idx(
            np.stack([pairs[i * batch:(i + 1) * batch] for i in range(n_inner)])
        )
        state, metrics = scan_steps(state, stack, n_store, c_store)  # compile
        float(np.asarray(metrics["loss"])[-1])
        t0 = time.perf_counter()
        reps = 5
        for r in range(reps):
            state, metrics = scan_steps(state, stack, n_store, c_store)
        float(np.asarray(metrics["loss"])[-1])
        dt = (time.perf_counter() - t0) / (reps * n_inner)
        print(json.dumps({
            "bench": f"train_rowsharded_store_{mode}",
            "ms_per_step_cpu_mesh8": round(dt * 1e3, 2),
            "store_total_mb": round(store_bytes / 2**20, 1),
            "store_per_device_mb": round(per_dev / 2**20, 1),
            "batch": batch,
        }), flush=True)


if __name__ == "__main__":
    main()
