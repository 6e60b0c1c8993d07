"""Headline benchmark: training examples/sec/chip at batch 8192.

Flagship = the reference-shaped model (notice 29 num + 32 cat + 1 text(768),
company 1 num + 6 cat, towers [512,256]->128 — SURVEY.md §2.2/2.3) trained
with bidirectional in-batch-negative CE on synthetic stores, full input
pipeline (background host assembly + device prefetch) + fused jit train step.

Prints ONE JSON line. vs_baseline is against the reference's best sustained
throughput: 23 it/s @ batch 256 = 5,888 examples/s on its single GPU
(README.md:104-106, BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_EXAMPLES_PER_SEC = 23.0 * 256  # reference: 23 it/s @ B=256


def main() -> None:
    import jax

    from jodalrob_twotower_tpu.config import (
        LossConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.pipeline import train_batches
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.schema import reference_shaped_schema
    from jodalrob_twotower_tpu.train.train_step import create_train_state, make_train_step

    batch_size = 8192
    cfg = TrainConfig(
        model=ModelConfig(),  # reference dims: [512,256]->128, cat dim 32
        loss=LossConfig(temperature=1.0),
        optimizer=OptimizerConfig(),
    )
    schema = reference_shaped_schema()
    # enough rows that gathers are non-trivial; pairs resampled per epoch
    ds = make_synthetic_dataset(
        schema,
        n_notices=100_000,
        n_companies=100_000,
        n_pairs=400_000,
        n_clusters=256,
        seed=0,
    )

    model = TwoTowerModel(schema, cfg.model)
    warm = next(
        train_batches(ds.notice_store, ds.company_store, ds.pairs, batch_size, seed=0)
    )
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 1000)
    train_step = make_train_step(model, cfg, tx)

    # warmup: compile + first steps
    for _ in range(3):
        state, metrics = train_step(state, warm)
    jax.block_until_ready(metrics["loss"])

    # timed: full pipeline, 2 epochs worth of batches capped at n_steps
    n_steps = 40
    steps = 0
    start = time.perf_counter()
    epoch = 0
    while steps < n_steps:
        for batch in train_batches(
            ds.notice_store, ds.company_store, ds.pairs, batch_size,
            seed=epoch, prefetch=2,
        ):
            state, metrics = train_step(state, batch)
            steps += 1
            if steps >= n_steps:
                break
        epoch += 1
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    n_chips = jax.device_count()
    examples_per_sec_per_chip = steps * batch_size / elapsed / n_chips
    print(
        json.dumps(
            {
                "metric": "examples_per_sec_per_chip_batch8192",
                "value": round(examples_per_sec_per_chip, 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(examples_per_sec_per_chip / BASELINE_EXAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
