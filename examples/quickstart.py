#!/usr/bin/env python
"""Quickstart: the full framework lifecycle in one script.

raw tables -> ETL -> feature stores -> training (+ checkpoints, ledger)
-> evaluation (in-batch + corpus) -> serving (int8 MIPS top-k).

Runs hermetically on CPU or TPU:  python examples/quickstart.py
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.etl.pipeline import run_pipeline
from jodalrob_twotower_tpu.etl.text import HashTextEmbedder
from jodalrob_twotower_tpu.etl.to_feature_store import feature_store_from_pipeline
from jodalrob_twotower_tpu.schema import TwoTowerSchema
from jodalrob_twotower_tpu.serving.service import RetrievalService
from jodalrob_twotower_tpu.train.trainer import Trainer

workdir = Path(tempfile.mkdtemp(prefix="twotower_quickstart_"))
print(f"workdir: {workdir}")

# --- 1. raw tables (stand-ins for the PostgreSQL notice/company tables) ----
# QUICKSTART_FAST=1 shrinks the run for CI (tests/test_quickstart_example.py)
import os

FAST = os.environ.get("QUICKSTART_FAST") == "1"
rng = np.random.default_rng(0)
n_rows, n_clusters = (400, 8) if FAST else (2000, 16)
n_cluster = rng.integers(0, n_clusters, n_rows)
c_cluster = rng.integers(0, n_clusters, n_rows)


def raw_table(prefix: str, cluster: np.ndarray) -> dict:
    price = cluster * 7.0 + rng.normal(0, 1, n_rows)
    price[::37] = np.nan
    return {
        "id": np.asarray([f"{prefix}{i}" for i in range(n_rows)], object),
        "price": price,
        "region": np.asarray([f"region_{c % 5}" for c in cluster], object),
        "category": np.asarray([f"cat_{c}" for c in cluster], object),
        "title": np.asarray([f"{prefix} work package {c}" for c in cluster], object),
    }


# --- 2. offline ETL: fit stats/vocabs, transform, write parquet ------------
for name, cluster in (("notice", n_cluster), ("company", c_cluster)):
    manifest = run_pipeline(
        name,
        [raw_table(name, cluster)],
        workdir,
        pk_columns=["id"],
        numeric_columns=["price"],
        categorical_columns=["region", "category"],
        text_columns=["title"],
        numeric_configs={"price": {"fill": "median", "clip_percentiles": (1, 99), "scale": "zscore"}},
        text_embedder=HashTextEmbedder(64),  # swap for HFTextEmbedder() with a real model
    )
    print(f"ETL {name}: {manifest['rows']} rows, vocabs {manifest['categorical_input_dims']}")

# --- 3. feature stores + schema from the ETL outputs -----------------------
n_schema, n_store = feature_store_from_pipeline(workdir, "notice")
c_schema, c_store = feature_store_from_pipeline(workdir, "company")
schema = TwoTowerSchema(notice=n_schema, company=c_schema)

# positive pairs: same-cluster notice->company
pairs = np.asarray(
    [
        (ni, rng.choice(np.flatnonzero(c_cluster == n_cluster[ni])))
        for ni in range(n_rows)
    ],
    np.int64,
)
perm = rng.permutation(len(pairs))
n_val = 60 if FAST else 300
train_pairs, val_pairs = pairs[perm[n_val:]], pairs[perm[:n_val]]

# --- 4. train --------------------------------------------------------------
cfg = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=16,
        dense_projection_dim=32,
        tower_hidden_dims=(64, 32),
        final_embedding_dim=32,
        dropout_rate=0.0,
        compute_dtype="float32",
    ),
    loss=LossConfig(temperature=0.1),
    optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=2 if FAST else 6),
    data=DataConfig(batch_size=128),
    results_csv=str(workdir / "train_results.csv"),
)
trainer = Trainer(cfg, schema, n_store, c_store)
result = trainer.train(train_pairs, val_pairs, checkpoint_dir=workdir / "ckpt")

# --- 5. serve: int8 MIPS top-k over the company corpus ---------------------
svc = RetrievalService(trainer.model, cfg, result.state, c_store, index_kind="int8")
query = n_store.gather(val_pairs[:3, 0])
for q, hits in zip(val_pairs[:3, 0], svc.search_keys(query, k=5)):
    positive = c_store.keys[val_pairs[np.flatnonzero(val_pairs[:, 0] == q)[0], 1]]
    print(f"notice {n_store.keys[q]} (true match {positive}): top-5 {hits}")

print(f"done — checkpoints in {workdir / 'ckpt'}, ledger in {cfg.results_csv}")
