#!/usr/bin/env python
"""Standalone evaluation CLI: restore a trained model, score it.

The reference only ran evaluation inside the training loop
(TwoTowerEvaluator.evaluate_comprehensive, SURVEY.md §3.4); this driver
makes it a first-class entry point: in-batch metric surface (accuracy,
recall@k, MRR, AUC, similarity gap) with random baselines and the
qualitative verdict, plus corpus-level retrieval recall@k/MRR (every
query's positive ranked against the FULL candidate corpus), plus an
optional top-k prediction demo — one JSON document out.

Examples:
  python scripts/train.py --data-dir ds/ --output-dir runs/exp1
  python scripts/eval.py --model-dir runs/exp1 --data-dir ds/ --output eval.json
  python scripts/eval.py --model-dir runs/exp1 --synthetic --demo-queries 3
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=Path, required=True,
                   help="Trainer output dir (config.json + weights/)")
    p.add_argument("--data-dir", type=Path, help="parquet dataset directory")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--batch-size", type=int, help="eval batch size (default: train config)")
    p.add_argument("--pair-limit", type=int, help="evaluate at most N validation pairs")
    p.add_argument("--ks", default="10,100", help="corpus recall@k values, comma-separated")
    p.add_argument("--no-corpus-eval", action="store_true")
    p.add_argument("--demo-queries", type=int, default=0,
                   help="show top-10 predictions for the first N validation queries")
    p.add_argument("--output", type=Path, help="write the JSON report here (default: stdout)")
    p.add_argument("--host-eval", action="store_true",
                   help="assemble eval batches on the host instead of "
                   "placing the feature stores in HBM (device-resident "
                   "eval is the default: indices-only H2D; opt out when "
                   "the stores exceed device memory)")
    p.add_argument("--mesh-devices", type=int,
                   help="evaluate over an N-device mesh (state replicated; "
                   "stores placed per --store-sharding)")
    p.add_argument("--store-sharding", choices=["replicated", "rows"],
                   help="with --mesh-devices: 'rows' shards the feature "
                   "stores so each chip holds 1/N (eval batch assembly "
                   "goes through the explicit cross-shard exchange) — for "
                   "stores that exceed one chip's HBM")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.evaluation.evaluator import (
        Evaluator,
        corpus_retrieval_eval,
        demonstrate_predictions,
        qualitative_assessment,
    )
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.serving.service import FrozenState
    from jodalrob_twotower_tpu.train.checkpoint import CheckpointManager
    from jodalrob_twotower_tpu.train.metrics import random_baselines

    cfg = TrainConfig.from_json(args.model_dir / "config.json")

    if args.synthetic or not args.data_dir:
        from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(seed=cfg.seed)
        schema, notice_store, company_store, pairs = (
            ds.schema, ds.notice_store, ds.company_store, ds.pairs)
    else:
        from jodalrob_twotower_tpu.data.feature_store import FeatureStore
        from jodalrob_twotower_tpu.data.parquet_dataset import load_pairs_parquet
        from jodalrob_twotower_tpu.schema import TwoTowerSchema

        schema = TwoTowerSchema.from_json(args.data_dir / "schema.json")
        notice_store = FeatureStore.from_parquet(schema.notice, args.data_dir / "notice.parquet")
        company_store = FeatureStore.from_parquet(schema.company, args.data_dir / "company.parquet")
        pairs = load_pairs_parquet(args.data_dir / "pairs.parquet", notice_store, company_store)

    # the SAME validation split the Trainer carved out: pair_limit truncation
    # FIRST, then the seeded permutation (scripts/train.py order) — permuting
    # the untruncated list would select a different, train-overlapping set
    if cfg.data.pair_limit:
        pairs = pairs[: cfg.data.pair_limit]
    rng = np.random.default_rng(cfg.data.shuffle_seed)
    perm = rng.permutation(len(pairs))
    n_test = int(round(len(pairs) * cfg.data.test_split))
    val_pairs = pairs[perm[:n_test]] if n_test else pairs
    if args.pair_limit:
        val_pairs = val_pairs[: args.pair_limit]
    b = args.batch_size or cfg.data.batch_size
    print(f"eval: {len(val_pairs):,} validation pairs, batch {b}", file=sys.stderr)

    mesh = None
    put_idx = None
    store_gather = None
    if args.mesh_devices:
        import dataclasses

        from jodalrob_twotower_tpu.parallel.mesh import make_mesh

        avail = jax.devices()
        if len(avail) < args.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} but only {len(avail)} "
                "device(s) available"
            )
        if args.store_sharding:
            cfg = cfg.replace(
                mesh=dataclasses.replace(cfg.mesh, store_sharding=args.store_sharding)
            )
        mesh = make_mesh(avail[: args.mesh_devices])
    elif args.store_sharding:
        raise SystemExit("--store-sharding requires --mesh-devices")

    model = build_model(schema, cfg, mesh)
    rows = np.arange(min(8, len(notice_store)))
    example = assemble_pair_batch(notice_store, company_store, np.stack([rows, rows], 1))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    ckpt = CheckpointManager(args.model_dir, cfg.checkpoint)
    restored = ckpt.restore_weights(variables["params"], variables.get("batch_stats", {}))
    state = FrozenState(**restored)
    if mesh is not None:
        from jodalrob_twotower_tpu.parallel.mesh import replicated

        rep = replicated(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        put_idx = lambda x: jax.device_put(x, rep)  # noqa: E731

    evaluator = Evaluator(model, cfg)

    dev_stores = None
    if not args.host_eval:
        from jodalrob_twotower_tpu.train.train_step import (
            device_store,
            resolve_store_dtype,
        )

        # honor the config's store dtype (bf16 halves H2D + HBM for
        # bf16-compute checkpoints — exactly the big-store case the
        # device default targets)
        store_dt = resolve_store_dtype(cfg)
        if mesh is not None:
            from jodalrob_twotower_tpu.parallel.sharded_store import (
                make_tower_batch_gather,
                resolve_store_placement,
            )

            _, _, put_store = resolve_store_placement(cfg, mesh)

            def _host(fs):
                dense = np.asarray(fs.dense)
                if store_dt is not None:
                    dense = dense.astype(store_dt)
                return (dense, np.asarray(fs.cat_ids))

            dev_stores = (put_store(_host(notice_store)),
                          put_store(_host(company_store)))
            if cfg.mesh.store_sharding == "rows":
                store_gather = make_tower_batch_gather(mesh)
        else:
            dev_stores = (
                device_store(notice_store, dtype=store_dt),
                device_store(company_store, dtype=store_dt),
            )

    def batches():
        for start in range(0, len(val_pairs) - b + 1, b):
            yield assemble_pair_batch(
                notice_store, company_store, val_pairs[start : start + b]
            )

    report: dict = {"model_dir": str(args.model_dir), "num_val_pairs": int(len(val_pairs))}
    if dev_stores is not None and len(val_pairs) >= b:
        metrics = evaluator.evaluate_indexed(
            state, val_pairs, dev_stores[0], dev_stores[1], batch_size=b,
            put_idx=put_idx, store_gather=store_gather,
        )
    else:
        metrics = evaluator.evaluate(state, batches())
    report["in_batch"] = {k: round(v, 6) for k, v in metrics.items()}
    report["random_baselines"] = {k: round(v, 6) for k, v in random_baselines(b).items()}
    report["assessment"] = qualitative_assessment(metrics, b)

    if not args.no_corpus_eval and len(val_pairs):
        ks = tuple(int(k) for k in args.ks.split(","))
        if dev_stores is not None:
            corpus_emb = evaluator.encode_corpus_device(
                state, dev_stores[1], len(company_store), side="company",
                store_gather=store_gather)
        else:
            corpus_emb = evaluator.encode_corpus(
                state, company_store.dense, company_store.cat_ids, side="company")
        query_emb = evaluator.encode_corpus(
            state, notice_store.dense[val_pairs[:, 0]],
            notice_store.cat_ids[val_pairs[:, 0]], side="notice")
        res = corpus_retrieval_eval(query_emb, corpus_emb, val_pairs[:, 1], ks=ks)
        report["corpus"] = {
            "corpus_size": res.corpus_size,
            "num_queries": res.num_queries,
            "mrr": round(res.mrr, 6),
            **{f"recall@{k}": round(v, 6) for k, v in res.recall.items()},
        }

        if args.demo_queries:
            n = min(args.demo_queries, len(val_pairs))
            report["demo"] = demonstrate_predictions(
                query_emb[:n], corpus_emb, k=10,
                query_keys=notice_store.keys[val_pairs[:n, 0]],
                corpus_keys=company_store.keys,
            )

    text = json.dumps(report, indent=2)
    if args.output:
        args.output.write_text(text)
        print(f"report: {args.output}", file=sys.stderr)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
