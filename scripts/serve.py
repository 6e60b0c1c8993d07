"""Serving CLI: frozen towers -> corpus MIPS index -> top-k retrieval.

The end-to-end serving entry point the reference never had (SURVEY.md §3.5:
single-side encoders existed "for serving/index building" but no index or
serving loop). Loads a Trainer output directory (config.json + the
weights-only checkpoint), encodes the company corpus, builds (or loads) an
exact/int8 index, and answers notice queries with top-k company keys.

Examples:
  # train, then serve the first 100 notices against the company corpus
  python scripts/train.py --data-dir ds/ --output-dir runs/exp1
  python scripts/serve.py --model-dir runs/exp1 --data-dir ds/ \
      --index int8 --k 10 --queries 100 --output results.jsonl

  # persist the built index; later serve without re-encoding the corpus
  python scripts/serve.py --model-dir runs/exp1 --data-dir ds/ \
      --index int8 --save-index runs/exp1/company.idx.npz
  python scripts/serve.py --model-dir runs/exp1 --data-dir ds/ \
      --load-index runs/exp1/company.idx.npz --qps-bench
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
    p.add_argument("--index", choices=["exact", "int8"], default="int8")
    p.add_argument("--corpus-chunk", type=int,
                   help="scan the corpus in chunks of this many rows "
                   "(required memory-wise for multi-million-row corpora)")
    p.add_argument("--approx-recall", type=float,
                   help="use approx_max_k candidate selection with this "
                   "recall target (fast path for big corpora)")
    p.add_argument("--rescore-depth", type=int,
                   help="two-stage search: over-fetch this many candidates, "
                        "then re-rank them with exact dots (recovers recall "
                        "lost to --approx-recall / int8 quantization)")
    p.add_argument("--rescore-dtype", choices=["int8", "bfloat16"],
                   default="int8",
                   help="second-pass precision: int8 = memory-free "
                        "(dequantized rows), bfloat16 = keeps a "
                        "full-precision copy for near-exact final scores")
    p.add_argument("--target-recall", type=float,
                   help="pick (index kind, approx-recall, rescore-depth) "
                        "automatically from the measured QPS/recall frontier "
                        "(serving/autoconfig.py): the fastest configuration "
                        "whose measured recall@100 vs exact meets this "
                        "target. Mutually exclusive with the manual "
                        "--index/--approx-recall/--rescore-depth knobs")
    p.add_argument("--mesh-devices", type=int,
                   help="serve over an N-device mesh (serving/index.py "
                        "ShardedIndex): the corpus is row-sharded so each "
                        "chip scores its shard and only the per-device "
                        "top-k candidates ride the ICI — for corpora "
                        "beyond one chip's HBM. Composes with --index "
                        "exact/int8, --approx-recall and --rescore-depth; "
                        "not with --corpus-chunk / --load-index / "
                        "--save-index / --target-recall")
    p.add_argument("--save-index", type=Path, help="persist the built index (npz)")
    p.add_argument("--load-index", type=Path, help="serve a persisted index")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--queries", type=int, default=0,
                   help="serve the first N notices (0 = skip query demo)")
    p.add_argument("--output", type=Path, help="write results JSONL here")
    p.add_argument("--qps-bench", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    if args.mesh_devices:
        incompatible = [
            name for name, val in (
                ("--corpus-chunk", args.corpus_chunk),
                ("--load-index", args.load_index),
                ("--save-index", args.save_index),
                ("--target-recall", args.target_recall),
            ) if val is not None
        ]
        if incompatible:
            raise SystemExit(
                f"--mesh-devices cannot be combined with "
                f"{', '.join(incompatible)}: the sharded index bounds "
                "per-chip memory by the shard (not --corpus-chunk), is not "
                "persistable as a single-host npz, and the measured "
                "auto-config calibrates single-device indexes — pick the "
                "index knobs explicitly for mesh serving"
            )

    if args.target_recall is not None:
        manual = [
            name for name, val, default in (
                ("--index", args.index, "int8"),
                ("--approx-recall", args.approx_recall, None),
                ("--rescore-depth", args.rescore_depth, None),
                ("--rescore-dtype", args.rescore_dtype, "int8"),
            ) if val != default
        ]
        if manual or args.load_index:
            raise SystemExit(
                "--target-recall picks the index configuration itself; drop "
                + ", ".join(manual or ["--load-index"])
            )
        # the actual selection is MEASURED against the built corpus below
        # (serving/autoconfig.calibrate_serving_config) — the hardcoded
        # frontier supplies only the candidate ordering

    import jax

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.serving.index import load_index, save_index
    from jodalrob_twotower_tpu.serving.service import (
        FrozenState,
        RetrievalService,
        qps_bench,
    )
    from jodalrob_twotower_tpu.train.checkpoint import CheckpointManager

    cfg = TrainConfig.from_json(args.model_dir / "config.json")

    if args.synthetic or not args.data_dir:
        from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset

        ds = make_synthetic_dataset(seed=cfg.seed)
        schema, notice_store, company_store = ds.schema, ds.notice_store, ds.company_store
    else:
        from jodalrob_twotower_tpu.data.feature_store import FeatureStore
        from jodalrob_twotower_tpu.schema import TwoTowerSchema

        schema = TwoTowerSchema.from_json(args.data_dir / "schema.json")
        notice_store = FeatureStore.from_parquet(schema.notice, args.data_dir / "notice.parquet")
        company_store = FeatureStore.from_parquet(schema.company, args.data_dir / "company.parquet")

    # weights-only restore: init templates, then load the export
    model = build_model(schema, cfg, None)
    rows = np.arange(min(8, len(notice_store)))
    example = assemble_pair_batch(notice_store, company_store, np.stack([rows, rows], 1))
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    ckpt = CheckpointManager(args.model_dir, cfg.checkpoint)
    restored = ckpt.restore_weights(
        variables["params"], variables.get("batch_stats", {})
    )
    state = FrozenState(**restored)

    precomputed_emb = None
    if args.target_recall is not None:
        from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
        from jodalrob_twotower_tpu.serving.autoconfig import (
            calibrate_serving_config,
        )

        ev = Evaluator(model, cfg)
        # encode ONCE; the service below reuses these embeddings. Above
        # ~1 GB the corpus moves to HOST for calibration: a resident f32
        # corpus beside any index copy OOMs HBM at 10M x 128 (BENCHMARKS.md
        # round 5) — from host, candidates upload only their int8/bf16
        # representations and the exact reference streams the scan. Small
        # corpora stay device-resident (no D2H round-trip).
        precomputed_emb = ev.encode_corpus(
            state, company_store.dense, company_store.cat_ids, side="company"
        )
        if precomputed_emb.size * 4 > (1 << 30):
            precomputed_emb = np.asarray(precomputed_emb)
        rng = np.random.default_rng(0)
        n_sample = min(2048, len(notice_store))
        rows = np.sort(rng.choice(len(notice_store), size=n_sample,
                                  replace=False))
        query_emb = ev.encode_corpus(
            state, notice_store.dense[rows], notice_store.cat_ids[rows],
            side="notice",
        )
        chosen, measured = calibrate_serving_config(
            args.target_recall, precomputed_emb, query_emb, k=args.k,
            corpus_chunk=args.corpus_chunk,
        )
        args.index = chosen.index_kind
        args.approx_recall = chosen.approx_recall
        args.rescore_depth = chosen.rescore_depth
        args.rescore_dtype = chosen.rescore_dtype
        print(
            f"auto-config for recall>={args.target_recall} (measured on "
            f"{len(company_store):,} corpus rows, {n_sample} sample "
            f"queries, k={args.k}): {chosen.note} — measured recall@{args.k} "
            + ", ".join(f"{n}: {r:.4f}" for n, r in measured.items())
            + "; equivalent to " + " ".join(chosen.cli_flags()),
            file=sys.stderr,
        )

    prebuilt = load_index(args.load_index) if args.load_index else None
    if prebuilt is not None:
        # a loaded index keeps its saved settings; accepting these flags
        # alongside --load-index would silently do nothing
        ignored = [
            name for name, val, default in (
                ("--index", args.index, "int8"),  # parse_args defaults
                ("--corpus-chunk", args.corpus_chunk, None),
                ("--approx-recall", args.approx_recall, None),
                ("--rescore-depth", args.rescore_depth, None),
                ("--rescore-dtype", args.rescore_dtype, "int8"),
            ) if val != default
        ]
        if ignored:
            raise SystemExit(
                f"{', '.join(ignored)} cannot be combined with --load-index: a "
                "persisted index keeps the settings it was built with — rebuild "
                "without --load-index to change them"
            )
    mesh = None
    if args.mesh_devices:
        from jodalrob_twotower_tpu.parallel.mesh import make_mesh

        avail = jax.devices()
        if len(avail) < args.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} but only {len(avail)} "
                f"device(s) available ({avail[0].platform})"
            )
        mesh = make_mesh(avail[: args.mesh_devices])
        print(f"mesh: {args.mesh_devices} devices (corpus row-sharded)",
              file=sys.stderr)
    svc = RetrievalService(
        model, cfg, state, company_store,
        index_kind=args.index,
        corpus_chunk=args.corpus_chunk,
        approx_recall=args.approx_recall,
        rescore_depth=args.rescore_depth,
        rescore_dtype=args.rescore_dtype,
        mesh=mesh,
        precomputed_corpus_emb=precomputed_emb,
        prebuilt_index=prebuilt,
    )
    print(f"index: {args.index if prebuilt is None else 'loaded'} over "
          f"{len(svc.index):,} companies", file=sys.stderr)

    if args.save_index:
        save_index(svc.index, args.save_index)
        print(f"index saved: {args.save_index}", file=sys.stderr)

    if args.queries:
        n = min(args.queries, len(notice_store))
        out = args.output.open("w") if args.output else sys.stdout
        for start in range(0, n, 1024):
            rows = np.arange(start, min(start + 1024, n))
            batch = notice_store.gather(rows)
            for qi, hits in zip(rows, svc.search_keys(batch, k=args.k)):
                out.write(json.dumps({
                    "notice": str(notice_store.keys[qi]),
                    "top_k": [{"company": key, "score": round(s, 6)} for key, s in hits],
                }) + "\n")
        if args.output:
            out.close()
            print(f"results: {args.output} ({n} queries)", file=sys.stderr)

    if args.qps_bench:
        res = qps_bench(svc, notice_store, k=args.k, batch_size=1024,
                        n_batches=10)
        print(json.dumps({"bench": "serve_cli_qps", **{
            k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()
        }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
