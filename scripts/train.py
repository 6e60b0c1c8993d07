#!/usr/bin/env python
"""Training CLI — the reference's single entry point, re-done typed.

Reference: scripts/train.py:78-134 (monolithic config dict + main()).
Here every hyperparameter lives in the typed TrainConfig (JSON-serializable);
the CLI overrides the common ones and supports --resume.

Data sources:
  --synthetic           planted-cluster synthetic dataset (hermetic)
  --data-dir DIR        parquet stores: notice.parquet / company.parquet /
                        pairs.parquet (+ schema.json)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", type=Path, help="TrainConfig JSON")
    p.add_argument("--synthetic", action="store_true", help="use synthetic dataset")
    p.add_argument(
        "--synthetic-scale",
        choices=["tiny", "bench"],
        default="tiny",
        help="--synthetic size: 'tiny' (10k rows/side, 50k pairs — fast "
        "smoke) or 'bench' (the headline-bench shape: reference-shaped "
        "schema, 100k rows/side, 400k pairs, 256 planted clusters — the "
        "configuration bench.py measures; scripts/train_headline.sh "
        "drives the committed hardware training artifact with it)",
    )
    p.add_argument("--data-dir", type=Path, help="parquet dataset directory")
    p.add_argument("--output-dir", type=Path, default=Path("output/models"))
    p.add_argument("--epochs", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--learning-rate", type=float)
    p.add_argument("--pair-limit", type=int)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--save-every-steps",
        type=int,
        help="mid-epoch preemption-safe checkpoints every N steps; "
        "--resume then restarts from the exact step (bit-identical)",
    )
    p.add_argument("--no-corpus-eval", action="store_true")
    p.add_argument(
        "--epoch-corpus-eval", action="store_true",
        help="run the corpus-retrieval eval (recall@10/@100, mrr) every "
        "epoch and stream it into the per-epoch history / --metrics-jsonl "
        "(device-resident, seconds per epoch); default: final epoch only",
    )
    p.add_argument(
        "--results-csv", type=Path,
        help="append per-run result rows here (TrainConfig.results_csv; "
        "default train_results.csv)",
    )
    p.add_argument(
        "--force-cpu", action="store_true",
        help="run on the CPU backend regardless of attached accelerators "
        "(control runs, e.g. the headline-artifact CPU-mesh control — "
        "scripts/train_headline.py); with --mesh-devices N also requests "
        "N virtual CPU devices",
    )
    p.add_argument("--seed", type=int)
    p.add_argument(
        "--stream",
        action="store_true",
        help="stream pairs.parquet in chunks instead of loading all pairs "
        "(for pair sets larger than host memory); val pairs still load",
    )
    p.add_argument(
        "--sample-on-device",
        action="store_true",
        help="draw batches ON DEVICE, IID with replacement, from the "
        "HBM-resident pair set (one PRNG key per dispatch instead of an "
        "index stack) — the headline-bench configuration (bench.py, "
        "2.3 ms/step at B=8192 vs 3.2 host-fed). Epochs are "
        "steps_per_epoch IID draws rather than a without-replacement "
        "permutation pass. Works single-device and with --mesh-devices "
        "(global batch sampled on-mesh); incompatible with --stream",
    )
    p.add_argument(
        "--metrics-jsonl",
        type=Path,
        help="stream structured per-epoch metrics to this JSONL file "
        "(utils/profiling.MetricsLogger) in addition to the results CSV",
    )
    p.add_argument(
        "--fused-logits",
        choices=["auto", "on", "off"],
        help="fused Pallas CE loss kernels (ops/fused_logits.py): 'auto' "
        "(default) uses them on TPU for cross_entropy — measured 10.3x the "
        "materializing XLA loss at B=8192 and the only runnable form at "
        "global B>=32768; 'off' forces the XLA path (per-step in-batch "
        "metrics from the materialized [B,B]); 'on' forces the kernels "
        "(shapes beyond the envelope still fall back to XLA)",
    )
    p.add_argument(
        "--compressed-negatives",
        choices=["local", "global"],
        help="in-batch-negatives scope under --grad-compression: 'local' "
        "(default) is the reference's per-GPU semantics (zero extra "
        "wire); 'global' keeps the flagship full-global-batch candidate "
        "set via the manual fused CE inside the compressed step (adds a "
        "[B, D] all-gather per fwd+bwd — ~4 MB/step at the flagship, "
        "against the 5.8 MB int16 compression saves)",
    )
    p.add_argument(
        "--dropout-rng",
        choices=["auto", "threefry", "rbg"],
        help="PRNG impl for dropout masks (ModelConfig.dropout_rng_impl): "
        "'auto' (default) uses the TPU hardware RngBitGenerator on TPU "
        "(measured 0.23 ms/step cheaper than threefry at B=8192) and "
        "threefry elsewhere; literals force one impl (bit-reproducible "
        "runs within an impl either way)",
    )
    p.add_argument(
        "--mesh-devices",
        type=int,
        help="train over an N-device mesh (tables row-sharded, batch dim "
        "sharded, global in-batch negatives); default: single device",
    )
    p.add_argument(
        "--store-sharding",
        choices=["replicated", "rows"],
        help="device-resident feature-store placement under --mesh-devices: "
        "'rows' shards the dense/cat matrices so each chip holds 1/N "
        "(for corpora whose features exceed one chip's HBM); default "
        "replicated",
    )
    p.add_argument(
        "--grad-compression",
        choices=["none", "int16", "bf16"],
        help="compressed dense-gradient all-reduce with error feedback "
        "under --mesh-devices (parallel/compressed_grads.py) — for DP "
        "whose gradient sync rides a slow interconnect (multi-host DCN): "
        "2 B/elem on the wire vs f32's 4. Switches the loss to LOCAL "
        "in-batch negatives per shard (the reference's per-GPU "
        "semantics); default none (global negatives, GSPMD sync)",
    )
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    if args.force_cpu:
        # must precede backend init; the sandbox pins jax_platforms via
        # sitecustomize, so the live config (not the env var) is the lever
        # (same dance as __graft_entry__._ensure_devices)
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        n = args.mesh_devices or 1
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
        import jax
        from jax._src import xla_bridge

        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            # never run a "CPU control" silently on the accelerator — the
            # headline artifact's cross-backend comparison would become
            # chip-vs-chip and pass vacuously (review finding, round 5)
            raise SystemExit(
                "--force-cpu could not take effect (JAX backend already "
                f"initialized as {jax.default_backend()!r}); run in a fresh "
                "process"
            )

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.train.trainer import Trainer

    cfg = TrainConfig.from_json(args.config) if args.config else TrainConfig()
    import dataclasses
    if args.epochs is not None:
        cfg = cfg.replace(optimizer=dataclasses.replace(cfg.optimizer, num_epochs=args.epochs))
    if args.batch_size is not None:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=args.batch_size))
    if args.learning_rate is not None:
        cfg = cfg.replace(optimizer=dataclasses.replace(cfg.optimizer, learning_rate=args.learning_rate))
    if args.pair_limit is not None:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, pair_limit=args.pair_limit))
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    if args.save_every_steps is not None:
        cfg = cfg.replace(
            checkpoint=dataclasses.replace(cfg.checkpoint, save_every_steps=args.save_every_steps)
        )
    if args.sample_on_device:
        if args.stream:
            raise SystemExit(
                "--sample-on-device needs the whole pair set device-resident; "
                "it is incompatible with --stream"
            )
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, sample_on_device=True))
    if args.metrics_jsonl:
        cfg = cfg.replace(metrics_jsonl=str(args.metrics_jsonl))
    if args.results_csv:
        cfg = cfg.replace(results_csv=str(args.results_csv))
    if args.fused_logits:
        resolved = {"auto": "auto", "on": True, "off": False}[args.fused_logits]
        cfg = cfg.replace(
            loss=dataclasses.replace(cfg.loss, use_fused_logits=resolved)
        )
    if args.compressed_negatives:
        if args.compressed_negatives != "local" and not args.grad_compression:
            raise SystemExit("--compressed-negatives requires --grad-compression")
        cfg = cfg.replace(
            mesh=dataclasses.replace(
                cfg.mesh, compressed_negatives=args.compressed_negatives
            )
        )
    if args.dropout_rng:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, dropout_rng_impl=args.dropout_rng)
        )
    if args.store_sharding:
        if not args.mesh_devices:
            raise SystemExit("--store-sharding requires --mesh-devices")
        cfg = cfg.replace(
            mesh=dataclasses.replace(cfg.mesh, store_sharding=args.store_sharding)
        )
    if args.grad_compression:
        if not args.mesh_devices and args.grad_compression != "none":
            raise SystemExit("--grad-compression requires --mesh-devices")
        cfg = cfg.replace(
            mesh=dataclasses.replace(
                cfg.mesh, grad_compression=args.grad_compression
            )
        )

    if args.synthetic or not args.data_dir:
        from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset

        if args.synthetic_scale == "bench":
            from jodalrob_twotower_tpu.schema import reference_shaped_schema

            print("data: synthetic planted-cluster dataset (bench scale)")
            ds = make_synthetic_dataset(
                reference_shaped_schema(),
                n_notices=100_000, n_companies=100_000, n_pairs=400_000,
                n_clusters=256, seed=cfg.seed,
            )
        else:
            print("data: synthetic planted-cluster dataset")
            ds = make_synthetic_dataset(seed=cfg.seed)
        schema = ds.schema
        notice_store, company_store, pairs = ds.notice_store, ds.company_store, ds.pairs
    else:
        from jodalrob_twotower_tpu.data.feature_store import FeatureStore
        from jodalrob_twotower_tpu.data.parquet_dataset import load_pairs_parquet
        from jodalrob_twotower_tpu.schema import TwoTowerSchema

        schema = TwoTowerSchema.from_json(args.data_dir / "schema.json")
        notice_store = FeatureStore.from_parquet(schema.notice, args.data_dir / "notice.parquet")
        company_store = FeatureStore.from_parquet(schema.company, args.data_dir / "company.parquet")
        pairs = load_pairs_parquet(
            args.data_dir / "pairs.parquet", notice_store, company_store
        )
        print(f"data: {args.data_dir} ({len(pairs):,} pairs)")

    if cfg.data.pair_limit:
        pairs = pairs[: cfg.data.pair_limit]
    rng = np.random.default_rng(cfg.data.shuffle_seed)
    perm = rng.permutation(len(pairs))
    n_test = int(round(len(pairs) * cfg.data.test_split))
    train_pairs, val_pairs = pairs[perm[n_test:]], pairs[perm[:n_test]]
    print(f"pairs: {len(train_pairs):,} train / {len(val_pairs):,} val")

    mesh = None
    if args.mesh_devices:
        import jax

        from jodalrob_twotower_tpu.parallel.mesh import make_mesh

        avail = jax.devices()
        if len(avail) < args.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} but only {len(avail)} device(s) "
                f"available ({avail[0].platform}) — a silently smaller mesh would "
                "train unsharded while claiming otherwise"
            )
        mesh = make_mesh(avail[: args.mesh_devices])
        print(f"mesh: {args.mesh_devices} devices (tables row-sharded)")
    trainer = Trainer(cfg, schema, notice_store, company_store, mesh=mesh)
    if args.stream and args.data_dir:
        # NOTE: --stream re-reads the full pairs file per epoch; the split
        # above only carves out validation pairs. Training still sees val
        # rows in this mode - acceptable for the huge-pairs regime it serves.
        result = trainer.train_streaming(
            args.data_dir / "pairs.parquet",
            val_pairs,
            steps_per_epoch=max(len(pairs) // cfg.data.batch_size, 1),
            chunk_rows=cfg.data.chunk_size,
            checkpoint_dir=args.output_dir,
            resume=args.resume,
            corpus_eval=not args.no_corpus_eval,
        )
    else:
        result = trainer.train(
            train_pairs,
            val_pairs,
            checkpoint_dir=args.output_dir,
            resume=args.resume,
            corpus_eval=not args.no_corpus_eval,
            epoch_corpus_eval=args.epoch_corpus_eval,
        )
    print(f"done: {result.examples_per_sec:,.0f} examples/s, results appended to {cfg.results_csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
