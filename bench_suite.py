"""Extended benchmark suite — one JSON object per line, all subsystems.

`bench.py` stays the single headline line the driver records; this suite
adds the other BASELINE.json configs as evidence:

  train_hostfed                — headline model, host-fed index stream
  train_hostfed_features       — FULL host feature assembly + H2D streaming
                                 (names the link-bound floor the index-fed
                                 design avoids)
  train_scaled                 — BASELINE config 3: 10M-row tables (dim 64),
                                 batch 8192, dense-path rowwise Adagrad
  train_scaled_sparse          — same, O(batch) sparse-table updates
  train_scaled_sparse_deferred — same, one batched update per scan window
  sparse_dedup_convergence     — exact vs per_occurrence duplicate handling
                                 A/B (same init/batches) at 1.25M + 8k vocabs
  serving_exact                — brute-force MIPS QPS over 100k corpus, k=100
  serving_int8                 — int8 MIPS QPS + recall vs exact
  serving_int8_10m             — BASELINE config 5: 10M-row int8 corpus
  serving_sharded_mesh         — ShardedIndex on the 8-virtual-device mesh
  fused_ce_paths               — XLA vs fused vs shard_mapped-fused loss+grads
  fused_ce_paths_b16384/_b32768 — same beyond the VMEM-resident cap (the
                                 col-blocked kernels; no XLA control at 32768
                                 where the [B,B] blob would not fit)
  corpus_eval                  — corpus recall@k evaluation wall time

Usage: python bench_suite.py [names...]   (default: all)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _emit(name: str, **fields) -> None:
    print(json.dumps({"bench": name, **fields}), flush=True)


def train_scaled(sparse: bool = False, deferred: bool = False,
                 dedup: str = "exact", sampled: bool = False) -> None:
    """Scaled tables: 8 features x 1.25M vocab = 10M rows, dim 64.

    ``deferred``: sparse path with one batched table update per 8-step scan
    window (train/sparse_tables.py make_deferred_sparse_steps) — amortizes
    the scatter that dominates the per-step sparse step. ``dedup``:
    sparse_duplicate_handling — "exact" (default semantics) pays a
    segment-sum pass over the window's cotangents; "per_occurrence" skips
    it (exact only on duplicate-free batches; at 10M-row vocabs ~1.7% of a
    window's ids collide). ``sampled``: the MESH sampled-sparse path
    (parallel/sharded_sparse.make_sharded_sampled_sparse, VERDICT r3 #3)
    on a 1-device mesh — on-device batch draws, ONE PRNG key per 8-step
    dispatch instead of a [8, B, 2] index stack (the config that stays
    immune to tunnel H2D congestion at the 10M-vocab scale)."""
    import jax

    from jodalrob_twotower_tpu.config import (
        LossConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.schema import (
        CategoricalSpec,
        NumericSpec,
        SideSchema,
        TwoTowerSchema,
    )
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state,
        device_store,
        make_indexed_train_step,
    )

    vocab = 1_250_000
    def side(table, pk):
        return SideSchema(
            table=table,
            pk=pk,
            numeric=tuple(NumericSpec(f"n{i}") for i in range(16)),
            categorical=tuple(CategoricalSpec(f"c{i}", vocab) for i in range(8)),
        )

    schema = TwoTowerSchema(notice=side("notice", ("id",)), company=side("company", ("id",)))
    cfg = TrainConfig(
        model=ModelConfig(categorical_embedding_dim=64, dense_projection_dim=128,
                          tower_hidden_dims=(512, 256), final_embedding_dim=128),
        loss=LossConfig(use_fused_logits=True),
        # rowwise adagrad on the tables; dedup per the bench variant
        optimizer=OptimizerConfig(sparse_duplicate_handling=dedup),
    )
    b = 8192
    n_rows = 200_000
    ds = make_synthetic_dataset(
        schema, n_notices=n_rows, n_companies=n_rows, n_pairs=2 * b, n_clusters=64, seed=0
    )
    # ids must span the 1.25M vocab (synthetic generator stays in-cluster):
    rng = np.random.default_rng(0)
    ds.notice_store.cat_ids[:] = rng.integers(0, vocab, ds.notice_store.cat_ids.shape)
    ds.company_store.cat_ids[:] = rng.integers(0, vocab, ds.company_store.cat_ids.shape)

    model = TwoTowerModel(schema, cfg.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    if sparse:
        from jodalrob_twotower_tpu.train.sparse_tables import (
            create_sparse_train_state,
            make_deferred_sparse_steps,
            make_sparse_train_step,
        )

        if sampled:
            from jodalrob_twotower_tpu.parallel.mesh import make_mesh
            from jodalrob_twotower_tpu.parallel.sharded_sparse import (
                make_sharded_sampled_sparse,
                make_sharded_sparse_train,
            )

            mesh = make_mesh(jax.devices()[:1])
            state_m, _, _, put_store = make_sharded_sparse_train(
                model, cfg, mesh, warm, 100
            )
            table_rows = state_m.notice_table.table.shape[0]
            W = 8
            steps, put_pairs = make_sharded_sampled_sparse(
                model, cfg, mesh, state_m, W, b, 100, defer_updates=deferred
            )
            n_store = put_store((ds.notice_store.dense, ds.notice_store.cat_ids))
            c_store = put_store((ds.company_store.dense, ds.company_store.cat_ids))
            pairs_dev = put_pairs(ds.pairs.astype(np.int32))
            key = jax.random.PRNGKey(0)
            state_m, m = steps(state_m, key, pairs_dev, n_store, c_store)
            float(np.asarray(m["loss"])[-1])  # compile + settle
            t0 = time.perf_counter()
            n_disp = 5
            for i in range(n_disp):
                state_m, m = steps(
                    state_m, jax.random.fold_in(key, i), pairs_dev,
                    n_store, c_store,
                )
            float(np.asarray(m["loss"])[-1])
            dt = (time.perf_counter() - t0) / (n_disp * W)
            _emit(
                "train_scaled_sparse_sampled"
                + ("_deferred" if deferred else ""),
                examples_per_sec=round(b / dt, 1),
                step_ms=round(dt * 1e3, 2),
                window=W,
                dedup=dedup,
                table_rows_per_tower=int(table_rows),
                embedding_params=int(2 * table_rows * 64),
                batch=b,
            )
            return

        state, tx = create_sparse_train_state(model, cfg, jax.random.PRNGKey(0), warm, 100)
        table_rows = state.notice_table.table.shape[0]
        if deferred:
            W = 8
            steps_fn = make_deferred_sparse_steps(model, cfg, tx, 100, W)
            n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
            idx = jax.device_put(
                ds.pairs[rng.integers(0, 2 * b, size=(W, b))].astype(np.int32)
            )
            state, m = steps_fn(state, idx, n_store, c_store)
            float(m["loss"][-1])
            t0 = time.perf_counter()
            n_disp = 5
            for _ in range(n_disp):
                state, m = steps_fn(state, idx, n_store, c_store)
            float(m["loss"][-1])
            dt = (time.perf_counter() - t0) / (n_disp * W)
            _emit(
                "train_scaled_sparse_deferred"
                + ("" if dedup == "exact" else f"_{dedup}"),
                examples_per_sec=round(b / dt, 1),
                step_ms=round(dt * 1e3, 2),
                window=W,
                dedup=dedup,
                table_rows_per_tower=int(table_rows),
                embedding_params=int(2 * table_rows * 64),
                batch=b,
            )
            return
        step = make_sparse_train_step(model, cfg, tx, 100, with_metrics=False)
    else:
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 100)
        table_rows = state.params["notice_tower"]["embeddings"]["table"].shape[0]
        step = make_indexed_train_step(model, cfg, tx, with_metrics=False)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    idxs = [
        jax.device_put(ds.pairs[rng.integers(0, 2 * b, size=b)].astype(np.int32))
        for _ in range(8)
    ]
    state, m = step(state, idxs[0], n_store, c_store)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 30
    for i in range(n):
        state, m = step(state, idxs[i % 8], n_store, c_store)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    _emit(
        "train_scaled_sparse" if sparse else "train_scaled",
        examples_per_sec=round(b / dt, 1),
        step_ms=round(dt * 1e3, 2),
        table_rows_per_tower=int(table_rows),
        embedding_params=int(2 * table_rows * 64),
        batch=b,
    )


def sparse_dedup_convergence(n_steps: int = 150) -> None:
    """Convergence A/B of sparse_duplicate_handling on the real chip:
    "exact" (segment-sum per unique row == dense autodiff semantics,
    src/towers/cat_embed.py:156-178) vs "per_occurrence" (each duplicate
    occurrence hits the Adagrad accumulator separately). Same init, same
    batch sequence, two vocab scales:

      - vocab 1.25M/feature (BASELINE config 3): ~1.7% of a batch's ids
        collide — per_occurrence should track exact closely (why it is a
        safe documented opt-out for deferred huge-vocab training).
      - vocab 8k/feature: most rows are hit multiple times per batch —
        the semantic drift becomes visible (why exact is the default).

    Emits final-20-step mean loss + last-step in-batch accuracy per mode."""
    import dataclasses

    import jax

    from jodalrob_twotower_tpu.config import (
        LossConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch, index_stacks
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.schema import (
        CategoricalSpec,
        NumericSpec,
        SideSchema,
        TwoTowerSchema,
    )
    from jodalrob_twotower_tpu.train.sparse_tables import (
        create_sparse_train_state,
        make_scanned_sparse_steps,
        make_sparse_train_step,
    )
    from jodalrob_twotower_tpu.train.train_step import device_store

    b, n_inner = 8192, 8

    for vocab in (1_250_000, 8_192):
        def side(table):
            return SideSchema(
                table=table,
                pk=("id",),
                numeric=tuple(NumericSpec(f"n{i}") for i in range(16)),
                categorical=tuple(CategoricalSpec(f"c{i}", vocab) for i in range(8)),
            )

        schema = TwoTowerSchema(notice=side("notice"), company=side("company"))
        ds = make_synthetic_dataset(
            schema, n_notices=100_000, n_companies=100_000,
            n_pairs=4 * b, n_clusters=64, seed=0,
        )
        n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
        warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])

        results = {}
        for mode in ("exact", "per_occurrence"):
            cfg = TrainConfig(
                model=ModelConfig(categorical_embedding_dim=64,
                                  dense_projection_dim=128,
                                  tower_hidden_dims=(512, 256),
                                  final_embedding_dim=128,
                                  dropout_rate=0.0),
                loss=LossConfig(temperature=0.1, use_fused_logits=True),
                optimizer=OptimizerConfig(learning_rate=3e-3,
                                          sparse_duplicate_handling=mode),
            )
            model = TwoTowerModel(schema, cfg.model)
            state, tx = create_sparse_train_state(
                model, cfg, jax.random.PRNGKey(0), warm, n_steps
            )
            steps_fn = make_scanned_sparse_steps(model, cfg, tx, n_steps, n_inner)
            losses = []
            steps = 0
            epoch = 0
            while steps < n_steps:
                for stack in index_stacks(ds.pairs, b, n_inner, seed=epoch):
                    state, m = steps_fn(state, stack, n_store, c_store)
                    losses.append(m["loss"])
                    steps += n_inner
                    if steps >= n_steps:
                        break
                epoch += 1
            loss_tail = float(np.mean(np.concatenate(
                [np.asarray(l) for l in losses])[-20:]))
            # final in-batch accuracy probe on a FIXED batch (state discarded)
            probe = make_sparse_train_step(
                model, cfg, tx, n_steps, with_metrics=True, donate=False
            )
            _, pm = probe(state, jax.device_put(ds.pairs[:b].astype(np.int32)),
                          n_store, c_store)
            acc_last = float(pm["accuracy"])
            results[mode] = (loss_tail, acc_last)
            _emit("sparse_dedup_convergence", vocab_per_feature=vocab, mode=mode,
                  steps=steps, final_loss_mean20=round(loss_tail, 4),
                  final_accuracy=round(acc_last, 4), batch=b)
        drift = results["per_occurrence"][0] - results["exact"][0]
        _emit("sparse_dedup_convergence_delta", vocab_per_feature=vocab,
              loss_drift=round(drift, 4),
              acc_drift=round(results["per_occurrence"][1] - results["exact"][1], 4))


def train_hostfed_features(n_batches: int = 24, prefetch: int = 2) -> None:
    """The FULL host-side feature pipeline at B=8192: BackgroundAssembler
    gathers feature rows on host threads (native C++ gather), batches are
    double-buffered onto the device (prefetch_to_device), the step consumes
    host-assembled PairBatches.

    This names the bottleneck the index-fed design avoids: one flagship
    feature batch is ~26 MB (notice 797 f32 + company dense + ids), and the
    tunneled host link sustains ~100 MB/s H2D -> a hard >=0.26 s/step floor
    REGARDLESS of compute (the 2-3 ms step is 100x smaller). The reference
    hit the same wall on PCIe at much higher bandwidth (README.md:31-57);
    the framework's answer is device-resident stores + index feeding
    (train_hostfed / the headline bench), which ships 64 KB/step instead.
    Emits measured MB/step and effective H2D MB/s so the floor is a
    recorded number, not an estimate (VERDICT r1 item 6)."""
    import jax

    from jodalrob_twotower_tpu.config import LossConfig, ModelConfig, OptimizerConfig, TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import (
        BackgroundAssembler,
        assemble_pair_batch,
        epoch_batches,
        prefetch_to_device,
    )
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.schema import reference_shaped_schema
    from jodalrob_twotower_tpu.train.train_step import create_train_state, make_train_step

    b = 8192
    cfg = TrainConfig(model=ModelConfig(),
                      loss=LossConfig(temperature=1.0, use_fused_logits=True),
                      optimizer=OptimizerConfig())
    schema = reference_shaped_schema()
    ds = make_synthetic_dataset(schema, n_notices=100_000, n_companies=100_000,
                                n_pairs=400_000, n_clusters=256, seed=0)
    model = TwoTowerModel(schema, cfg.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 1000)
    step = make_train_step(model, cfg, tx)
    state, m = step(state, warm)  # compile
    float(m["loss"])

    bytes_per_batch = sum(
        x.nbytes for x in (warm.notice.dense, warm.notice.cat_ids,
                           warm.company.dense, warm.company.cat_ids)
    )
    assembler = BackgroundAssembler(
        ds.notice_store, ds.company_store,
        epoch_batches(ds.pairs, b, seed=1),
        depth=prefetch,
    )
    it = prefetch_to_device(iter(assembler), size=prefetch)
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        state, m = step(state, batch)
        n += 1
        if n >= n_batches:
            break
    float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    _emit("train_hostfed_features",
          examples_per_sec=round(b / dt, 1),
          step_ms=round(dt * 1e3, 1),
          mb_per_step=round(bytes_per_batch / 1e6, 1),
          effective_h2d_mb_s=round(bytes_per_batch / 1e6 / dt, 1),
          prefetch=prefetch, batch=b)


def train_hostfed() -> None:
    """Host-fed index streaming (the full input pipeline): [n_inner, B, 2]
    index stacks per dispatch. Sensitive to tunnel H2D congestion — compare
    with the headline on-device-sampled number to quantify it."""
    import jax

    from jodalrob_twotower_tpu.config import LossConfig, ModelConfig, OptimizerConfig, TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch, index_stacks
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.schema import reference_shaped_schema
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state, device_store, make_scanned_train_steps)

    b = 8192
    cfg = TrainConfig(model=ModelConfig(),
                      loss=LossConfig(temperature=1.0, use_fused_logits=True),
                      optimizer=OptimizerConfig())
    schema = reference_shaped_schema()
    ds = make_synthetic_dataset(schema, n_notices=100_000, n_companies=100_000,
                                n_pairs=400_000, n_clusters=256, seed=0)
    model = TwoTowerModel(schema, cfg.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 1000)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    n_inner = 16
    steps_fn = make_scanned_train_steps(model, cfg, tx, n_inner)

    warm_idx = jax.device_put(np.broadcast_to(
        ds.pairs[:b].astype(np.int32), (n_inner, b, 2)).copy())
    state, m = steps_fn(state, warm_idx, n_store, c_store)
    float(m["loss"][-1])
    n_steps, steps, epoch = 160, 0, 0
    t0 = time.perf_counter()
    while steps < n_steps:
        for stack in index_stacks(ds.pairs, b, n_inner, seed=epoch, prefetch=2):
            state, m = steps_fn(state, stack, n_store, c_store)
            steps += n_inner
            if steps >= n_steps:
                break
        epoch += 1
    float(m["loss"][-1])
    dt = time.perf_counter() - t0
    _emit("train_hostfed", examples_per_sec=round(n_steps * b / dt, 1),
          step_ms=round(dt / n_steps * 1e3, 3), batch=b)


def serving(kind: str, k: int = 100, pipeline_depth: int = 2) -> None:
    import jax

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.serving.index import BruteForceIndex, Int8Index, recall_vs_exact
    from jodalrob_twotower_tpu.serving.service import RetrievalService, qps_bench
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    cfg = TrainConfig()
    ds = make_synthetic_dataset(n_notices=20_000, n_companies=100_000, n_pairs=10_000, seed=0)
    model = build_model(ds.schema, cfg, None)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:256])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 10)
    svc = RetrievalService(model, cfg, state, ds.company_store, index_kind=kind)
    out = qps_bench(svc, ds.notice_store, k=k, batch_size=1024, n_batches=10,
                    pipeline_depth=pipeline_depth)
    extra = {}
    if kind == "int8":
        ev = svc._evaluator
        q = ev.encode_corpus(state, ds.notice_store.dense[:1024], ds.notice_store.cat_ids[:1024], side="notice")
        corpus = svc.index  # int8
        exact = BruteForceIndex(ev.encode_corpus(state, ds.company_store.dense, ds.company_store.cat_ids, side="company")).search(q, k=100)
        extra["recall_vs_exact_at100"] = round(recall_vs_exact(corpus.search(q, k=100), exact), 4)
    _emit(f"serving_{kind}", qps=round(out["qps"], 1), k=k,
          corpus_size=out["corpus_size"], **extra)


def serving_10m(kind: str = "int8", n_corpus: int = 10_000_000,
                chunk: int = 262_144, rescore_depth: int | None = None,
                approx_recall: float = 0.97, k: int = 100,
                pipeline_depth: int = 2) -> None:
    """BASELINE config 5 at full scale: top-100 over a 10M-row corpus.

    Corpus embeddings are generated and quantized ON DEVICE (building them
    through the host would move 5 GB over a ~100 MB/s link); queries go
    through the real notice tower, encode+search fused in one dispatch.
    The [Q, N] score matrix would be 40 GB, so the index scans corpus
    chunks with a running top-k (serving/index.py _scanned_topk).
    """
    import jax
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.serving.index import BruteForceIndex, Int8Index, quantize_int8
    from jodalrob_twotower_tpu.serving.service import RetrievalService, qps_bench
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    d = 128  # default chunk: peak scan memory [1024, 262144] f32 = 1 GB
    cfg = TrainConfig()
    ds = make_synthetic_dataset(n_notices=20_000, n_companies=1_000, n_pairs=5_000, seed=0)
    model = build_model(ds.schema, cfg, None)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:256])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 10)

    # device-side corpus build, chunk at a time (bounded peak memory)
    @jax.jit
    def make_chunk(key):
        x = jax.random.normal(key, (chunk, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return quantize_int8(x) if kind == "int8" else x

    n_chunks = -(-n_corpus // chunk)
    keys = jax.random.split(jax.random.PRNGKey(7), n_chunks)
    print(f"# building {n_chunks}x{chunk} corpus on device...", file=sys.stderr, flush=True)
    t = time.perf_counter()
    parts = [make_chunk(k) for k in keys]
    jax.block_until_ready(parts)
    print(f"# corpus chunks built in {time.perf_counter()-t:.1f}s", file=sys.stderr, flush=True)
    # approx_max_k candidate selection: exact top_k costs 89 ms per
    # [1024, 262144] chunk on this chip vs 3.8 ms fused approx (recall 0.95).
    # Under approx selection the corpus stays FLAT (corpus_chunk=None): the
    # dot fuses into approx_max_k's partial reduction, so the [1024, 10M]
    # score block never materializes and the whole scan runs at the HBM
    # floor of reading the int8 corpus once (~20 ms) — scanning 262k chunks
    # with per-chunk merges measured 3.5x slower (152 ms serial).
    if kind == "int8":
        rescore_rows = None
        if rescore_depth:
            # bf16 full-precision copy for the second pass (2.56 GB at 10M):
            # regenerate from the same PRNG keys, never touching the host
            @jax.jit
            def make_bf16_chunk(key):
                x = jax.random.normal(key, (chunk, d), jnp.float32)
                return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.bfloat16)

            rescore_rows = jnp.concatenate([make_bf16_chunk(k) for k in keys])[:n_corpus]
        index = Int8Index.from_quantized(
            jnp.stack([p[0] for p in parts]).reshape(-1, d)[:n_corpus],
            jnp.stack([p[1] for p in parts]).reshape(-1, 1)[:n_corpus],
            corpus_chunk=None, approx_recall=approx_recall,
            rescore_depth=rescore_depth,
            rescore_dtype="bfloat16" if rescore_depth else "int8",
            rescore_rows=rescore_rows,
        )
        gb = index.nbytes / 1e9
    else:
        index = BruteForceIndex(
            jnp.stack(parts).reshape(-1, d)[:n_corpus], corpus_chunk=None,
            approx_recall=0.95,
        )
        gb = index.corpus.nbytes / 1e9

    t = time.perf_counter()
    print("# index built; compiling fused search...", file=sys.stderr, flush=True)
    svc = RetrievalService(model, cfg, state, ds.company_store, prebuilt_index=index,
                           payload_dtype=jnp.float16)
    out = qps_bench(svc, ds.notice_store, k=k, batch_size=1024, n_batches=10,
                    pipeline_depth=pipeline_depth)
    print(f"# search path done in {time.perf_counter()-t:.1f}s", file=sys.stderr, flush=True)

    # recall vs exact-f32 ranking at full 10M scale, on one query batch:
    # regenerate each f32 chunk from its PRNG key (never holding the 5 GB
    # corpus alongside the int8 index) and merge exact per-chunk top-k on host
    extra = {}
    if kind == "int8" and k == 100:
        from jodalrob_twotower_tpu.serving.index import SearchResult, recall_vs_exact

        print("# exact-f32 reference scan (streamed)...", file=sys.stderr, flush=True)
        rng = np.random.default_rng(0)
        rows = rng.integers(0, len(ds.notice_store), size=512)
        q = svc.encode_queries(ds.notice_store.gather(rows))
        approx_res = index.search(q, k=100)

        @jax.jit
        def exact_chunk(key, q):
            x = jax.random.normal(key, (chunk, d), jnp.float32)
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            sims = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
            return jax.lax.top_k(sims, 100)

        best_s = np.full((512, 100), -np.inf, np.float32)
        best_i = np.zeros((512, 100), np.int64)
        for ci, key in enumerate(keys):
            s, i = exact_chunk(key, q)
            s, i = np.asarray(s), np.asarray(i).astype(np.int64) + ci * chunk
            s = np.where(i < n_corpus, s, -np.inf)  # tail rows not in the index
            cat_s = np.concatenate([best_s, s], axis=1)
            cat_i = np.concatenate([best_i, i], axis=1)
            sel = np.argsort(-cat_s, axis=1)[:, :100]
            best_s = np.take_along_axis(cat_s, sel, axis=1)
            best_i = np.take_along_axis(cat_i, sel, axis=1)
        exact_res = SearchResult(best_s, best_i.astype(np.int32))
        extra["recall_vs_exact_at100"] = round(recall_vs_exact(approx_res, exact_res), 4)

    name = f"serving_{kind}_10m" + (f"_rescore{rescore_depth}" if rescore_depth else "")
    if approx_recall != 0.97:
        name += f"_rt{approx_recall}"
    if k != 100:
        name += f"_k{k}"
    if pipeline_depth != 2:
        name += f"_pd{pipeline_depth}"
    _emit(name, qps=round(out["qps"], 1), k=k,
          corpus_size=n_corpus, corpus_gb=round(gb, 2),
          latency_ms_per_batch=round(out["latency_ms_per_batch"], 1), **extra)
    return extra.get("recall_vs_exact_at100")


def serving_10m_auto(target: float = 0.99) -> None:
    """`--target-recall`-style auto-config (serving/autoconfig.py): run the
    chooser for the target, then the full 10M bench with the chosen config,
    asserting the MEASURED recall meets the target within the documented
    window tolerance."""
    from jodalrob_twotower_tpu.serving.autoconfig import choose_serving_config

    chosen = choose_serving_config(target)
    _emit("serving_auto_choice", target_recall=target,
          chosen=" ".join(chosen.cli_flags()),
          expected_recall=chosen.expected_recall)
    measured = serving_10m(
        kind=chosen.index_kind,
        rescore_depth=chosen.rescore_depth,
        approx_recall=chosen.approx_recall if chosen.approx_recall else 0.97,
    )
    if chosen.index_kind == "exact":
        # the exact f32 scan IS the recall reference (serving_10m only
        # measures recall for the int8 kinds): 1.0 by definition
        measured = 1.0
    ok = measured is not None and measured >= target - 0.005
    _emit("serving_auto_meets_target", target_recall=target,
          measured_recall=measured, ok=bool(ok))
    if not ok:
        raise RuntimeError(
            f"auto-config missed the recall target: {measured} < {target}"
        )


def serving_calibrated(n_corpus: int = 100_000, target: float = 0.99) -> None:
    """MEASURED auto-config selection (VERDICT r4 #4) at a given corpus
    scale: calibrate_serving_config evaluates each candidate's recall@100
    against the exact scan ON this corpus with a query sample, picks the
    fastest that meets the target — then the pick is RE-VALIDATED with an
    independent query sample (different seed), so the emitted ok-flag is an
    out-of-sample check of the calibration, not a re-read of it."""
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.serving.autoconfig import (
        calibrate_serving_config,
        measured_recall_at_k,
    )
    from jodalrob_twotower_tpu.serving.index import Int8Index

    d = 128
    chunk = 262_144

    # HOST-side clustered corpus (64 planted centers + noise — iid-normal
    # corpora are artificially easy for int8/approx; clusters create the
    # near-tie neighborhoods real embeddings have). Host-side because a
    # resident f32 corpus at 10M x 128 (5 GB) plus ANY corpus-scale index
    # copy exceeds this chip's usable HBM (measured OOM) — exactly the
    # regime real 10M deployments are in, where the corpus lives on host
    # and each index uploads only its own representation (int8 1.25 GB,
    # bf16 rescore 2.5 GB, or the exact scan's chunked f32, built LAST and
    # alone by calibrate_serving_config's ordering).
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(64, d)).astype(np.float32)
    corpus = np.empty((n_corpus, d), np.float32)
    for lo in range(0, n_corpus, chunk):
        hi = min(lo + chunk, n_corpus)
        assign = rng.integers(0, 64, size=hi - lo)
        x = centers[assign] + 0.3 * rng.normal(size=(hi - lo, d)).astype(np.float32)
        corpus[lo:hi] = x / np.linalg.norm(x, axis=1, keepdims=True)

    def sample_queries(seed: int, n: int = 2048):
        qrng = np.random.default_rng(seed)
        rows = qrng.integers(0, n_corpus, size=n)
        q = corpus[rows] + 0.05 * qrng.normal(size=(n, d)).astype(np.float32)
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    corpus_chunk = chunk if n_corpus > chunk else None
    t0 = time.perf_counter()
    chosen, measured = calibrate_serving_config(
        target, corpus, sample_queries(0), k=100, corpus_chunk=corpus_chunk
    )
    calib_s = time.perf_counter() - t0

    # out-of-sample validation with an independent query draw
    if chosen.index_kind == "exact":
        validated = 1.0
    else:
        q2 = sample_queries(1)
        from jodalrob_twotower_tpu.serving.autoconfig import (
            _exact_topk_streamed,
        )

        # streamed exact reference: nothing corpus-sized resident (HBM —
        # see calibrate_serving_config's discipline note)
        exact_idx = _exact_topk_streamed(corpus, q2, 100, chunk)
        idx = Int8Index(
            corpus, corpus_chunk=corpus_chunk,
            approx_recall=chosen.approx_recall,
            rescore_depth=chosen.rescore_depth,
            rescore_dtype=chosen.rescore_dtype,
        )
        validated = measured_recall_at_k(idx, exact_idx, q2, 100)
    ok = validated >= target - 0.005
    _emit(
        f"serving_calibrated_{n_corpus}",
        target_recall=target,
        chosen=" ".join(chosen.cli_flags()),
        measured={k_: round(v, 4) for k_, v in measured.items()},
        validated_recall=round(validated, 4),
        calibration_seconds=round(calib_s, 2),
        ok=bool(ok),
    )
    if not ok:
        raise RuntimeError(
            f"calibrated config missed target out-of-sample: {validated} < {target}"
        )


def fused_ce_paths(b: int = 8192, d: int = 128, tau: float = 1.0,
                   include_xla: bool = True, eps: float = 0.0) -> None:
    """Loss-path comparison ON THE REAL CHIP: XLA [B,B] materializing path
    vs the single-device fused kernels vs the shard_mapped fused wrapper on
    a 1-device mesh (same kernels + the degenerate collectives, so the
    wrapper's overhead is a measured number; multi-chip wall times need
    hardware this sandbox lacks — the 8-virtual-device equality is proven
    in tests/test_sharded_fused_ce.py). 16x lax.scan per dispatch, value
    fetch at the end (measurement rules, CLAUDE.md).

    At b > 8192 the fused route is the col-blocked kernel family
    (ops/fused_logits._fused_lean_blocked_call); include_xla=False skips
    the materializing control where its [B,B] f32 logits (+softmax
    residents) would not fit HBM (b >= 32768 ~ >12 GB live)."""
    import jax
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.ops.fused_logits import (
        fused_bidirectional_ce,
        make_sharded_fused_ce,
    )
    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from jodalrob_twotower_tpu.train.loss import bidirectional_ce_loss

    key = jax.random.PRNGKey(0)
    n = jax.random.normal(key, (b, d), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    c = jnp.roll(n, 1, axis=0)
    mesh1 = make_mesh(jax.devices()[:1])
    sharded = make_sharded_fused_ce(
        mesh1, DATA_AXIS, temperature=tau, label_smoothing=eps,
        max_abs_logit=1.0 / tau,
    )

    paths = {
        "xla": lambda a, bb: bidirectional_ce_loss(
            a, bb, temperature=tau, label_smoothing=eps, use_fused=False
        )[0],
        "fused": lambda a, bb: fused_bidirectional_ce(
            a, bb, tau, eps, False, 1.0 / tau
        ),
        "fused_sharded_mesh1": sharded,
    }
    if not include_xla:
        del paths["xla"]
    suffix = f"_eps{eps}" if eps else ""
    n_inner, reps = 16, 6
    for name, fn in paths.items():
        def val_and_grads(a, bb, fn=fn):
            loss, (da, db) = jax.value_and_grad(fn, argnums=(0, 1))(a, bb)
            return loss + jnp.sum(da[0]) + jnp.sum(db[0])

        @jax.jit
        def scan16(a, bb, fn=val_and_grads):
            # carry feeds the next iteration's input: no CSE/LICM of the
            # identical loss computation across scan steps
            def body(s, _):
                return fn(a + s * 1e-12, bb), None

            return jax.lax.scan(body, jnp.float32(0), None, length=n_inner)[0]

        float(scan16(n, c))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = scan16(n, c)
        float(out)
        dt = (time.perf_counter() - t0) / (reps * n_inner)
        _emit(f"fused_ce_{name}{suffix}", ms_per_loss_plus_grads=round(dt * 1e3, 3),
              batch=b)


def train_rowsharded_store() -> None:
    """Row-sharded feature stores (store_sharding="rows") at a
    too-big-to-replicate store size, on the 8-virtual-CPU-device mesh in a
    subprocess (this process is pinned to the 1-chip TPU tunnel). Emits
    per-device residency (1/8 of the replicated bytes) and a CPU step-time
    control vs the replicated mode — scripts/rowsharded_store_bench.py."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "scripts/rowsharded_store_bench.py"],
        text=True, timeout=1200, env=env, capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    print(proc.stdout, end="", flush=True)


def serving_sharded_mesh() -> None:
    """ShardedIndex regression line on the 8-virtual-CPU-device mesh.

    Runs in a subprocess: this process's backend is pinned to the 1-chip
    TPU tunnel, and a mesh bench needs 8 devices
    (scripts/sharded_serving_bench.py prints the JSON lines)."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "scripts/sharded_serving_bench.py"],
        text=True, timeout=1200, env=env, capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    print(proc.stdout, end="", flush=True)


def corpus_eval(device_stores: bool = False) -> None:
    """``device_stores=True`` places the stores in HBM first
    (Trainer.prepare_device_eval): the corpus side then encodes with ZERO
    feature H2D (evaluator.encode_corpus_device) — the post-train eval
    path, vs the host path that re-ships every feature."""
    import jax

    from jodalrob_twotower_tpu.config import TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.train.train_step import create_train_state
    from jodalrob_twotower_tpu.train.trainer import Trainer

    cfg = TrainConfig(results_csv="")
    ds = make_synthetic_dataset(n_notices=20_000, n_companies=100_000, n_pairs=20_000, seed=0)
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:256])
    state, _ = create_train_state(trainer.model, cfg, jax.random.PRNGKey(0), warm, 10)
    if device_stores:
        trainer.prepare_device_eval()
    t0 = time.perf_counter()
    res = trainer.corpus_eval(state, ds.pairs[:8192])
    dt = time.perf_counter() - t0
    name = "corpus_eval_device" if device_stores else "corpus_eval"
    _emit(name, queries=res.num_queries, corpus_size=res.corpus_size,
          wall_s=round(dt, 2), recall_at_100_untrained=round(res.recall[100], 4))


BENCHES = {
    "train_hostfed": train_hostfed,
    "train_hostfed_features": train_hostfed_features,
    "train_hostfed_features_pf4": lambda: train_hostfed_features(prefetch=4),
    "train_scaled": train_scaled,
    "train_scaled_sparse": lambda: train_scaled(sparse=True),
    "train_scaled_sparse_deferred": lambda: train_scaled(sparse=True, deferred=True),
    "train_scaled_sparse_deferred_peroc": lambda: train_scaled(
        sparse=True, deferred=True, dedup="per_occurrence"),
    "train_scaled_sparse_sampled": lambda: train_scaled(sparse=True, sampled=True),
    "train_scaled_sparse_sampled_deferred": lambda: train_scaled(
        sparse=True, sampled=True, deferred=True),
    "sparse_dedup_convergence": sparse_dedup_convergence,
    "serving_exact": lambda: serving("exact"),
    "serving_int8": lambda: serving("int8"),
    "serving_int8_10m": lambda: serving_10m("int8"),
    "serving_int8_10m_rescore": lambda: serving_10m("int8", rescore_depth=400),
    "serving_int8_10m_rescore_rt90": lambda: serving_10m(
        "int8", rescore_depth=400, approx_recall=0.90),
    "serving_int8_10m_k10": lambda: serving_10m("int8", k=10),
    "serving_int8_10m_k10_pd4": lambda: serving_10m("int8", k=10, pipeline_depth=4),
    "serving_int8_10m_pd4": lambda: serving_10m("int8", pipeline_depth=4),
    "serving_10m_auto099": lambda: serving_10m_auto(0.99),
    "serving_calibrated_100k": lambda: serving_calibrated(100_000, 0.99),
    "serving_calibrated_10m": lambda: serving_calibrated(10_000_000, 0.99),
    "serving_sharded_mesh": serving_sharded_mesh,
    "train_rowsharded_store": train_rowsharded_store,
    "fused_ce_paths": fused_ce_paths,
    "fused_ce_paths_b16384": lambda: fused_ce_paths(b=16384),
    "fused_ce_paths_b32768": lambda: fused_ce_paths(b=32768, include_xla=False),
    # label smoothing beyond the resident cap (col-blocked stats kernels,
    # VERDICT r2 #1): XLA control at 16384 (25.9 ms there), none at 32768
    # where the [B,B] blob cannot run
    "fused_ce_paths_eps_b16384": lambda: fused_ce_paths(b=16384, eps=0.1),
    "fused_ce_paths_eps_b32768": lambda: fused_ce_paths(
        b=32768, eps=0.1, include_xla=False),
    "corpus_eval": corpus_eval,
    "corpus_eval_device": lambda: corpus_eval(device_stores=True),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(BENCHES)
    unknown = [n for n in names if n not in BENCHES]
    if unknown:
        raise SystemExit(f"unknown bench(es) {unknown}; choose from {list(BENCHES)}")
    for name in names:
        BENCHES[name]()
