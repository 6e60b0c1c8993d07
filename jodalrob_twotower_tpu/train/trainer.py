"""Training driver: the reference's scripts/train.py main loop, TPU-native.

Orchestrates: stores on device -> sharded/fused train steps -> per-epoch
validation -> best/epoch checkpoints -> corpus-level retrieval eval ->
results ledger. Single-chip and mesh modes share one code path (a 1-device
mesh is just a degenerate mesh).

Reference capabilities covered (scripts/train.py:78-589): config surface,
warmup schedule, epoch loop with train metrics every log_interval, val loop,
best/epoch/final checkpointing, results CSV, prediction demo hooks, resume.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch, epoch_batches
from jodalrob_twotower_tpu.evaluation.evaluator import (
    Evaluator,
    corpus_retrieval_eval,
    qualitative_assessment,
)
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.checkpoint import CheckpointManager
from jodalrob_twotower_tpu.train.ledger import append_result
from jodalrob_twotower_tpu.train.train_step import (
    create_train_state,
    device_store,
    make_eval_step,
    make_indexed_train_step,
    make_scanned_train_steps,
)


@dataclasses.dataclass
class TrainResult:
    state: object
    history: list[dict]
    final_val: dict[str, float]
    corpus: object | None
    examples_per_sec: float
    num_params: int


def _count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


class Trainer:
    """End-to-end training over host FeatureStores + positive pairs."""

    def __init__(
        self,
        cfg: TrainConfig,
        schema,
        notice_store: FeatureStore,
        company_store: FeatureStore,
        *,
        mesh=None,
        log_fn: Callable[[str], None] = print,
    ) -> None:
        """``mesh``: a `jax.sharding.Mesh` (parallel.mesh.make_mesh) turns the
        whole driver multi-chip — tables row-sharded, batches sharded, global
        in-batch negatives preserved. None = single device."""
        self.cfg = cfg
        self.schema = schema
        self.notice_store = notice_store
        self.company_store = company_store
        self.mesh = mesh
        from jodalrob_twotower_tpu.models import build_model

        self.model = build_model(schema, cfg, mesh)
        self.log = log_fn
        self.evaluator = Evaluator(self.model, cfg)
        self._metrics_logger = None
        if cfg.metrics_jsonl:
            from jodalrob_twotower_tpu.utils.profiling import MetricsLogger

            self._metrics_logger = MetricsLogger(cfg.metrics_jsonl)

    def train(
        self,
        train_pairs: np.ndarray,
        val_pairs: np.ndarray,
        *,
        checkpoint_dir: str | Path | None = None,
        resume: bool = False,
        corpus_eval: bool = True,
        epoch_corpus_eval: bool = False,
        n_inner: int = 8,
        batch_source=None,
        steps_per_epoch: int | None = None,
    ) -> TrainResult:
        """``batch_source(epoch) -> iterator of [B, 2] index batches``
        overrides the default in-memory shuffled epochs (used by
        :meth:`train_streaming`); ``steps_per_epoch`` then sizes the
        warmup schedule."""
        cfg = self.cfg
        b = cfg.data.batch_size
        if steps_per_epoch is None:
            steps_per_epoch = len(train_pairs) // b
        total_steps = max(steps_per_epoch * cfg.optimizer.num_epochs, 1)

        example_rows = (
            train_pairs[:b]
            if len(train_pairs)
            else np.asarray(next(iter(batch_source(0))), np.int64)
        )
        example = assemble_pair_batch(self.notice_store, self.company_store, example_rows)
        n_inner = max(min(n_inner, steps_per_epoch), 1)
        put_idx = jax.device_put
        put_store = None
        compressed = None  # CompressedDPTrain when grad_compression is on
        if self.mesh is not None and cfg.mesh.grad_compression != "none":
            # explicit-DP step with compressed gradient sync + error
            # feedback (multi-host DCN; parallel/compressed_grads.py).
            # Loss semantics: LOCAL in-batch negatives per shard — the
            # reference's per-GPU semantics (two_tower_train_task.py:99-134)
            if cfg.sparse_tables and cfg.sparse_defer_updates:
                raise ValueError(
                    "grad_compression with sparse_tables runs per-step "
                    "table updates; sparse_defer_updates (windowed "
                    "staleness) composed with quantized dense sync has no "
                    "tested semantics — disable one of the two"
                )
            if cfg.mesh.store_sharding != "replicated":
                raise ValueError(
                    "grad_compression requires store_sharding='replicated' "
                    "(its explicit shard_map step feeds each shard the full "
                    "stores)"
                )
            if cfg.model.embedding_lookup == "onehot":
                raise ValueError(
                    "grad_compression uses the plain per-shard gather "
                    "inside its explicit shard_map step (build_model "
                    "installs no mesh lookup_fn in this mode) — "
                    "embedding_lookup='onehot' cannot be honored; use "
                    "'auto' or 'gather'"
                )
            from jodalrob_twotower_tpu.parallel.compressed_grads import (
                make_dp_compressed_indexed_train,
                make_dp_compressed_sparse_train,
            )

            # sparse tables COMPOSE with compression (VERDICT r4 §3a): the
            # dense tower grads' all-reduce is quantized, the O(batch)
            # id/grad table exchange stays exact (GSPMD, row-sharded)
            make_compressed = (
                make_dp_compressed_sparse_train
                if cfg.sparse_tables
                else make_dp_compressed_indexed_train
            )
            compressed = make_compressed(
                self.model, cfg, self.mesh, example, total_steps,
                method=cfg.mesh.grad_compression,
            )
            state, tx = compressed.state, compressed.tx
            put_idx, put_store = compressed.put_idx, compressed.put_store
            # the per-worker error-feedback residuals thread through every
            # dispatch; the Trainer's step interface stays (state, metrics)
            err_cell = [compressed.err_state]

            def scan_steps(st, stack, ns, cs):
                st, err_cell[0], m = compressed.scan_steps(
                    st, err_cell[0], stack, ns, cs
                )
                return st, m

            def single_step(st, idx, ns, cs):
                st, err_cell[0], m = compressed.single_step(
                    st, err_cell[0], idx, ns, cs
                )
                return st, m

        elif self.mesh is not None:
            # multi-chip: tables row-sharded, batch dim sharded, stores
            # replicated; global in-batch negatives preserved
            if cfg.sparse_tables:
                from jodalrob_twotower_tpu.parallel.sharded_sparse import (
                    make_sharded_sparse_train,
                )

                state, single_step, put_idx, put_store, scan_steps = (
                    make_sharded_sparse_train(
                        self.model, cfg, self.mesh, example, total_steps,
                        with_metrics=True, n_inner=n_inner,
                        defer_updates=cfg.sparse_defer_updates,
                    )
                )
            else:
                from jodalrob_twotower_tpu.parallel.sharded_train import (
                    make_sharded_indexed_train,
                )

                state, tx, scan_steps, single_step, put_idx, put_store = (
                    make_sharded_indexed_train(
                        self.model, cfg, self.mesh, example, total_steps,
                        n_inner=n_inner,
                    )
                )
        elif cfg.sparse_tables:
            from jodalrob_twotower_tpu.train.sparse_tables import (
                create_sparse_train_state,
                make_deferred_sparse_steps,
                make_scanned_sparse_steps,
                make_sparse_train_step,
            )

            state, tx = create_sparse_train_state(
                self.model, cfg, jax.random.PRNGKey(cfg.seed), example, total_steps
            )
            if cfg.sparse_defer_updates:
                scan_steps = make_deferred_sparse_steps(
                    self.model, cfg, tx, total_steps, n_inner
                )
            else:
                scan_steps = make_scanned_sparse_steps(
                    self.model, cfg, tx, total_steps, n_inner
                )
            single_step = make_sparse_train_step(
                self.model, cfg, tx, total_steps, with_metrics=True
            )
        else:
            state, tx = create_train_state(
                self.model, cfg, jax.random.PRNGKey(cfg.seed), example, total_steps
            )
            scan_steps = make_scanned_train_steps(self.model, cfg, tx, n_inner)
            single_step = make_indexed_train_step(self.model, cfg, tx, with_metrics=True)

        sampled_steps: dict[int, Callable] = {}
        put_pairs = jax.device_put
        if cfg.data.sample_on_device:
            # ON-DEVICE IID sampling (the headline-bench path, bench.py): the
            # host sends one PRNG key per dispatch; batches are drawn with
            # replacement from the device-resident pair set by a key folded
            # with the GLOBAL step — so draws are a pure function of the step
            # counter and mid-epoch resume replays the exact same batches.
            if batch_source is not None:
                raise ValueError(
                    "sample_on_device needs the whole pair set device-resident; "
                    "it is incompatible with streaming batch sources"
                )
            if self.mesh is not None:
                # every mesh mode places the pair set replicated; one
                # helper serves all branches below
                from jodalrob_twotower_tpu.parallel.mesh import put_replicated

                put_pairs = lambda p: put_replicated(p, self.mesh)  # noqa: E731
            if compressed is not None:

                def sampled_fn(k: int) -> Callable:
                    if k not in sampled_steps:
                        inner = compressed.make_sampled(k)

                        def run(st, key, pairs, ns, cs, _inner=inner):
                            st, err_cell[0], m = _inner(
                                st, err_cell[0], key, pairs, ns, cs
                            )
                            return st, m

                        sampled_steps[k] = run
                    return sampled_steps[k]

            elif cfg.sparse_tables:
                if self.mesh is not None:
                    # mesh sparse sampled: global batch drawn on-mesh, same
                    # row-sharded-table/store layout as the host-fed step
                    # (parallel/sharded_sparse.make_sharded_sampled_sparse);
                    # sparse_defer_updates composes (one batched table
                    # update per key-fed window)
                    from jodalrob_twotower_tpu.parallel.sharded_sparse import (
                        make_sharded_sampled_sparse,
                    )

                    def sampled_fn(k: int) -> Callable:
                        if k not in sampled_steps:
                            sampled_steps[k], _ = make_sharded_sampled_sparse(
                                self.model, cfg, self.mesh, state, k, b,
                                total_steps,
                                defer_updates=cfg.sparse_defer_updates,
                            )
                        return sampled_steps[k]

                elif cfg.sparse_defer_updates:
                    from jodalrob_twotower_tpu.train.sparse_tables import (
                        make_sampled_deferred_sparse_steps,
                    )

                    def sampled_fn(k: int) -> Callable:
                        if k not in sampled_steps:
                            sampled_steps[k] = make_sampled_deferred_sparse_steps(
                                self.model, cfg, tx, total_steps, k, b
                            )
                        return sampled_steps[k]

                else:
                    from jodalrob_twotower_tpu.train.sparse_tables import (
                        make_sampled_sparse_steps,
                    )

                    def sampled_fn(k: int) -> Callable:
                        if k not in sampled_steps:
                            sampled_steps[k] = make_sampled_sparse_steps(
                                self.model, cfg, tx, total_steps, k, b
                            )
                        return sampled_steps[k]

            elif self.mesh is not None:
                from jodalrob_twotower_tpu.parallel.sharded_train import (
                    make_sharded_sampled_steps,
                )

                state_sh = jax.tree.map(lambda x: x.sharding, state)

                def sampled_fn(k: int) -> Callable:
                    if k not in sampled_steps:
                        sampled_steps[k], _ = make_sharded_sampled_steps(
                            self.model, cfg, tx, self.mesh, state_sh, k, b
                        )
                    return sampled_steps[k]

            else:
                from jodalrob_twotower_tpu.train.train_step import (
                    make_sampled_train_steps,
                )

                def sampled_fn(k: int) -> Callable:
                    if k not in sampled_steps:
                        sampled_steps[k] = make_sampled_train_steps(
                            self.model, cfg, tx, k, b
                        )
                    return sampled_steps[k]

            sampled_fn(n_inner)  # the main dispatch size

        if cfg.sparse_tables:
            from jodalrob_twotower_tpu.train.sparse_tables import merged_params

            num_params = _count_params(merged_params(state))
        else:
            num_params = _count_params(state.params)
        self.log(f"model: {num_params:,} params; {steps_per_epoch} steps/epoch x {cfg.optimizer.num_epochs} epochs")

        ckpt = None
        start_epoch = 0
        skip_batches = 0  # mid-epoch resume: batches already trained this epoch
        if checkpoint_dir is not None:
            ckpt = CheckpointManager(checkpoint_dir, cfg.checkpoint)
            ckpt.save_config(cfg)
            if resume:
                last_epoch = ckpt.latest_epoch()
                step_ckpt = ckpt.restore_step(state)
                # a mid-epoch checkpoint wins only if it is from an epoch no
                # completed-epoch checkpoint covers (the epoch save happens
                # AFTER the last step save of that epoch)
                if step_ckpt is not None and step_ckpt[1] > (last_epoch if last_epoch is not None else -1):
                    state, start_epoch, saved_step, saved_batch = step_ckpt
                    if saved_batch is not None:
                        # exact count recorded at save time — correct even
                        # when streaming epochs don't match steps_per_epoch
                        skip_batches = saved_batch
                    else:  # legacy step.json without "batch": derive
                        skip_batches = max(0, min(saved_step - start_epoch * steps_per_epoch,
                                                  steps_per_epoch))
                    self.log(
                        f"resumed mid-epoch {start_epoch} at step {saved_step} "
                        f"(skipping {skip_batches} already-trained batches)"
                    )
                elif last_epoch is not None:
                    state = ckpt.restore(f"epoch_{last_epoch}", state)
                    start_epoch = last_epoch + 1
                    self.log(f"resumed from epoch {last_epoch} (step {int(state.step)})")

        # device-resident stores; indices are the only per-step H2D traffic.
        # Dense blocks live at the compute dtype (config device_store_dtype)
        store_dt = self._device_store_dtype()
        if put_store is not None:
            # mesh modes place stores themselves (replicated, or row-sharded
            # under store_sharding="rows"); hand them HOST matrices so a
            # row-sharded store never materializes whole on one chip (the
            # too-big-to-replicate case is the mode's entire point)
            def _host_store(fs):
                dense = np.asarray(fs.dense)
                if store_dt is not None:
                    dense = dense.astype(store_dt)
                return (dense, np.asarray(fs.cat_ids))

            n_store = put_store(_host_store(self.notice_store))
            c_store = put_store(_host_store(self.company_store))
        else:
            n_store = device_store(self.notice_store, dtype=store_dt)
            c_store = device_store(self.company_store, dtype=store_dt)
        pairs_dev = None
        if sampled_steps:
            if not len(train_pairs):
                raise ValueError("sample_on_device requires a non-empty pair set")
            pairs_dev = put_pairs(train_pairs.astype(np.int32))
            sample_key = jax.random.PRNGKey(cfg.data.shuffle_seed)

        # reuse the training stores for validation and corpus encoding
        # (device-resident eval: indices-only H2D instead of re-shipping
        # features every epoch — evaluator.evaluate_indexed /
        # encode_corpus_device). EVERY mode qualifies: mesh runs place idx
        # replicated so the jit's inputs are consistently meshed;
        # row-sharded stores route batch assembly through the explicit
        # cross-shard exchange (a plain jnp.take could tempt the
        # partitioner into all-gathering the very store that was too big
        # to replicate); multi-process runs assemble the replicated idx
        # from process-local copies.
        self._dev_stores = (n_store, c_store)
        self._eval_put_idx = None
        self._eval_store_gather = None
        if self.mesh is not None:
            from jodalrob_twotower_tpu.parallel.mesh import put_replicated

            # every process holds the same full idx array (same pairs +
            # seed); place it replicated, multi-process-safe
            self._eval_put_idx = lambda x: put_replicated(x, self.mesh)
            if cfg.mesh.store_sharding == "rows":
                from jodalrob_twotower_tpu.parallel.sharded_store import (
                    make_tower_batch_gather,
                )

                self._eval_store_gather = make_tower_batch_gather(self.mesh)

        # multi-host (multi-process mesh): cfg.data.batch_size is the GLOBAL
        # batch. In-memory epochs are generated identically on every process
        # (same pairs + seed), so each process feeds only its stripe of each
        # batch — put_idx then assembles the global array from process-local
        # shards. Without this, make_array_from_process_local_data would
        # CONCATENATE the identical full batches into an n_proc-times-larger
        # global batch with every pair duplicated (wrong in-batch negatives).
        # Streaming sources already yield per-host slices
        # (train_streaming divides batch_size by process_count).
        n_proc = jax.process_count()
        local_slice = None
        if self.mesh is not None and n_proc > 1 and batch_source is None:
            if b % n_proc:
                raise ValueError(
                    f"jax.process_count() ({n_proc}) must divide batch_size {b}"
                )
            bl = b // n_proc
            pi = jax.process_index()
            local_slice = slice(pi * bl, (pi + 1) * bl)

        history: list[dict] = []
        examples_per_sec = 0.0
        train_loss = float("nan")
        last_epoch_corpus = None  # final epoch's epoch_corpus_eval result
        first_dispatch = True  # first dispatch includes XLA compile: excluded
        save_every = cfg.checkpoint.save_every_steps if ckpt is not None else 0
        steps_since_save = 0
        for epoch in range(start_epoch, cfg.optimizer.num_epochs):
            t0 = time.perf_counter()
            losses: list[float] = []
            stack: list[np.ndarray] = []
            seen = 0
            # batches consumed from this epoch's iterator (skipped + trained)
            # — recorded in mid-epoch checkpoints so resume is exact even
            # when an epoch's true batch count differs from steps_per_epoch
            batches_done = skip_batches
            if pairs_dev is not None:
                # sampled mode: no host iterator at all — dispatch
                # steps_per_epoch on-device IID draws (resume just runs the
                # remaining steps; draws key on the global step counter)
                steps_todo = steps_per_epoch - skip_batches
                skip_batches = 0
                while steps_todo > 0:
                    k = min(n_inner, steps_todo)
                    state, metrics = sampled_fn(k)(
                        state, sample_key, pairs_dev, n_store, c_store
                    )
                    if first_dispatch:
                        float(np.asarray(metrics["loss"])[-1])  # wait for compile
                        t0 = time.perf_counter()
                        seen = 0
                        first_dispatch = False
                    else:
                        seen += k * b
                    losses.append(metrics["loss"])
                    batches_done += k
                    steps_since_save += k
                    steps_todo -= k
                    if save_every and steps_since_save >= save_every:
                        ckpt.save_step(state, epoch, batches_done)
                        steps_since_save = 0
                batch_iter = ()
            else:
                batch_iter = (
                    batch_source(epoch)
                    if batch_source is not None
                    else epoch_batches(
                        train_pairs, b, shuffle=True, seed=cfg.data.shuffle_seed + epoch
                    )
                )
            for idx in batch_iter:
                if skip_batches:  # mid-epoch resume: the epoch iterator is
                    skip_batches -= 1  # seeded, so dropping the first N
                    continue  # batches replays the interrupted epoch exactly
                if first_dispatch and not stack and batch_source is None:
                    self.verify_pair_alignment(idx[: min(len(idx), 256)], train_pairs)
                if local_slice is not None:
                    idx = idx[local_slice]
                stack.append(idx.astype(np.int32))
                if len(stack) == n_inner:
                    state, metrics = scan_steps(
                        state, put_idx(np.stack(stack)), n_store, c_store
                    )
                    stack.clear()
                    if first_dispatch:
                        float(np.asarray(metrics["loss"])[-1])  # wait for compile
                        t0 = time.perf_counter()
                        seen = 0  # this dispatch's examples+time both excluded
                        first_dispatch = False
                    else:
                        seen += n_inner * b
                    losses.append(metrics["loss"])
                    batches_done += n_inner
                    steps_since_save += n_inner
                    if save_every and steps_since_save >= save_every:
                        ckpt.save_step(state, epoch, batches_done)
                        steps_since_save = 0
            for idx in stack:  # remainder: single steps
                state, metrics = single_step(
                    state, put_idx(idx.astype(np.int32)), n_store, c_store
                )
                seen += b
                losses.append(metrics["loss"][None] if metrics["loss"].ndim == 0 else metrics["loss"])
                batches_done += 1
                steps_since_save += 1
                if save_every and steps_since_save >= save_every:
                    ckpt.save_step(state, epoch, batches_done)
                    steps_since_save = 0
            if losses:  # can be empty when a resume skipped the whole epoch
                epoch_losses = np.concatenate([np.atleast_1d(np.asarray(l)) for l in losses])
                train_loss = float(epoch_losses[-min(len(epoch_losses), 20):].mean())
            dt = time.perf_counter() - t0
            examples_per_sec = seen / dt

            val = self.validate(state, val_pairs)
            entry = {
                "epoch": epoch,
                "train_loss": train_loss,
                "examples_per_sec": examples_per_sec,
                **{f"val_{k}": v for k, v in val.items()},
            }
            if epoch_corpus_eval and len(val_pairs):
                # per-epoch corpus-retrieval trajectory (device-resident —
                # the stores already live in HBM, so this is seconds, not
                # the host-assembled minutes); drives the committed
                # headline-run artifact (scripts/train_headline.py)
                last_epoch_corpus = self.corpus_eval(state, val_pairs)
                entry.update(
                    {f"corpus_recall@{k}": v
                     for k, v in last_epoch_corpus.recall.items()}
                )
                entry["corpus_mrr"] = last_epoch_corpus.mrr
            history.append(entry)
            if self._metrics_logger is not None:
                self._metrics_logger.log(int(state.step), entry)
            self.log(
                f"epoch {epoch}: train_loss {train_loss:.4f} val_loss {val.get('loss', float('nan')):.4f} "
                f"acc {val.get('accuracy', 0):.4f} mrr {val.get('mrr', 0):.4f} "
                f"gap {val.get('similarity_gap', 0):.4f} z-gap {val.get('z_gap', 0):.2f} "
                f"({examples_per_sec:,.0f} ex/s)"
            )
            if ckpt is not None:
                ckpt.save_epoch(state, epoch, metric=val.get("loss"))

        final_val = self.validate(state, val_pairs)
        self.log("assessment: " + qualitative_assessment(final_val, b))

        corpus = None
        if corpus_eval and len(val_pairs):
            # the last epoch's per-epoch result (epoch_corpus_eval) is this
            # exact evaluation — don't re-encode the corpus for it
            corpus = last_epoch_corpus or self.corpus_eval(state, val_pairs)
            self.log(
                f"corpus retrieval over {corpus.corpus_size:,} companies: "
                + " ".join(f"recall@{k}={v:.4f}" for k, v in corpus.recall.items())
                + f" mrr={corpus.mrr:.4f}"
            )

        if ckpt is not None:
            ckpt.finalize(state)
        if cfg.results_csv:
            val_out = dict(final_val)
            if corpus is not None:
                val_out.update({f"corpus_recall@{k}": v for k, v in corpus.recall.items()})
            append_result(
                cfg.results_csv,
                run_info={
                    "epochs": cfg.optimizer.num_epochs,
                    "batch_size": b,
                    "learning_rate": cfg.optimizer.learning_rate,
                    "embedding_dim": cfg.model.final_embedding_dim,
                    "num_params": num_params,
                    "examples_per_sec": f"{examples_per_sec:.0f}",
                },
                val_metrics=val_out,
                train_loss=train_loss,
            )
        return TrainResult(
            state=state,
            history=history,
            final_val=final_val,
            corpus=corpus,
            examples_per_sec=examples_per_sec,
            num_params=num_params,
        )

    def train_streaming(
        self,
        pair_files,
        val_pairs: np.ndarray,
        *,
        steps_per_epoch: int,
        host_index: int = 0,
        host_count: int = 1,
        chunk_rows: int = 1_000_000,
        **train_kwargs,
    ) -> TrainResult:
        """Train from parquet pair files too large for host memory
        (the reference's streaming modes; data/parquet_stream.py). Each
        epoch re-streams the files with a fresh shuffle seed.

        ``cfg.data.batch_size`` is the GLOBAL batch: on a multi-process
        mesh every host streams its own row shard and contributes
        batch_size / process_count rows per step (put_idx assembles the
        global batch from the per-host slices)."""
        import jax as _jax

        from jodalrob_twotower_tpu.data.parquet_stream import (
            stream_pair_chunks,
            streaming_index_batches,
        )

        local_b = self.cfg.data.batch_size
        if self.mesh is not None and _jax.process_count() > 1:
            n_proc = _jax.process_count()
            if local_b % n_proc:
                raise ValueError(
                    f"jax.process_count() ({n_proc}) must divide batch_size "
                    f"{local_b} — it is the GLOBAL batch"
                )
            local_b //= n_proc

        def source(epoch: int):
            return streaming_index_batches(
                stream_pair_chunks(
                    pair_files,
                    self.notice_store,
                    self.company_store,
                    chunk_rows=chunk_rows,
                    host_index=host_index,
                    host_count=host_count,
                ),
                local_b,
                seed=self.cfg.data.shuffle_seed + epoch,
            )

        return self.train(
            np.empty((0, 2), np.int64),
            val_pairs,
            batch_source=source,
            steps_per_epoch=steps_per_epoch,
            **train_kwargs,
        )

    def prepare_device_eval(self) -> None:
        """Place both feature stores in HBM so validate()/corpus_eval() run
        device-resident (indices-only H2D) without a prior train() —
        standalone-eval entry point. Mesh-aware: stores are placed per
        ``cfg.mesh.store_sharding`` (replicated, or row-sharded with batch
        assembly through the explicit cross-shard exchange)."""
        store_dt = self._device_store_dtype()
        self._eval_put_idx = None
        self._eval_store_gather = None
        if self.mesh is None:
            self._dev_stores = (
                device_store(self.notice_store, dtype=store_dt),
                device_store(self.company_store, dtype=store_dt),
            )
            return
        from jodalrob_twotower_tpu.parallel.mesh import put_replicated
        from jodalrob_twotower_tpu.parallel.sharded_store import (
            make_tower_batch_gather,
            resolve_store_placement,
        )

        _, _, put_store = resolve_store_placement(self.cfg, self.mesh)

        def _host(fs):
            dense = np.asarray(fs.dense)
            if store_dt is not None:
                dense = dense.astype(store_dt)
            return (dense, np.asarray(fs.cat_ids))

        self._dev_stores = (
            put_store(_host(self.notice_store)),
            put_store(_host(self.company_store)),
        )
        self._eval_put_idx = lambda x: put_replicated(x, self.mesh)
        if self.cfg.mesh.store_sharding == "rows":
            self._eval_store_gather = make_tower_batch_gather(self.mesh)

    def _device_store_dtype(self):
        """Resolved dtype for the device-resident dense feature blocks."""
        from jodalrob_twotower_tpu.train.train_step import resolve_store_dtype

        return resolve_store_dtype(self.cfg)

    @staticmethod
    def verify_pair_alignment(batch_idx: np.ndarray, pairs: np.ndarray) -> None:
        """One-time sanity check that every row of an index batch is a known
        positive pair (the reference ran an equivalent alignment check on its
        first batch, two_tower_train_task.py:253-293)."""
        def _pack(a: np.ndarray) -> np.ndarray:
            # row indices are non-negative ints < 2^32: pack (i, j) into one
            # int64 so membership is a sorted-array searchsorted instead of
            # a Python set of ALL pairs (gigabytes of host tuples at the
            # 10M-pair scale, for a one-time check on a few hundred rows)
            a = np.asarray(a, dtype=np.int64)
            return (a[:, 0] << np.int64(32)) | a[:, 1]

        known = np.sort(_pack(pairs))
        keys = _pack(batch_idx)
        pos = np.searchsorted(known, keys)
        pos = np.minimum(pos, len(known) - 1)
        ok = known[pos] == keys
        if not ok.all():
            first = tuple(np.asarray(batch_idx)[~ok][0].tolist())
            raise AssertionError(
                f"{int((~ok).sum())}/{len(batch_idx)} batch rows are not known "
                f"positive pairs (first: {first}) - input pipeline misaligned"
            )

    def _eval_view(self, state):
        """The evaluator consumes a standard TrainState; sparse states get
        their tables merged back into the param tree."""
        if self.cfg.sparse_tables:
            from jodalrob_twotower_tpu.train.sparse_tables import merged_params
            from jodalrob_twotower_tpu.train.train_step import TrainState

            return TrainState(
                step=state.step,
                params=merged_params(state),
                batch_stats=state.batch_stats,
                opt_state=None,
                rng=state.rng,
            )
        return state

    def validate(self, state, val_pairs: np.ndarray) -> dict[str, float]:
        b = self.cfg.data.batch_size
        state = self._eval_view(state)
        dev = getattr(self, "_dev_stores", None)
        if dev is not None and len(val_pairs) >= b:
            # device-resident eval: whole stacks of batches per dispatch,
            # only indices over the link
            return self.evaluator.evaluate_indexed(
                state, val_pairs, dev[0], dev[1], batch_size=b,
                put_idx=getattr(self, "_eval_put_idx", None),
                store_gather=getattr(self, "_eval_store_gather", None),
            )
        batches = (
            assemble_pair_batch(self.notice_store, self.company_store, idx)
            for idx in epoch_batches(val_pairs, b, shuffle=False)
        )
        return self.evaluator.evaluate(state, batches)

    def corpus_eval(self, state, val_pairs: np.ndarray, ks: tuple[int, ...] = (10, 100)):
        """Rank each val notice's paired company against the full corpus."""
        state = self._eval_view(state)
        dev = getattr(self, "_dev_stores", None)
        if dev is not None:
            # the big side encodes straight from the HBM-resident store
            # (row-sharded stores go through the explicit exchange)
            corpus_emb = self.evaluator.encode_corpus_device(
                state, dev[1], len(self.company_store), side="company",
                store_gather=getattr(self, "_eval_store_gather", None),
            )
        else:
            corpus_emb = self.evaluator.encode_corpus(
                state, self.company_store.dense, self.company_store.cat_ids,
                side="company",
            )
        q_rows = val_pairs[:, 0]
        query_emb = self.evaluator.encode_corpus(
            state,
            self.notice_store.dense[q_rows],
            self.notice_store.cat_ids[q_rows],
            side="notice",
        )
        if self.mesh is not None and self.mesh.size > 1:
            from jodalrob_twotower_tpu.evaluation.evaluator import (
                sharded_corpus_retrieval_eval,
            )

            return sharded_corpus_retrieval_eval(
                query_emb, corpus_emb, val_pairs[:, 1], self.mesh, ks=ks
            )
        return corpus_retrieval_eval(query_emb, corpus_emb, val_pairs[:, 1], ks=ks)
