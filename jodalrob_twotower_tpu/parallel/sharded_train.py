"""Sharded training: place the train state and batches on the mesh.

Sharding layout (SURVEY.md §7 design mapping):

* embedding tables (`.../embeddings/table`, shape [rows, D]) and every
  optimizer-state leaf that tracks them row-by-row (rowwise-Adagrad
  accumulator [rows, 1], AdamW mu/nu if configured) — **row-sharded** over
  the ``data`` axis. The unified table's row count is padded to a multiple
  of 128 (models/embedding.py), so it divides any mesh axis up to 128.
* all other params/opt leaves — replicated.
* batches — sharded on dim 0 over ``data``.

With these input shardings one ordinary `jax.jit` of the train step makes
XLA emit the whole distributed program: embedding gathers become
expert-style collective gathers over the table shards, the [B, B]
in-batch-negative logits all-gather one side's embeddings (global negatives
— reference semantics at any mesh size), and dense grads all-reduce.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.types import PairBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    row_sharding,
)
from jodalrob_twotower_tpu.train.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)


def _is_table_row_leaf(path, leaf, n_data: int) -> bool:
    """A leaf is row-sharded iff it sits under an embedding collection and its
    leading dim is the (128-aligned) table row count."""
    in_table = any(getattr(k, "key", None) == "embeddings" for k in path)
    return (
        in_table
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] % max(n_data, 1) == 0
        and leaf.shape[0] >= 128
    )


def state_shardings(state: TrainState, mesh, *, shard_tables: bool = True) -> TrainState:
    """Sharding pytree matching the train state. ``shard_tables=False`` keeps
    the embedding tables replicated (MeshConfig.embedding_sharding
    'replicated' — right when tables are small and gathers are hot)."""
    n_data = mesh.shape[DATA_AXIS]

    def rule(path, leaf):
        if shard_tables and _is_table_row_leaf(path, leaf, n_data):
            return row_sharding(mesh, leaf.ndim)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, state)


def make_sharded_train(
    model: TwoTowerModel,
    cfg: TrainConfig,
    mesh,
    example_batch: PairBatch,
    total_steps: int,
):
    """Build (sharded_state, jitted_train_step, shard_batch).

    The state is initialized on host then placed per the sharding rules;
    the step function is the ordinary fused train step jitted with donated,
    sharded inputs.
    """
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), example_batch, total_steps
    )
    from jodalrob_twotower_tpu.parallel.mesh import resolve_embedding_sharding

    mode = resolve_embedding_sharding(cfg.mesh, model.schema)
    shardings = state_shardings(state, mesh, shard_tables=mode != "replicated")
    state = jax.device_put(state, shardings)

    # mesh passed through: with use_fused_logits the CE runs as the
    # shard_mapped fused kernels (per-shard row blocks against the
    # all-gathered opposite side + cross-shard col-lse merge) — global
    # in-batch negatives, no [B, B] HBM materialization at any mesh size.
    step_fn = make_train_step(model, cfg, tx, jit=False, mesh=mesh)
    b_shard = batch_sharding(mesh)
    batch_shardings = jax.tree.map(lambda _: b_shard, example_batch)
    train_step = jax.jit(
        step_fn,
        in_shardings=(shardings, batch_shardings),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )

    def shard_batch(batch: PairBatch) -> PairBatch:
        return jax.tree.map(lambda x: jax.device_put(x, b_shard), batch)

    return state, train_step, shard_batch


def make_sharded_indexed_train(
    model: TwoTowerModel,
    cfg: TrainConfig,
    mesh,
    example_batch: PairBatch,
    total_steps: int,
    *,
    n_inner: int = 8,
):
    """Sharded INDEXED training: device-resident stores + [B, 2] pair indices
    per step, the Trainer's hot path, compiled over a mesh.

    Stores are replicated by default (input features; small next to the
    tables) or ROW-SHARDED over the data axis with
    ``MeshConfig.store_sharding="rows"`` — each chip then holds 1/n of the
    dense/cat matrices and batch rows arrive via the explicit
    all-gather-ids -> psum_scatter-rows exchange (parallel/sharded_store.py;
    the reference's features-too-large-for-memory mode 4 at TPU scale). The
    index batch is sharded on dim 0 so each chip gathers and computes only
    its batch shard, tables are row-sharded per ``state_shardings``, and the
    in-batch-negative logits all-gather one side's embeddings (global
    negatives — single-device semantics at any mesh size).

    Returns (state, tx, scan_steps, single_step, put_idx, put_store):
      scan_steps(state, idx_stack [n_inner, B, 2], n_store, c_store)
      single_step(state, idx [B, 2], n_store, c_store)  (with metrics)
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jodalrob_twotower_tpu.train.train_step import (
        make_indexed_train_step,
    )

    n_data = mesh.shape[DATA_AXIS]
    if example_batch.batch_size % max(n_data, 1):
        raise ValueError(
            f"batch_size {example_batch.batch_size} must divide the data "
            f"axis ({n_data}) to shard the batch dim"
        )
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), example_batch, total_steps
    )
    from jodalrob_twotower_tpu.parallel.mesh import resolve_embedding_sharding

    mode = resolve_embedding_sharding(cfg.mesh, model.schema)
    shardings = state_shardings(state, mesh, shard_tables=mode != "replicated")
    state = jax.device_put(state, shardings)
    rep = replicated(mesh)
    idx_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    stack_sharding = NamedSharding(mesh, P(None, DATA_AXIS, None))

    from jodalrob_twotower_tpu.parallel.sharded_store import (
        resolve_store_placement,
    )

    store_gather, store_sh, put_store = resolve_store_placement(cfg, mesh)

    inner = make_indexed_train_step(
        model, cfg, tx, jit=False, with_metrics=False, mesh=mesh,
        store_gather=store_gather,
    )

    def scan_fn(st, idx_stack, n_store, c_store):
        def body(carry, idx):
            return inner(carry, idx, n_store, c_store)

        return jax.lax.scan(body, st, idx_stack)

    scan_steps = jax.jit(
        scan_fn,
        in_shardings=(shardings, stack_sharding, store_sh, store_sh),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )
    single = make_indexed_train_step(
        model, cfg, tx, jit=False, with_metrics=True, mesh=mesh,
        store_gather=store_gather,
    )
    single_step = jax.jit(
        single,
        in_shardings=(shardings, idx_sharding, store_sh, store_sh),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )

    def put_idx(idx):
        sh = stack_sharding if idx.ndim == 3 else idx_sharding
        if jax.process_count() > 1:
            # multi-host: each process holds only ITS batch slice (per-host
            # lockstep data sharding, data/parquet_stream.py) — assemble the
            # global [.., B_global, 2] array from process-local shards
            return jax.make_array_from_process_local_data(sh, idx)
        return jax.device_put(idx, sh)

    return state, tx, scan_steps, single_step, put_idx, put_store


def make_sharded_sampled_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx,
    mesh,
    shardings,
    n_inner: int,
    batch_size: int,
):
    """ON-DEVICE batch sampling over a mesh (DataConfig.sample_on_device on
    a multi-chip Trainer): the replicated pair set lives in HBM; each inner
    step draws its GLOBAL batch from a key folded with the global step and
    gathers + trains it with the same mesh shardings as the indexed path
    (tables row-sharded per ``shardings``, batch dim sharded by GSPMD,
    store_sharding honored). The host sends one PRNG key per dispatch.

    Returns (sampled_steps, put_pairs):
      sampled_steps(state, key, pairs_dev [P, 2], n_store, c_store)
        -> (state, metrics stacked [n_inner])
      put_pairs(pairs) -> replicated device array.

    ``shardings``/``tx`` must come from the same
    :func:`make_sharded_indexed_train` call that produced the state.
    """
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        resolve_store_placement,
    )
    from jodalrob_twotower_tpu.train.train_step import (
        make_indexed_train_step,
        sampled_scan_fn,
    )

    rep = replicated(mesh)
    store_gather, store_sh, _ = resolve_store_placement(cfg, mesh)

    inner = make_indexed_train_step(
        model, cfg, tx, jit=False, with_metrics=False, mesh=mesh,
        store_gather=store_gather,
    )

    sampled_steps = jax.jit(
        sampled_scan_fn(inner, n_inner, batch_size),
        in_shardings=(shardings, None, rep, store_sh, store_sh),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )

    def put_pairs(pairs):
        from jodalrob_twotower_tpu.parallel.mesh import put_replicated

        return put_replicated(pairs, mesh)

    return sampled_steps, put_pairs
