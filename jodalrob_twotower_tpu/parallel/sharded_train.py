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
    if cfg.loss.use_fused_logits and mesh.size > 1:
        raise ValueError(
            "use_fused_logits is single-device: a Pallas custom call cannot be "
            "partitioned by GSPMD, and running it per-shard would silently "
            "shrink the in-batch negative set to the local shard. Use the XLA "
            "loss path under a mesh (the [B,B] matmul is sharded by XLA)."
        )
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), example_batch, total_steps
    )
    shardings = state_shardings(
        state, mesh, shard_tables=cfg.mesh.embedding_sharding != "replicated"
    )
    state = jax.device_put(state, shardings)

    step_fn = make_train_step(model, cfg, tx, jit=False)
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
