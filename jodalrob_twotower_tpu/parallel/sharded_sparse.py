"""Row-sharded SPARSE-table training: O(batch) updates on a mesh.

BASELINE config 3 at full spec: 10M-row embedding tables row-sharded over
the chips of a host, trained with the O(batch) sparse rowwise-Adagrad path
(train/sparse_tables.py) rather than dense table gradients.

Sharding layout:

* `SparseTable.table` [R, D] and `.accumulator` [R, 1] — row-sharded over
  the ``data`` axis (R is 128-aligned by the unified-table layout,
  models/embedding.py, so it divides any axis up to 128). Per-chip HBM
  holds 1/n of the table AND 1/n of the optimizer state.
* dense tower params / optimizer state / batch_stats — replicated.
* `pair_idx` [B, 2] — batch-sharded; feature stores — replicated (they are
  input features, small next to the tables).

The step function is the unmodified sparse step under `jax.jit` with these
shardings: XLA partitions the out-of-autodiff `jnp.take` into collective
gathers over the table shards, keeps the compact [B·K, D] activation
cotangents batch-sharded, and lowers the touched-rows `.at[].add` into a
per-shard masked scatter after an id/update exchange — the same algorithm
`sharded_embedding.py` writes by hand, chosen by the partitioner here.

Verified numerically identical to the single-device sparse path on the
8-virtual-device CPU mesh (tests/test_sharded_sparse.py).
"""

from __future__ import annotations

import jax

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.types import PairBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    replicated,
    row_sharding,
)
from jodalrob_twotower_tpu.train.sparse_tables import (
    SparseTrainState,
    create_sparse_train_state,
    deferred_sparse_steps_fn,
    make_sparse_train_step,
)


def sparse_state_shardings(state: SparseTrainState, mesh) -> SparseTrainState:
    """Row-shard the two SparseTables; replicate everything else."""
    n_data = mesh.shape[DATA_AXIS]

    def rule(path, leaf):
        in_table = any(
            getattr(k, "name", getattr(k, "key", None))
            in ("notice_table", "company_table")
            for k in path
        )
        if (
            in_table
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] % max(n_data, 1) == 0
            and leaf.shape[0] >= n_data
        ):
            return row_sharding(mesh, leaf.ndim)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(rule, state)


def make_sharded_sparse_train(
    model: TwoTowerModel,
    cfg: TrainConfig,
    mesh,
    example_batch: PairBatch,
    total_steps: int,
    *,
    with_metrics: bool = False,
    n_inner: int | None = None,
    defer_updates: bool = False,
):
    """Build (sharded_state, jitted_step, put_batch, put_store[, scan_steps]).

    ``jitted_step(state, pair_idx, notice_store, company_store)`` is the
    sparse O(batch) step compiled over the mesh; stores are (dense, cat_ids)
    device tuples from ``put_store``. With ``n_inner`` set, a fifth return
    value runs n_inner steps per dispatch via lax.scan
    (idx stack [n_inner, B, 2], batch dim sharded). ``defer_updates`` makes
    that scan apply ONE batched rowwise-Adagrad update per window
    (train/sparse_tables.py make_deferred_sparse_steps semantics) — the
    per-shard scatter sees the whole window's rows at once.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS as _DATA

    state, tx = create_sparse_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), example_batch, total_steps
    )
    shardings = sparse_state_shardings(state, mesh)
    state = jax.device_put(state, shardings)

    idx_sharding = batch_sharding(mesh)
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        resolve_store_placement,
    )

    store_gather, store_shardings, put_store = resolve_store_placement(cfg, mesh)

    # mesh passed through: use_fused_logits runs the shard_mapped fused CE
    # (global in-batch negatives, no [B, B] HBM block) at any mesh size.
    step_fn = make_sparse_train_step(
        model, cfg, tx, total_steps, jit=False, with_metrics=with_metrics,
        mesh=mesh, store_gather=store_gather,
    )
    train_step = jax.jit(
        step_fn,
        in_shardings=(shardings, idx_sharding, store_shardings, store_shardings),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )

    def put_batch(pair_idx):
        sh = (
            NamedSharding(mesh, P(None, _DATA, None))
            if getattr(pair_idx, "ndim", 2) == 3
            else idx_sharding
        )
        if jax.process_count() > 1:
            # multi-host: the process holds only its batch slice
            return jax.make_array_from_process_local_data(sh, pair_idx)
        return jax.device_put(pair_idx, sh)

    if n_inner is None:
        return state, train_step, put_batch, put_store

    if defer_updates:
        scan_fn = deferred_sparse_steps_fn(
            model, cfg, tx, total_steps, mesh=mesh, store_gather=store_gather
        )
    else:
        inner = make_sparse_train_step(
            model, cfg, tx, total_steps, jit=False, mesh=mesh,
            store_gather=store_gather,
        )

        def scan_fn(st, idx_stack, n_store, c_store):
            def body(carry, idx):
                return inner(carry, idx, n_store, c_store)

            return jax.lax.scan(body, st, idx_stack)

    scan_steps = jax.jit(
        scan_fn,
        in_shardings=(
            shardings,
            NamedSharding(mesh, P(None, _DATA, None)),
            store_shardings,
            store_shardings,
        ),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )
    return state, train_step, put_batch, put_store, scan_steps


def make_sharded_sampled_sparse(
    model: TwoTowerModel,
    cfg: TrainConfig,
    mesh,
    state: SparseTrainState,
    n_inner: int,
    batch_size: int,
    total_steps: int,
    *,
    defer_updates: bool = False,
):
    """ON-DEVICE batch sampling for MESH sparse training — the 10M-vocab
    configuration (BASELINE config 3) no longer stays host-fed: the
    replicated pair set lives in HBM, each inner step draws its GLOBAL
    batch from a key folded with the global step (identical draw semantics
    to train_step.sampled_scan_fn, so runs are replayable and resume-exact)
    and the sparse O(batch) step runs with the same row-sharded-table /
    store-sharding layout as the host-fed mesh step. One PRNG key per
    dispatch crosses the link — immune to the measured tunnel-congestion
    exposure of host-fed index stacks (BENCHMARKS.md).

    ``state`` must come from :func:`make_sharded_sparse_train` (its
    shardings are reused verbatim). Returns (steps, put_pairs):
    ``steps(state, key, pairs_dev [P, 2], n_store, c_store)``
    -> (state, {"loss": [n_inner]}).
    """
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        resolve_store_placement,
    )
    from jodalrob_twotower_tpu.train.optimizer import build_optimizer
    from jodalrob_twotower_tpu.train.train_step import sampled_scan_fn

    # build_optimizer is a pure function of the config: this tx is
    # structurally identical to the one create_sparse_train_state built for
    # ``state`` (train/sparse_tables.py:116-118)
    tx = build_optimizer(cfg.optimizer, total_steps)
    shardings = jax.tree.map(lambda x: x.sharding, state)
    rep = replicated(mesh)
    store_gather, store_shardings, _ = resolve_store_placement(cfg, mesh)
    if defer_updates:
        # sampled x deferred: one key per window AND one batched table
        # update per window (train/sparse_tables.deferred_sparse_steps_fn
        # sampled mode) — the fastest 10M-vocab config, key-fed
        steps_fn = deferred_sparse_steps_fn(
            model, cfg, tx, total_steps, mesh=mesh, store_gather=store_gather,
            sampled=(n_inner, batch_size),
        )
    else:
        inner = make_sparse_train_step(
            model, cfg, tx, total_steps, jit=False, with_metrics=False,
            mesh=mesh, store_gather=store_gather,
        )
        steps_fn = sampled_scan_fn(inner, n_inner, batch_size)
    steps = jax.jit(
        steps_fn,
        in_shardings=(shardings, None, rep, store_shardings, store_shardings),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )

    def put_pairs(pairs):
        from jodalrob_twotower_tpu.parallel.mesh import put_replicated

        return put_replicated(pairs, mesh)

    return steps, put_pairs
