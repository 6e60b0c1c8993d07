"""Sparse-table training: O(batch) embedding updates for huge tables.

The standard step differentiates through the table lookup, so XLA
materializes a full dense [R, D] gradient and the rowwise-Adagrad update
touches every row — O(R) HBM traffic per step. At 10M rows x dim 64 that is
~82 ms/step on the bench chip (BASELINE config 3). TorchRec solves this
with FBGEMM's sparse optimizers; the TPU-native equivalent here:

1. look the embeddings up OUTSIDE autodiff (`jnp.take`), feed the
   activations into the towers via ``emb_override``;
2. `jax.grad` w.r.t. the activations yields COMPACT [B, K, D] cotangents —
   no scatter, no dense table gradient;
3. apply rowwise Adagrad with pure gather/scatter on the touched rows only:

     acc[r]   += mean_d(G², d)     with G = Σ_occurrences g  (dedup mode)
     table[r] -= lr · G / sqrt(acc'[r] + eps)

   Duplicate ids in a batch (B=8192 × K ids against even 1.25M-row vocabs
   makes them statistically certain every step): the default
   ``sparse_duplicate_handling="exact"`` segment-sums the per-occurrence
   cotangents per unique row BEFORE the accumulator/table scatter
   (`segment_sum_duplicates` — fixed-shape sort + segment_sum), making the
   sparse path equal to the dense path's autodiff-summed gradients and
   rowwise Adagrad on ANY batch; the hermetic tests assert equality on
   batches constructed WITH duplicates. ``"per_occurrence"`` keeps the
   cheaper round-1 variant (TF-sparse-Adagrad's trade), exact only on
   duplicate-free batches.

Dense (tower) params keep the standard optax pipeline. State is a flat
pytree — orbax-checkpointable like the standard TrainState.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.embedding import absolute_rows, table_layout
from jodalrob_twotower_tpu.train.train_step import dropout_key
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.loss import compute_loss, resolve_use_fused
from jodalrob_twotower_tpu.train.metrics import in_batch_metrics
from jodalrob_twotower_tpu.train.optimizer import warmup_constant_schedule


@flax.struct.dataclass
class SparseTable:
    table: jax.Array  # [R, D]
    accumulator: jax.Array  # [R, 1]


@flax.struct.dataclass
class SparseTrainState:
    step: jax.Array
    dense_params: Any  # tower params WITHOUT the embeddings subtrees
    batch_stats: Any
    opt_state: optax.OptState  # dense-params optimizer state
    notice_table: SparseTable
    company_table: SparseTable
    rng: jax.Array


def _split_embeddings(params):
    """Pop the embeddings subtree out of each tower's params."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy via rebuild
    dense = {}
    tables = {}
    for tower_name, tower in params.items():
        tower = dict(tower)
        emb = tower.pop("embeddings", None)
        dense[tower_name] = tower
        if emb is not None:
            tables[tower_name] = emb["table"]
    return dense, tables


def merged_params(state: SparseTrainState) -> dict:
    """Reassemble full model params (for the standard eval/serving paths)."""
    out = {k: dict(v) for k, v in state.dense_params.items()}
    out["notice_tower"]["embeddings"] = {"table": state.notice_table.table}
    out["company_tower"]["embeddings"] = {"table": state.company_table.table}
    return out


def create_sparse_train_state(
    model: TwoTowerModel,
    cfg: TrainConfig,
    rng: jax.Array,
    example_batch: PairBatch,
    total_steps: int,
):
    """Init params, split tables out, build the dense optimizer."""
    if cfg.optimizer.embedding_optimizer != "rowwise_adagrad":
        raise ValueError(
            "sparse_tables implements rowwise Adagrad table updates; "
            f"embedding_optimizer={cfg.optimizer.embedding_optimizer!r} is only "
            "available on the dense (non-sparse-tables) path"
        )
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng}, example_batch, train=False
    )
    dense_params, tables = _split_embeddings(variables["params"])
    # the configured optimizer chain (AdamW + warmup + gradient_clip_norm)
    # for the dense tree — with the embeddings split out every leaf labels
    # 'dense', so this matches the standard path's dense behavior exactly.
    # Note: clip applies to dense grads only; table grads bypass optax by
    # design (the whole point is never materializing a full-table gradient).
    from jodalrob_twotower_tpu.train.optimizer import build_optimizer

    tx = build_optimizer(cfg.optimizer, total_steps)
    init_acc = cfg.optimizer.adagrad_init_accumulator

    def sparse(table):
        return SparseTable(
            table=table,
            accumulator=jnp.full((table.shape[0], 1), init_acc, table.dtype),
        )

    state = SparseTrainState(
        step=jnp.zeros((), jnp.int32),
        dense_params=dense_params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(dense_params),
        notice_table=sparse(tables["notice_tower"]),
        company_table=sparse(tables["company_tower"]),
        rng=state_rng,
    )
    return state, tx


# Above this many occurrences the XLA segment-sum scatter falls off a
# cliff on the bench chip (12 ms @ 262k -> 114 ms @ 524k rows x 64) while
# the cumsum-difference form scales smoothly (21 / 38 ms): measured sweep
# in BENCHMARKS.md "Duplicate-id dedup cost". In-product sizes sit on both
# sides: per-step batches (B*K = 65-262k) use the scatter, deferred
# windows (n_inner*B*K >= 524k) use the cumsum form.
_DEDUP_CUMSUM_MIN_ROWS = 1 << 19


def segment_sum_duplicates(rows: jax.Array, grads: jax.Array, sentinel: int):
    """Exact duplicate handling, jit-stable shapes: sum the per-occurrence
    cotangents of each unique row.

    Sort rows (carrying grads), mark segment starts, reduce each segment
    into the worst-case [N] slots — via segment_sum (a sorted scatter) at
    per-step sizes, or via a prefix-sum difference at deferred-window sizes
    (cumsum is two sequential HBM passes; XLA's log-depth scan keeps the
    f32 rounding at ~3e-5 relative, far below the bf16 grads' own noise).
    Returns (unique_rows [N], summed_grads [N, D]) where unused slots hold
    ``sentinel`` (an out-of-range row the scatters drop) and zero grads.
    O(N log N) sort + O(N·D) gather/reduce ops — no dependence on the table
    height.
    """
    n = rows.shape[0]
    order = jnp.argsort(rows)
    rs = jnp.take(rows, order)
    gs = jnp.take(grads, order, axis=0)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), rs[1:] != rs[:-1]]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # [n], in [0, n_unique)
    if n >= _DEDUP_CUMSUM_MIN_ROWS:
        cs = jnp.cumsum(gs, axis=0)  # [n, D]
        pos = jnp.arange(n, dtype=jnp.int32)
        last_pos = jnp.zeros((n,), jnp.int32).at[seg].max(pos)
        g_end = jnp.take(cs, last_pos, axis=0)
        # segments are contiguous after the sort: slot u's start-1 is slot
        # u-1's end, so one int max-scatter serves both boundaries
        prev_last = jnp.concatenate([jnp.zeros((1,), jnp.int32), last_pos[:-1]])
        g_start = jnp.where(
            (jnp.arange(n) > 0)[:, None], jnp.take(cs, prev_last, axis=0), 0.0
        )
        g_sum = g_end - g_start
    else:
        g_sum = jax.ops.segment_sum(
            gs, seg, num_segments=n, indices_are_sorted=True
        )
    # every occurrence of a row writes the SAME value into its segment slot
    unique_rows = jnp.full((n,), sentinel, rows.dtype).at[seg].set(rs)
    if n >= _DEDUP_CUMSUM_MIN_ROWS:
        # the cumsum-difference form leaves cs[0]-cs[n-1] garbage in unused
        # slots; honor the documented zero-grads-in-padding contract (the
        # segment_sum branch zeroes them by construction)
        g_sum = jnp.where((unique_rows != sentinel)[:, None], g_sum, 0.0)
    return unique_rows, g_sum


def sparse_rowwise_adagrad_update(
    st: SparseTable,
    rows: jax.Array,  # int32 [N] absolute rows (may contain duplicates)
    grads: jax.Array,  # f32 [N, D] per-occurrence grads
    *,
    lr,
    eps: float,
    dedup: bool = True,
) -> SparseTable:
    """Touched-rows-only rowwise Adagrad.

    ``dedup=True`` (default): EXACT dense semantics under duplicate ids —
    per-occurrence cotangents are segment-summed per unique row first, so
    acc[r] += mean_d((Σ_occ g)²) and the row steps once by the summed
    gradient, matching autodiff through the dense table + the dense rowwise
    Adagrad (train/optimizer.py) bit-for-reduction-order. ``dedup=False``
    keeps the round-1 per-occurrence variant (each occurrence accumulates
    and steps separately — TF-sparse-Adagrad's trade), exact only on
    duplicate-free batches.
    """
    if dedup:
        rows, grads = segment_sum_duplicates(rows, grads, st.table.shape[0])
    gsq = jnp.mean(jnp.square(grads), axis=-1, keepdims=True)  # [N, 1]
    # padding slots (dedup): out-of-range rows -> scatter drops them, and
    # their zero grads make the clip-mode take harmless
    acc = st.accumulator.at[rows].add(
        gsq.astype(st.accumulator.dtype), mode="drop"
    )
    denom = jax.lax.rsqrt(
        jnp.take(acc, rows, axis=0, mode="clip") + eps
    )  # post-update acc
    table = st.table.at[rows].add(
        (-lr * grads * denom).astype(st.table.dtype), mode="drop"
    )
    return SparseTable(table=table, accumulator=acc)


def make_sparse_train_step(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    *,
    donate: bool = True,
    with_metrics: bool = False,
    jit: bool = True,
    defer_table_updates: bool = False,
    mesh=None,
    store_gather=None,
):
    """Indexed train step over device-resident stores with sparse tables.

    Call: step(state, pair_idx [B,2] int32, notice_store, company_store)
    where stores are (dense, cat_ids) device arrays (train_step.device_store).

    ``defer_table_updates=True`` leaves the tables untouched and returns the
    compact per-occurrence rows/cotangents in the metrics dict (keys
    ``rows_n``, ``g_n``, ``rows_c``, ``g_c``) so a scan wrapper can apply
    one batched update per window (`make_deferred_sparse_steps`).

    ``store_gather(store, rows [B]) -> TowerBatch`` overrides the plain
    ``jnp.take`` batch assembly (row-sharded store mode,
    parallel/sharded_store.py).
    """
    n_vocabs = model.schema.notice.vocab_sizes
    c_vocabs = model.schema.company.vocab_sizes
    emb_dim = cfg.model.categorical_embedding_dim
    emb_lr = cfg.optimizer.embedding_learning_rate or cfg.optimizer.learning_rate
    emb_schedule = warmup_constant_schedule(
        emb_lr, total_steps, cfg.optimizer.warmup_ratio
    )
    eps = cfg.optimizer.adagrad_eps
    dedup = cfg.optimizer.sparse_duplicate_handling == "exact"
    from jodalrob_twotower_tpu.train.train_step import make_sharded_ce

    sharded_ce = make_sharded_ce(cfg, mesh)

    def default_gather(store, rows):
        dense, cat = store
        return TowerBatch(
            dense=jnp.take(dense, rows, axis=0),
            cat_ids=jnp.take(cat, rows, axis=0),
        )

    gather = store_gather if store_gather is not None else default_gather

    def step_fn(state: SparseTrainState, pair_idx, notice_store, company_store):
        batch = PairBatch(
            notice=gather(notice_store, pair_idx[:, 0]),
            company=gather(company_store, pair_idx[:, 1]),
        )
        b = pair_idx.shape[0]
        # lookups outside autodiff -> compact activation cotangents
        rows_n = absolute_rows(n_vocabs, batch.notice.cat_ids)  # [B, Kn]
        rows_c = absolute_rows(c_vocabs, batch.company.cat_ids)
        emb_n = jnp.take(state.notice_table.table, rows_n, axis=0).reshape(b, -1)
        emb_c = jnp.take(state.company_table.table, rows_c, axis=0).reshape(b, -1)

        dropout_rng = dropout_key(cfg.model, jax.random.fold_in(state.rng, state.step))

        def loss_fn(dense_params, emb_n_in, emb_c_in):
            # embeddings subtrees are absent from dense_params: with
            # emb_override the collections are never called, so flax never
            # looks their params up
            variables = {"params": dense_params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if state.batch_stats else False
            out = model.apply(
                variables,
                batch,
                train=True,
                emb_overrides=(emb_n_in, emb_c_in),
                rngs={"dropout": dropout_rng},
                mutable=mutable,
            )
            if mutable:
                (n_emb, c_emb), updates = out
                new_bs = updates.get("batch_stats", state.batch_stats)
            else:
                n_emb, c_emb = out
                new_bs = state.batch_stats
            if sharded_ce is not None:
                loss, sim = sharded_ce(n_emb, c_emb), None
            else:
                loss, sim = compute_loss(
                    cfg.loss.loss_type,
                    n_emb,
                    c_emb,
                    temperature=cfg.loss.temperature,
                    label_smoothing=cfg.loss.label_smoothing,
                    margin=cfg.loss.cosine_margin,
                    use_fused=resolve_use_fused(cfg.loss),
                    # tower outputs are L2-normalized (models/tower.py)
                    normalized_inputs=True,
                )
            return loss, (sim, new_bs)

        (loss, (sim, new_bs)), (g_dense, g_emb_n, g_emb_c) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.dense_params, emb_n, emb_c)

        updates, new_opt_state = tx.update(g_dense, state.opt_state, state.dense_params)
        new_dense = optax.apply_updates(state.dense_params, updates)

        if defer_table_updates:
            new_nt, new_ct = state.notice_table, state.company_table
        else:
            lr_t = emb_schedule(state.step)
            new_nt = sparse_rowwise_adagrad_update(
                state.notice_table,
                rows_n.reshape(-1),
                g_emb_n.reshape(-1, emb_dim).astype(jnp.float32),
                lr=lr_t,
                eps=eps,
                dedup=dedup,
            )
            new_ct = sparse_rowwise_adagrad_update(
                state.company_table,
                rows_c.reshape(-1),
                g_emb_c.reshape(-1, emb_dim).astype(jnp.float32),
                lr=lr_t,
                eps=eps,
                dedup=dedup,
            )
        new_state = SparseTrainState(
            step=state.step + 1,
            dense_params=new_dense,
            batch_stats=new_bs,
            opt_state=new_opt_state,
            notice_table=new_nt,
            company_table=new_ct,
            rng=state.rng,
        )
        metrics = {"loss": loss}
        if with_metrics and sim is not None:
            metrics.update(in_batch_metrics(sim))
        if defer_table_updates:
            metrics["rows_n"] = rows_n.reshape(-1)
            metrics["g_n"] = g_emb_n.reshape(-1, emb_dim).astype(jnp.float32)
            metrics["rows_c"] = rows_c.reshape(-1)
            metrics["g_c"] = g_emb_c.reshape(-1, emb_dim).astype(jnp.float32)
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_scanned_sparse_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    n_inner: int,
    *,
    donate: bool = True,
    mesh=None,
):
    """n_inner sparse steps per dispatch via lax.scan (mirror of
    train_step.make_scanned_train_steps)."""
    inner = make_sparse_train_step(
        model, cfg, tx, total_steps, jit=False, with_metrics=False, mesh=mesh
    )

    def steps_fn(state, pair_idx_stack, notice_store, company_store):
        def body(carry, pair_idx):
            return inner(carry, pair_idx, notice_store, company_store)

        return jax.lax.scan(body, state, pair_idx_stack)

    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def make_sampled_sparse_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    n_inner: int,
    batch_size: int,
    *,
    donate: bool = True,
    mesh=None,
):
    """ON-DEVICE batch sampling for the sparse O(batch) path (mirror of
    train_step.make_sampled_train_steps — same resume-exact step-folded
    draws; the pair set lives in HBM, one PRNG key per dispatch).

    Call: steps(state, key, pairs_dev [P, 2], notice_store, company_store).
    For deferred windows use :func:`make_sampled_deferred_sparse_steps`
    (one key per window AND one batched table update per window).
    """
    from jodalrob_twotower_tpu.train.train_step import sampled_scan_fn

    inner = make_sparse_train_step(
        model, cfg, tx, total_steps, jit=False, with_metrics=False, mesh=mesh
    )
    steps_fn = sampled_scan_fn(inner, n_inner, batch_size)
    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def make_deferred_sparse_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    n_inner: int,
    *,
    donate: bool = True,
):
    """n_inner steps per dispatch with ONE batched table update per window.

    The scatter-add into a [10M, D] table is payload-bound at ~22 ms per
    65k-row update on this chip (BENCHMARKS.md scatter study) and dominates
    the per-step sparse path (44 of 48 ms at batch 8192). Deferring: steps
    inside the window read the window-start tables (dense params still
    update every step) and stash their compact [B·K] rows / [B·K, D]
    cotangents; at window end each side applies one
    `sparse_rowwise_adagrad_update` over all n_inner·B·K occurrences. The
    scatter is payload-bound, so the win is batching efficiency (one big
    sorted scatter beats n_inner small ones), measured 1.39x on 10M-row
    tables at window 8 (BENCHMARKS.md); a wash at small table heights.

    Semantics trade (documented, opt-in): embeddings are up to n_inner
    steps stale within a window — the standard asynchronous-embedding trade
    recsys trainers make (parameter-server staleness); equal to the
    per-step path when n_inner=1. The accumulator/step math per occurrence
    is unchanged (post-window accumulator, like the per-step variant's
    post-batch accumulator).
    """
    steps_fn = deferred_sparse_steps_fn(model, cfg, tx, total_steps)
    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def deferred_sparse_steps_fn(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    mesh=None,
    store_gather=None,
    *,
    sampled: tuple[int, int] | None = None,
):
    """The unjitted deferred-window scan body (see make_deferred_sparse_steps).

    Exposed so parallel/sharded_sparse.py can jit it with mesh shardings.

    ``sampled=(n_inner, batch_size)`` switches the window to ON-DEVICE IID
    batch draws (train_step.sampled_scan_fn semantics — key folded with the
    global step, replayable/resume-exact): the signature becomes
    ``steps_fn(state, sample_key, pairs_dev, notice_store, company_store)``
    and the host ships one PRNG key per window instead of an
    [n_inner, B, 2] index stack — the fastest 10M-vocab config (deferred
    windowed updates) without the host-fed tunnel-congestion exposure."""
    inner = make_sparse_train_step(
        model, cfg, tx, total_steps, jit=False, with_metrics=False,
        defer_table_updates=True, mesh=mesh, store_gather=store_gather,
    )
    emb_lr = cfg.optimizer.embedding_learning_rate or cfg.optimizer.learning_rate
    emb_schedule = warmup_constant_schedule(
        emb_lr, total_steps, cfg.optimizer.warmup_ratio
    )
    eps = cfg.optimizer.adagrad_eps
    dedup = cfg.optimizer.sparse_duplicate_handling == "exact"

    def window_update(state, aux):
        """ONE batched rowwise-Adagrad scatter per side over the window's
        stacked occurrences."""
        rows_n, g_n, rows_c, g_c = aux  # each stacked [n_inner, ...]
        lr_t = emb_schedule(state.step - 1)
        d = g_n.shape[-1]
        new_nt = sparse_rowwise_adagrad_update(
            state.notice_table, rows_n.reshape(-1), g_n.reshape(-1, d),
            lr=lr_t, eps=eps, dedup=dedup,
        )
        new_ct = sparse_rowwise_adagrad_update(
            state.company_table, rows_c.reshape(-1), g_c.reshape(-1, d),
            lr=lr_t, eps=eps, dedup=dedup,
        )
        return SparseTrainState(
            step=state.step,
            dense_params=state.dense_params,
            batch_stats=state.batch_stats,
            opt_state=state.opt_state,
            notice_table=new_nt,
            company_table=new_ct,
            rng=state.rng,
        )

    def body_of(carry, pair_idx, notice_store, company_store):
        new_state, m = inner(carry, pair_idx, notice_store, company_store)
        aux = (m.pop("rows_n"), m.pop("g_n"), m.pop("rows_c"), m.pop("g_c"))
        return new_state, (m, aux)

    if sampled is None:

        def steps_fn(state, pair_idx_stack, notice_store, company_store):
            def body(carry, pair_idx):
                return body_of(carry, pair_idx, notice_store, company_store)

            state, (metrics, aux) = jax.lax.scan(body, state, pair_idx_stack)
            return window_update(state, aux), metrics

        return steps_fn

    n_inner, batch_size = sampled

    def steps_fn(state, sample_key, pairs_dev, notice_store, company_store):
        n_pairs = pairs_dev.shape[0]

        def body(carry, _):
            key = jax.random.fold_in(sample_key, carry.step)
            rows = jax.random.randint(key, (batch_size,), 0, n_pairs)
            pair_idx = jnp.take(pairs_dev, rows, axis=0)
            return body_of(carry, pair_idx, notice_store, company_store)

        state, (metrics, aux) = jax.lax.scan(body, state, None, length=n_inner)
        return window_update(state, aux), metrics

    return steps_fn


def make_sampled_deferred_sparse_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    total_steps: int,
    n_inner: int,
    batch_size: int,
    *,
    donate: bool = True,
):
    """Deferred-window sparse training with ON-DEVICE batch sampling: one
    PRNG key per window, one batched table update per window. Call:
    steps(state, key, pairs_dev [P, 2], notice_store, company_store)."""
    steps_fn = deferred_sparse_steps_fn(
        model, cfg, tx, total_steps, sampled=(n_inner, batch_size)
    )
    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())
