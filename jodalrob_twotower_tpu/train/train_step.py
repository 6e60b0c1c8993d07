"""Jitted train/eval steps and the train state.

Replaces the reference's eager torch loop (scripts/train.py:281-433 —
forward, backward, optimizer.step, scheduler.step, metric computation as
separate python-dispatched ops) with ONE compiled XLA program per step:
forward + loss + grads + optimizer update + metrics fuse into a single
launch, donated buffers, bf16 matmuls on the MXU. Dropout is driven by a
fold-in of the step counter, so the step function is pure and replayable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Mapping

import flax.struct
import jax
import jax.numpy as jnp
import optax

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.loss import compute_loss, resolve_use_fused
from jodalrob_twotower_tpu.train.metrics import in_batch_metrics
from jodalrob_twotower_tpu.train.optimizer import build_optimizer


@flax.struct.dataclass
class TrainState:
    """Carried training state — a pytree, shardable under pjit."""

    step: jax.Array  # int32 scalar
    params: Any
    batch_stats: Any  # BatchNorm running stats ({} when BN disabled)
    opt_state: optax.OptState
    rng: jax.Array  # base PRNG key; per-step keys fold in `step`


def create_train_state(
    model: TwoTowerModel,
    cfg: TrainConfig,
    rng: jax.Array,
    example_batch: PairBatch,
    total_steps: int,
) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize params/opt state from an example batch's shapes."""
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng}, example_batch, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(cfg.optimizer, total_steps)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )
    return state, tx


def resolve_dropout_rng_impl(model_cfg) -> str:
    """Resolve ``ModelConfig.dropout_rng_impl`` ("auto" | literal) to a literal.

    "auto" picks "rbg" on a TPU backend (the hardware RngBitGenerator —
    measured 0.23 ms/step cheaper than threefry mask generation at B=8192,
    BENCHMARKS.md) and "threefry" elsewhere, mirroring
    ``resolve_use_fused`` (train/loss.py): the shipped default IS the
    headline-bench path on TPU, with no semantic change (dropout stays
    dropout; only the mask bit-stream differs between impls).
    """
    v = getattr(model_cfg, "dropout_rng_impl", "threefry")
    if v == "auto":
        return "rbg" if jax.default_backend() == "tpu" else "threefry"
    return v


def dropout_key(model_cfg, rng):
    """Per-step dropout key in the configured (resolved) PRNG impl.

    With ``dropout_rng_impl="rbg"`` (the "auto" resolution on TPU) the
    threefry key's raw words are wrapped into an XLA RngBitGenerator key, so
    flax's Dropout draws its mask from the TPU's hardware generator instead
    of computing threefry rounds on the VPU (measured ~0.2 ms/step at
    B=8192 — BENCHMARKS.md). Derivation stays a pure function of
    (state.rng, step), so runs remain replayable.
    """
    if resolve_dropout_rng_impl(model_cfg) != "rbg":
        return rng
    data = rng
    if jnp.issubdtype(data.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(data)
    # rbg key data is 4 uint32 words; threefry is 2 (duplicate them). A key
    # that is already 4 words (default impl set to rbg/unsafe_rbg) wraps
    # as-is.
    words = data.shape[-1]
    if words == 2:
        data = jnp.concatenate([data, data], axis=-1)
    elif words != 4:
        raise ValueError(f"cannot derive an rbg key from {words}-word key data")
    return jax.random.wrap_key_data(data, impl="rbg")


def make_sharded_ce(cfg: TrainConfig, mesh):
    """The mesh-sharded fused CE loss for a train step, or None when the
    config/mesh doesn't call for it (single device, fused off, or a
    non-CE loss). Replaces the round-1 'fused loss is single-device'
    restriction: the shard_map wrapper keeps O(B·D) HBM traffic and GLOBAL
    in-batch negatives at any mesh size (ops/fused_logits.py)."""
    if (
        mesh is None
        or not resolve_use_fused(cfg.loss)
        or cfg.loss.loss_type != "cross_entropy"
    ):
        return None
    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS

    if mesh.shape[DATA_AXIS] <= 1:
        return None
    from jodalrob_twotower_tpu.ops.fused_logits import make_sharded_fused_ce

    return make_sharded_fused_ce(
        mesh,
        DATA_AXIS,
        temperature=cfg.loss.temperature,
        label_smoothing=cfg.loss.label_smoothing,
        # tower outputs are L2-normalized (models/tower.py), proving the
        # static |logits| <= 1/temperature bound for the lean kernel
        max_abs_logit=1.0 / cfg.loss.temperature,
    )


def _forward_loss(
    model: TwoTowerModel,
    cfg: TrainConfig,
    params,
    batch_stats,
    batch: PairBatch,
    dropout_rng,
    *,
    train: bool,
    sharded_ce=None,
    use_fused: bool | None = None,
):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (train and batch_stats) else False
    out = model.apply(
        variables,
        batch,
        train=train,
        rngs={"dropout": dropout_key(cfg.model, dropout_rng)} if train else None,
        mutable=mutable,
    )
    if mutable:
        (n_emb, c_emb), updates = out
        new_batch_stats = updates.get("batch_stats", batch_stats)
    else:
        n_emb, c_emb = out
        new_batch_stats = batch_stats
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
            use_fused=resolve_use_fused(cfg.loss) if use_fused is None else use_fused,
            # tower outputs are L2-normalized by construction
            # (models/tower.py), proving |logits| <= 1/temperature for the
            # fused lean kernel
            normalized_inputs=True,
        )
    return loss, (sim, n_emb, c_emb, new_batch_stats)


def make_train_step(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    *,
    donate: bool = True,
    jit: bool = True,
    mesh=None,
) -> Callable[[TrainState, PairBatch], tuple[TrainState, Mapping[str, jax.Array]]]:
    """Build the fused train step: grads + update + in-batch metrics.

    ``mesh``: when given (parallel/sharded_train.py) and the config enables
    the fused loss, the CE is computed by the shard_mapped fused kernels
    over the mesh's data axis instead of the GSPMD XLA path."""
    sharded_ce = make_sharded_ce(cfg, mesh)

    def step_fn(state: TrainState, batch: PairBatch):
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            return _forward_loss(
                model, cfg, params, state.batch_stats, batch, dropout_rng,
                train=True, sharded_ce=sharded_ce,
            )

        (loss, (sim, _, _, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            rng=state.rng,
        )
        metrics = {"loss": loss}
        if sim is not None:
            metrics.update(in_batch_metrics(sim))
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_indexed_train_step(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    *,
    donate: bool = True,
    jit: bool = True,
    with_metrics: bool = True,
    mesh=None,
    store_gather=None,
):
    """Train step over DEVICE-RESIDENT feature stores.

    The feature matrices stay in HBM across the whole run; each step receives
    only a [B, 2] int32 matrix of (notice_row, company_row) pairs and gathers
    the batch on-device inside the compiled program. This removes the
    per-step host assembly + H2D feature transfer entirely — the host sends
    64 KB of indices instead of tens of MB of features (the reference's
    documented bottleneck was exactly this per-batch host assembly + H2D,
    README.md:31-57).

    Call: step(state, pair_idx, notice_store, company_store) where each store
    is a (dense [N, D] float32/bf16, cat_ids [N, K] int32) tuple of jax
    arrays.

    ``with_metrics=False`` computes only the loss: the in-batch ranking
    metrics take several extra full passes over the [B, B] similarity matrix
    (HBM-bound at large B), so the hot loop skips them and the evaluator
    computes them on eval batches (the reference likewise only displayed
    train metrics every 20 steps, scripts/train.py:339-352).

    ``store_gather(store, rows [B]) -> TowerBatch`` overrides the plain
    ``jnp.take`` batch assembly — used by the ROW-SHARDED store mode
    (parallel/sharded_store.make_tower_batch_gather), where the gather is an
    explicit cross-shard exchange. The gather sits outside autodiff either
    way (stores are inputs, not parameters).
    """
    from jodalrob_twotower_tpu.data.types import default_tower_gather

    sharded_ce = make_sharded_ce(cfg, mesh)
    gather = store_gather if store_gather is not None else default_tower_gather

    def step_fn(state: TrainState, pair_idx, notice_store, company_store):
        batch = PairBatch(
            notice=gather(notice_store, pair_idx[:, 0]),
            company=gather(company_store, pair_idx[:, 1]),
        )
        dropout_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            return _forward_loss(
                model, cfg, params, state.batch_stats, batch, dropout_rng,
                train=True, sharded_ce=sharded_ce,
            )

        (loss, (sim, _, _, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            rng=state.rng,
        )
        metrics = {"loss": loss}
        if with_metrics and sim is not None:
            metrics.update(in_batch_metrics(sim))
        return new_state, metrics

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_scanned_train_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    n_inner: int,
    *,
    donate: bool = True,
    with_metrics: bool = False,
    mesh=None,
):
    """Run ``n_inner`` indexed train steps in ONE device dispatch via lax.scan.

    Amortizes host→device dispatch latency (dominant when the chip is behind
    a network tunnel or the model is small): pass [n_inner, B, 2] indices,
    get back metrics stacked [n_inner]. The per-step dropout key folds in the
    global step counter, so results are bit-identical to n_inner separate
    calls of the indexed step.
    """
    inner = make_indexed_train_step(
        model, cfg, tx, jit=False, with_metrics=with_metrics, mesh=mesh
    )

    def steps_fn(state: TrainState, pair_idx_stack, notice_store, company_store):
        def body(carry, pair_idx):
            new_state, metrics = inner(carry, pair_idx, notice_store, company_store)
            return new_state, metrics

        return jax.lax.scan(body, state, pair_idx_stack)

    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def sampled_scan_fn(inner, n_inner: int, batch_size: int):
    """The unjitted ``n_inner``-step on-device-sampling scan body shared by
    :func:`make_sampled_train_steps` (single device) and
    parallel/sharded_train.make_sharded_sampled_steps (mesh): each inner
    step draws its batch IID with replacement from a key folded with the
    GLOBAL step counter, so draws are replayable and resume-exact."""

    def steps_fn(state: TrainState, sample_key, pairs_dev, notice_store, company_store):
        n_pairs = pairs_dev.shape[0]

        def body(carry, _):
            key = jax.random.fold_in(sample_key, carry.step)
            rows = jax.random.randint(key, (batch_size,), 0, n_pairs)
            pair_idx = jnp.take(pairs_dev, rows, axis=0)
            return inner(carry, pair_idx, notice_store, company_store)

        return jax.lax.scan(body, state, None, length=n_inner)

    return steps_fn


def make_sampled_train_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    n_inner: int,
    batch_size: int,
    *,
    donate: bool = True,
    with_metrics: bool = False,
    mesh=None,
):
    """``n_inner`` train steps per dispatch with ON-DEVICE batch sampling.

    The pair set lives in HBM ([P, 2] int32) and each inner step draws its
    batch with `jax.random.randint` (IID with replacement) from a key folded
    with the global step — the host sends ONE PRNG key per dispatch instead
    of an [n_inner, B, 2] index stack (~1 MB per dispatch on the tunneled
    link, ~0.6 ms/step of pure H2D at batch 8192). Use when the pair set
    fits HBM; `make_scanned_train_steps` remains the host-fed path for
    epoch-exact permutation order or streamed pairs.
    """
    inner = make_indexed_train_step(
        model, cfg, tx, jit=False, with_metrics=with_metrics, mesh=mesh
    )
    steps_fn = sampled_scan_fn(inner, n_inner, batch_size)
    return jax.jit(steps_fn, donate_argnums=(0,) if donate else ())


def resolve_store_dtype(cfg: TrainConfig):
    """Resolved dtype for device-resident dense feature blocks
    (DataConfig.device_store_dtype; None = keep host f32). "auto" stores at
    the model compute dtype — bf16 halves HBM/H2D and is bit-identical
    since the towers cast dense inputs to compute dtype anyway."""
    mode = cfg.data.device_store_dtype
    if mode == "bfloat16" or (
        mode == "auto" and cfg.model.compute_dtype == "bfloat16"
    ):
        return jnp.bfloat16
    return None


def device_store(feature_store, *, sharding=None, dtype=None):
    """Put a host FeatureStore's matrices on device once, for indexed steps.

    Returns (dense, cat_ids) jax arrays. ``dtype`` optionally downcasts the
    dense block (bf16 halves HBM footprint; towers cast to compute dtype
    anyway).
    """
    import numpy as np

    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None else jax.device_put
    dense = feature_store.dense
    if dtype is not None:
        # cast on the HOST (numpy handles bf16 via ml_dtypes): halves the
        # bytes shipped over the ~100 MB/s tunnel and avoids the transient
        # f32+bf16 double residency an on-device cast would leave in HBM
        dense = np.asarray(dense).astype(dtype)
    return put(dense), put(feature_store.cat_ids)


def make_eval_step(
    model: TwoTowerModel,
    cfg: TrainConfig,
    *,
    jit: bool = True,
    sharded_batch: bool = False,
) -> Callable[[TrainState, PairBatch], Mapping[str, jax.Array]]:
    """Eval step: forward (no dropout, frozen BN stats) + loss + metrics.

    ``sharded_batch``: the caller feeds batches SHARDED over a mesh data
    axis (the rows-store cross-shard exchange emits them that way). The
    single-device fused Pallas CE/stats kernels cannot be partitioned by
    GSPMD (models/embedding.py:214 documents the same limit for the lookup
    kernel), so with a sharded batch the step uses the XLA materialized
    path regardless of ``use_fused_logits`` — identical metric surface and
    loss semantics; GSPMD shards the [B/n, B] similarity matmul. The train
    path keeps its fused speed on a mesh via the shard_mapped kernels
    (make_sharded_ce); eval is off the hot loop, so the XLA fallback is the
    simple correct form there.
    """
    # resolved at build time: None = follow config, False = force XLA
    eval_use_fused = False if sharded_batch else None

    def eval_fn(state: TrainState, batch: PairBatch):
        loss, (sim, n_emb, c_emb, _) = _forward_loss(
            model,
            cfg,
            state.params,
            state.batch_stats,
            batch,
            jax.random.PRNGKey(0),
            train=False,
            use_fused=eval_use_fused,
        )
        metrics = {"loss": loss}
        if sim is not None:
            metrics.update(in_batch_metrics(sim))
        elif cfg.loss.loss_type == "cross_entropy":
            # the fused loss path returns no similarity matrix; the fused
            # stats kernel yields the identical metric surface without
            # materializing it (ops/fused_logits.fused_in_batch_metrics)
            from jodalrob_twotower_tpu.ops.fused_logits import fused_in_batch_metrics

            metrics.update(
                fused_in_batch_metrics(n_emb, c_emb, temperature=cfg.loss.temperature)
            )
        return metrics

    return jax.jit(eval_fn) if jit else eval_fn


def make_indexed_eval_steps(
    model: TwoTowerModel,
    cfg: TrainConfig,
    *,
    jit: bool = True,
    store_gather=None,
):
    """Eval over DEVICE-RESIDENT stores, many batches per dispatch.

    ``steps(state, idx_stack [n, B, 2], notice_store, company_store)``
    gathers each batch on-device and runs the eval step under ``lax.scan``,
    returning PER-BATCH metrics stacked [n] — one dispatch per stack
    instead of per batch, and the caller averages host-side (per-batch
    granularity lets an overlapping final stack be de-duplicated without a
    second compiled signature). The host-assembled evaluator path ships
    ~27 MB of features per 8192-batch over the link (the training
    bottleneck the indexed steps were built to kill, and the same cost
    paid again every validation epoch); here the wire carries only the
    [n, B, 2] indices and [n]-sized metric vectors.

    ``store_gather(store, rows [B]) -> TowerBatch`` overrides the plain
    ``jnp.take`` — ROW-SHARDED stores pass the explicit cross-shard
    exchange (parallel/sharded_store.make_tower_batch_gather), keeping
    device-resident eval for exactly the stores too big to replicate. The
    exchange emits batches sharded over the mesh data axis, so the eval
    core switches to the XLA loss/metrics path (``sharded_batch`` in
    make_eval_step) — the single-device Pallas kernels would otherwise
    receive partitioned operands under GSPMD on a real multi-chip mesh.
    """
    from jodalrob_twotower_tpu.data.types import default_tower_gather

    eval_core = make_eval_step(
        model, cfg, jit=False, sharded_batch=store_gather is not None
    )
    gather = store_gather if store_gather is not None else default_tower_gather

    def steps_fn(state: TrainState, idx_stack, notice_store, company_store):
        def body(carry, pair_idx):
            batch = PairBatch(
                notice=gather(notice_store, pair_idx[:, 0]),
                company=gather(company_store, pair_idx[:, 1]),
            )
            return carry, eval_core(state, batch)

        _, stacked = jax.lax.scan(body, None, idx_stack)
        return stacked

    return jax.jit(steps_fn) if jit else steps_fn


def make_device_encode_fn(
    model: TwoTowerModel,
    side: str,
    chunk: int,
    *,
    jit: bool = True,
    store_gather=None,
):
    """Chunked single-side encoder over a DEVICE-RESIDENT store.

    ``encode(state, store, start)`` embeds store rows
    ``[start, start+chunk)`` (dynamic slice — one compiled program serves
    every chunk). The corpus-encode path previously shipped the whole
    store's features from host per eval (5+ GB at 10M rows); with the
    training stores already in HBM this costs zero H2D.

    ``store_gather(store, rows) -> TowerBatch`` overrides the dynamic
    slice for ROW-SHARDED stores: the chunk's contiguous row ids go
    through the explicit cross-shard exchange, so corpus encoding stays
    device-resident for stores too big to replicate (requires
    ``chunk`` divisible by the mesh's data axis — the caller's chunk
    sizes are powers of two)."""

    def encode(state: TrainState, store, start):
        if store_gather is not None:
            rows = start + jnp.arange(chunk, dtype=jnp.int32)
            tb = store_gather(store, rows)
        else:
            dense, cat = store
            tb = TowerBatch(
                dense=jax.lax.dynamic_slice_in_dim(dense, start, chunk, axis=0),
                cat_ids=jax.lax.dynamic_slice_in_dim(cat, start, chunk, axis=0),
            )
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        method = {"notice": model.encode_notice, "company": model.encode_company}[side]
        return model.apply(variables, tb, train=False, method=method)

    return jax.jit(encode) if jit else encode


def make_encode_fn(
    model: TwoTowerModel,
    side: str,
    *,
    jit: bool = True,
):
    """Single-side encoder for index building / serving
    (reference: two_tower_model.py:102-108)."""

    def encode(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        method = {"notice": model.encode_notice, "company": model.encode_company}[side]
        return model.apply(variables, batch, train=False, method=method)

    return jax.jit(encode) if jit else encode
