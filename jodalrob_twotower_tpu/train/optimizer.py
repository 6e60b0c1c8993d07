"""Optimizers: AdamW for dense params + rowwise Adagrad for embedding tables.

The reference used a single torch Adam with LambdaLR linear warmup
(scripts/train.py:231-242). Here the dense tower params keep AdamW parity,
while the (potentially huge, row-sharded) embedding tables get **rowwise
Adagrad**: one accumulator scalar per table row (mean of squared grads over
the embedding dim), the standard memory-efficient sparse-table optimizer
(BASELINE north star). The accumulator is [rows, 1], so it shards exactly
like the table rows.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from jodalrob_twotower_tpu.config import OptimizerConfig


class RowwiseAdagradState(NamedTuple):
    accumulator: optax.Params  # pytree matching params, leaves [rows, 1]


def rowwise_adagrad(
    learning_rate: float = 1.0,
    *,
    init_accumulator: float = 0.1,
    eps: float = 1e-10,
) -> optax.GradientTransformation:
    """Adagrad with one accumulator per row (leading dim) of each param.

    Emits descent-direction updates scaled by the (static) ``learning_rate``;
    compose with ``optax.scale_by_schedule`` for warmup/decay schedules.
    """

    def init_fn(params):
        acc = jax.tree.map(
            lambda p: jnp.full((p.shape[0],) + (1,) * (p.ndim - 1), init_accumulator, p.dtype),
            params,
        )
        return RowwiseAdagradState(accumulator=acc)

    def update_fn(updates, state, params=None):
        del params
        new_acc = jax.tree.map(
            lambda g, a: a + jnp.mean(jnp.square(g), axis=tuple(range(1, g.ndim)), keepdims=True),
            updates,
            state.accumulator,
        )
        new_updates = jax.tree.map(
            lambda g, a: -learning_rate * g * jax.lax.rsqrt(a + eps),
            updates,
            new_acc,
        )
        return new_updates, RowwiseAdagradState(accumulator=new_acc)

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_constant_schedule(base_lr: float, total_steps: int, warmup_ratio: float) -> optax.Schedule:
    """Linear warmup to base_lr over warmup_ratio * total_steps, then constant
    (reference LambdaLR semantics, scripts/train.py:231-242)."""
    warmup_steps = max(int(total_steps * warmup_ratio), 1)

    def schedule(step):
        # 1-indexed so the very first update has a nonzero rate
        frac = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
        return base_lr * frac

    return schedule


def _is_embedding_table(path: tuple) -> bool:
    return any(getattr(k, "key", k) == "embeddings" for k in path)


def embedding_param_labels(params) -> optax.Params:
    """Label each param leaf 'table' (embedding rows) or 'dense'."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "table" if _is_embedding_table(path) else "dense", params
    )


def build_optimizer(
    cfg: OptimizerConfig,
    total_steps: int,
) -> optax.GradientTransformation:
    """AdamW(dense) + rowwise-Adagrad(tables), shared warmup schedule."""
    schedule = warmup_constant_schedule(cfg.learning_rate, total_steps, cfg.warmup_ratio)
    emb_lr = cfg.embedding_learning_rate or cfg.learning_rate
    emb_schedule = warmup_constant_schedule(emb_lr, total_steps, cfg.warmup_ratio)

    mu_dtype = (
        jnp.bfloat16
        if getattr(cfg, "adam_moment_dtype", "float32") == "bfloat16"
        else None
    )
    # mu only: nu's b2=0.999 EMA increments (~1e-3 relative) sit below
    # bf16's mantissa granularity (~4e-3) — a bf16 nu freezes instead of
    # accumulating (measured, BENCHMARKS.md "bf16 optimizer moments")
    dense_tx = optax.adamw(
        learning_rate=schedule, weight_decay=cfg.weight_decay,
        mu_dtype=mu_dtype,
    )
    if cfg.embedding_optimizer == "rowwise_adagrad":
        table_tx = optax.chain(
            rowwise_adagrad(
                1.0, init_accumulator=cfg.adagrad_init_accumulator, eps=cfg.adagrad_eps
            ),
            # rowwise_adagrad emits the negative preconditioned step at unit lr;
            # scale_by_schedule then applies the warmup schedule (sign preserved).
            optax.scale_by_schedule(emb_schedule),
        )
    elif cfg.embedding_optimizer == "adamw":
        table_tx = optax.adamw(learning_rate=emb_schedule, weight_decay=0.0)
    else:
        raise ValueError(f"unknown embedding_optimizer {cfg.embedding_optimizer!r}")

    tx = optax.multi_transform(
        {"dense": dense_tx, "table": table_tx}, param_labels=embedding_param_labels
    )
    if cfg.gradient_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip_norm), tx)
    return tx
