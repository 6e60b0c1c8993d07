"""In-batch ranking metrics, fully vectorized.

Parity with the reference metric surface (two_tower_train_task.py:162-179,
evaluator.py:20-71): top-1 accuracy, recall@k, MRR, positive/negative mean
similarity and their gap - all computed over the in-batch similarity matrix
with the true match on the diagonal. The reference computed MRR with a
per-row python loop (evaluator.py:45-71); here ranks come from one
comparison + row-sum, so everything stays on device and jit-fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diagonal_ranks(sim: jax.Array) -> jax.Array:
    """0-based rank of the diagonal entry within each row (ties favor the
    positive, matching argsort-based ranking of distinct scores)."""
    diag = jnp.diagonal(sim)
    return jnp.sum(sim > diag[:, None], axis=-1)


def in_batch_metrics(sim: jax.Array, recall_ks: tuple[int, ...] = (5, 10)) -> dict[str, jax.Array]:
    """All in-batch metrics from a [B, B] similarity matrix."""
    b = sim.shape[0]
    ranks = diagonal_ranks(sim)
    diag = jnp.diagonal(sim)
    mean_all = jnp.mean(sim, axis=-1)
    # mean over the B-1 off-diagonal candidates per row
    neg_mean = (mean_all * b - diag) / jnp.maximum(b - 1, 1)

    metrics = {
        "accuracy": jnp.mean((ranks == 0).astype(jnp.float32)),
        "mrr": jnp.mean(1.0 / (ranks.astype(jnp.float32) + 1.0)),
        # in-batch ROC-AUC: P(pos scores above a random negative); rank r
        # means r of the B-1 negatives beat the positive
        "auc": jnp.mean(1.0 - ranks.astype(jnp.float32) / jnp.maximum(b - 1, 1)),
        "positive_similarity": jnp.mean(diag),
        "negative_similarity": jnp.mean(neg_mean),
    }
    metrics["similarity_gap"] = metrics["positive_similarity"] - metrics["negative_similarity"]
    # Z-gap: the reference's normalized separation indicator displayed on
    # every train/val progress line — sim_gap / max(|neg_sim| + 1e-8, 1e-8)
    # (reference scripts/train.py:347-351, :409-413)
    metrics["z_gap"] = metrics["similarity_gap"] / (
        jnp.abs(metrics["negative_similarity"]) + 1e-8
    )
    for k in recall_ks:
        metrics[f"recall@{k}"] = jnp.mean((ranks < k).astype(jnp.float32))
    return metrics


def random_baselines(batch_size: int, recall_ks: tuple[int, ...] = (5, 10)) -> dict[str, float]:
    """Expected values of the in-batch metrics for a random scorer
    (the reference printed these alongside eval results, evaluator.py:195-267)."""
    out = {"accuracy": 1.0 / batch_size}
    out.update({f"recall@{k}": min(k / batch_size, 1.0) for k in recall_ks})
    # E[MRR] = H(B)/B for a uniform random rank
    out["mrr"] = float(sum(1.0 / r for r in range(1, batch_size + 1)) / batch_size)
    return out
