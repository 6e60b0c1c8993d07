"""Contrastive training objectives.

Parity with the reference ``TwoTowerTrainTask`` losses
(two_tower_train_task.py:99-158):

* ``bidirectional_ce_loss`` - in-batch negatives: S = N C^T / tau, labels on
  the diagonal, loss = 1/2 (CE(S) + CE(S^T)), optional label smoothing. This
  *is* the symmetric sampled-softmax over in-batch candidates; with the batch
  sharded over the mesh's data axis and embeddings produced under jit, the
  candidate set is the full global batch (XLA all-gathers one side).
* ``cosine_embedding_loss`` - the reference's alternative pairwise loss.

An optional fused Pallas path (ops/fused_logits.py) computes the CE loss
without materializing the [B, B] logits matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_use_fused(loss_cfg) -> bool:
    """Resolve ``LossConfig.use_fused_logits`` ("auto" | bool) to a bool.

    "auto" turns the fused Pallas CE on exactly where it is the right
    default: a TPU backend and the cross_entropy loss (measured 10.3x the
    materializing XLA path at B=8192, and the only runnable form at global
    B>=32768 — BENCHMARKS.md). Off-TPU it resolves False so CPU dev/test
    runs keep the materialized similarity matrix (full per-step metric
    surface, no interpret-mode Pallas). Shapes outside the kernel envelope
    fall back to XLA inside ops/fused_logits either way
    (ops/fused_logits._supported / _kernel_ok).
    """
    v = loss_cfg.use_fused_logits
    if v == "auto":
        return (
            jax.default_backend() == "tpu"
            and loss_cfg.loss_type == "cross_entropy"
        )
    return bool(v)


def _smoothed_ce(logits: jax.Array, label_smoothing: float) -> jax.Array:
    """Mean CE with diagonal labels over rows of ``logits`` [B, B]."""
    b = logits.shape[0]
    logp = jax.nn.log_softmax(logits, axis=-1)
    diag = jnp.diagonal(logp)
    if label_smoothing > 0.0:
        off = label_smoothing / b
        # smoothed target: (1 - eps) on the diagonal + eps/B everywhere
        loss = -(1.0 - label_smoothing) * diag - off * jnp.sum(logp, axis=-1)
    else:
        loss = -diag
    return jnp.mean(loss)


def bidirectional_ce_loss(
    notice_emb: jax.Array,
    company_emb: jax.Array,
    *,
    temperature: float = 1.0,
    label_smoothing: float = 0.0,
    use_fused: bool = False,
    normalized_inputs: bool = False,
):
    """Returns (loss, similarity [B, B]) for aligned positive pairs.

    ``normalized_inputs``: set True only when BOTH embeddings are
    L2-normalized (the tower contract, models/tower.py) — it proves the
    static bound |logits| <= 1/temperature that lets the fused lean kernel
    drop its max-shift passes (~2x on the VPU-bound forward). With the
    default False the fused path uses the numerically-shifted kernel, safe
    for arbitrary (unnormalized) inputs.
    """
    if use_fused:
        from jodalrob_twotower_tpu.ops.fused_logits import fused_bidirectional_ce

        # nondiff custom_vjp args are positional: (temperature, smoothing,
        # interpret, max_abs_logit)
        loss = fused_bidirectional_ce(
            notice_emb, company_emb, temperature, label_smoothing, False,
            (1.0 / temperature) if normalized_inputs else None,
        )
        return loss, None
    sim = jnp.dot(notice_emb, company_emb.T, preferred_element_type=jnp.float32) / temperature
    loss = 0.5 * (_smoothed_ce(sim, label_smoothing) + _smoothed_ce(sim.T, label_smoothing))
    return loss, sim


def cosine_embedding_loss(
    notice_emb: jax.Array,
    company_emb: jax.Array,
    *,
    margin: float = 0.0,
):
    """Pairwise cosine loss with one shifted negative per positive.

    Mirrors the reference's torch CosineEmbeddingLoss usage
    (two_tower_train_task.py:136-158): positives are aligned rows; negatives
    pair row i with company row i+1 (mod B).
    """
    pos = jnp.sum(notice_emb * company_emb, axis=-1)
    neg = jnp.sum(notice_emb * jnp.roll(company_emb, shift=-1, axis=0), axis=-1)
    loss = jnp.mean(1.0 - pos) + jnp.mean(jnp.maximum(neg - margin, 0.0))
    sim = jnp.dot(notice_emb, company_emb.T, preferred_element_type=jnp.float32)
    return loss, sim


def compute_loss(
    loss_type: str,
    notice_emb: jax.Array,
    company_emb: jax.Array,
    *,
    temperature: float = 1.0,
    label_smoothing: float = 0.0,
    margin: float = 0.0,
    use_fused: bool = False,
    normalized_inputs: bool = False,
):
    if loss_type == "cross_entropy":
        return bidirectional_ce_loss(
            notice_emb,
            company_emb,
            temperature=temperature,
            label_smoothing=label_smoothing,
            use_fused=use_fused,
            normalized_inputs=normalized_inputs,
        )
    if loss_type == "cosine_embedding":
        return cosine_embedding_loss(notice_emb, company_emb, margin=margin)
    raise ValueError(f"unknown loss_type {loss_type!r}")
