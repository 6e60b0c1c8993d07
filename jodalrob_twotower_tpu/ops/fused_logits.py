"""Fused in-batch-negative logits: Pallas TPU kernel.

The reference materializes the [B, B] similarity matrix in HBM and runs
separate softmax/CE/metric ops over it (two_tower_train_task.py:99-179).
At B=8192 that matrix is 268 MB of f32 — and on a bandwidth-bound chip every
extra pass over it costs more than the matmul itself.

This kernel computes S = (N/τ) Cᵀ **tile by tile in VMEM** and reduces each
tile online, so S never touches HBM. One forward pass yields everything the
loss AND the in-batch metrics need, per row i / column j:

  row_lse_i  = logsumexp_j S_ij      col_lse_j = logsumexp_i S_ij
  row_sum_i  = Σ_j S_ij              col_sum_j = Σ_i S_ij
  diag_i     = S_ii
  rank_i     = #{j : S_ij > S_ii}    (0-based rank of the positive)

Bidirectional CE with label smoothing ε (reference semantics,
two_tower_train_task.py:114-134):

  L = ½·mean_i[(1-ε)(row_lse_i - diag_i) + (ε/B)(B·row_lse_i - row_sum_i)]
    + ½·mean_j[(1-ε)(col_lse_j - diag_j) + (ε/B)(B·col_lse_j - col_sum_j)]

The backward kernel recomputes each S tile (cheap: FLOPs are ~free vs HBM
here) and contracts the softmax residual against C / N without ever forming
S in HBM either:

  ∂L/∂S_ij = (1/2B)[P_row_ij + P_col_ij - 2(1-ε)δ_ij - 2ε/B]
  with P_row_ij = exp(S_ij - row_lse_i), P_col_ij = exp(S_ij - col_lse_j).

Grid is over row blocks; C stays resident in VMEM (B·D·2 = 2 MB bf16 at
B=8192, D=128); per-block VMEM is the [bm, B] f32 tile. Shapes outside the
supported envelope fall back to the XLA path automatically.

The kernels take N and C in **bfloat16** (f32 accumulation). This is
numerically FREE on this chip: the MXU multiplies bf16 natively and XLA
runs with ``--xla_allow_excess_precision=true``, so the previous f32-input
version produced bit-identical forward stats (measured) while paying 2x
the VMEM — the f32 backward sat at 16.01 MB vs the 16.00 MB scoped-VMEM
ceiling and OOMed whenever an extra op fused into its jit. Backward
gradients differ from exact-f32 math by ~2e-4 relative (the softmax
residual is contracted in bf16), standard bf16-training precision.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block height. B must be divisible by it; 128 keeps the [bm, B] f32
# tile at 4 MB for B=8192 so forward fits in ~7 MB and backward in ~11 MB
# of the 16 MB scoped VMEM.
_BM = 128
# Supported envelope for the kernel (beyond it, fall back to XLA). At
# B=16384 the backward's resident set (s tile + bf16 C + f32 dc
# accumulator) exceeds 16 MB VMEM for any bm, so the cap is a real limit,
# not a guess — raising it trades for a dc-revisit-by-blocks redesign.
_MAX_B = 8192
_NEG_INF = -1e30


class FusedStats(NamedTuple):
    """Per-row/column statistics of the similarity matrix (all [B])."""

    row_lse: jax.Array
    row_sum: jax.Array
    diag: jax.Array
    rank: jax.Array
    col_lse: jax.Array
    col_sum: jax.Array


def _supported(b: int, d: int) -> bool:
    return b % _BM == 0 and b <= _MAX_B and d % 128 == 0


# ---------------------------------------------------------------------------
# forward: stats kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(n_ref, c_ref, row_ref, col_ref, colm_ref, cols_ref, colsum_ref):
    """Grid: (B/_BM,). n_ref: [bm, D] block; c_ref: [B, D] full.

    row_ref: [bm, 4] out block (lse, sum, diag, rank).
    col_ref: [2, B] out, revisited (written on the last block: lse, sum).
    colm/cols/colsum: [1, B] f32 VMEM scratch — running col max / scaled
    sumexp / sum, carried across the sequential grid.
    """
    i = pl.program_id(0)
    nblk = n_ref.shape[0]
    b = c_ref.shape[0]

    s = jnp.dot(
        n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32
    )  # [bm, B]

    # --- row stats ---------------------------------------------------------
    row_max = jnp.max(s, axis=1, keepdims=True)
    row_lse = jnp.log(jnp.sum(jnp.exp(s - row_max), axis=1, keepdims=True)) + row_max
    row_sum = jnp.sum(s, axis=1, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    diag_mask = cols == rows + i * nblk
    diag = jnp.sum(jnp.where(diag_mask, s, 0.0), axis=1, keepdims=True)
    rank = jnp.sum((s > diag).astype(jnp.float32), axis=1, keepdims=True)
    row_ref[:, :] = jnp.concatenate([row_lse, row_sum, diag, rank], axis=1)

    # --- column accumulators (online logsumexp across row blocks) ----------
    blk_max = jnp.max(s, axis=0, keepdims=True)  # [1, B]
    blk_sum = jnp.sum(s, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        colm_ref[:, :] = jnp.full_like(blk_max, _NEG_INF)
        cols_ref[:, :] = jnp.zeros_like(blk_max)
        colsum_ref[:, :] = jnp.zeros_like(blk_sum)

    old_m = colm_ref[:, :]
    new_m = jnp.maximum(old_m, blk_max)
    scale = jnp.exp(old_m - new_m)
    blk_exp = jnp.sum(jnp.exp(s - new_m), axis=0, keepdims=True)
    colm_ref[:, :] = new_m
    cols_ref[:, :] = cols_ref[:, :] * scale + blk_exp
    colsum_ref[:, :] = colsum_ref[:, :] + blk_sum

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        col_ref[0:1, :] = jnp.log(cols_ref[:, :]) + colm_ref[:, :]
        col_ref[1:2, :] = colsum_ref[:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_stats_call(n_scaled, c, *, interpret: bool = False):
    b, d = n_scaled.shape
    bm = _BM if b % _BM == 0 else b
    grid = (b // bm,)
    row_stats, col_stats = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4), jnp.float32),
            jax.ShapeDtypeStruct((2, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
        ],
        interpret=interpret,
    )(n_scaled.astype(jnp.bfloat16), c.astype(jnp.bfloat16))
    return row_stats, col_stats


def _stats_xla(n_scaled, c) -> FusedStats:
    """Reference path: same stats via plain XLA ops (materializes S)."""
    s = jnp.dot(n_scaled, c.T, preferred_element_type=jnp.float32)
    diag = jnp.diagonal(s)
    return FusedStats(
        row_lse=jax.nn.logsumexp(s, axis=1),
        row_sum=jnp.sum(s, axis=1),
        diag=diag,
        rank=jnp.sum((s > diag[:, None]).astype(jnp.float32), axis=1),
        col_lse=jax.nn.logsumexp(s, axis=0),
        col_sum=jnp.sum(s, axis=0),
    )


def fused_stats(
    n: jax.Array,
    c: jax.Array,
    *,
    temperature: float = 1.0,
    interpret: bool = False,
    force_xla: bool = False,
) -> FusedStats:
    """All similarity-matrix statistics without materializing it in HBM."""
    n_scaled = n.astype(jnp.float32) / temperature
    c = c.astype(jnp.float32)
    b, d = n_scaled.shape
    if force_xla or not _supported(b, d):
        return _stats_xla(n_scaled, c)
    row_stats, col_stats = _fused_stats_call(n_scaled, c, interpret=interpret)
    return FusedStats(
        row_lse=row_stats[:, 0],
        row_sum=row_stats[:, 1],
        diag=row_stats[:, 2],
        rank=row_stats[:, 3],
        col_lse=col_stats[0],
        col_sum=col_stats[1],
    )


# ---------------------------------------------------------------------------
# forward: lean loss-only kernel (no rank / plain sums)
# ---------------------------------------------------------------------------


def _fwd_lean_kernel(n_ref, c_ref, row_ref, col_ref, colm_ref, cols_ref):
    """Loss-only stats: row_lse and col_lse. Skips the rank / row_sum /
    col_sum / diag VPU passes of :func:`_fwd_kernel` — at B=8192 the kernel
    is VPU-bound on its reductions, not MXU-bound on the dot, so the loss
    path (label_smoothing == 0, metrics not requested) saves ~a third of
    the forward kernel time. The diagonal is NOT computed here: outside the
    kernel it is a [B, D] rowsum (B·D elements) instead of a masked pass
    over the [bm, B] tile (B² elements — 64x more work at D=128).
    row_ref: [bm, 1] out (lse); col_ref: [1, B] out (lse, last block)."""
    i = pl.program_id(0)

    s = jnp.dot(
        n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32
    )  # [bm, B]

    row_max = jnp.max(s, axis=1, keepdims=True)
    row_ref[:, :] = (
        jnp.log(jnp.sum(jnp.exp(s - row_max), axis=1, keepdims=True)) + row_max
    )

    blk_max = jnp.max(s, axis=0, keepdims=True)  # [1, B]

    @pl.when(i == 0)
    def _():
        colm_ref[:, :] = jnp.full_like(blk_max, _NEG_INF)
        cols_ref[:, :] = jnp.zeros_like(blk_max)

    old_m = colm_ref[:, :]
    new_m = jnp.maximum(old_m, blk_max)
    scale = jnp.exp(old_m - new_m)
    blk_exp = jnp.sum(jnp.exp(s - new_m), axis=0, keepdims=True)
    colm_ref[:, :] = new_m
    cols_ref[:, :] = cols_ref[:, :] * scale + blk_exp

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        col_ref[0:1, :] = jnp.log(cols_ref[:, :]) + colm_ref[:, :]


def _fwd_lean_nomax_kernel(n_ref, c_ref, row_ref, col_ref, cols_ref):
    """Unshifted lean forward. With L2-normalized towers |s| <= 1/τ, so
    when 1/τ <= _NOMAX_MAX_ABS the raw exp cannot overflow f32 (exp(60) ~
    1e26, times B=8192 terms ~ 1e30 << f32 max 3.4e38) and the max-shift
    machinery is pure overhead: this kernel does ONE exp pass and two sums
    where the stable kernel does two maxes, two exps, two sums and an
    online col merge — the lean forward is VPU-bound, so this is ~2x."""
    i = pl.program_id(0)

    s = jnp.dot(
        n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32
    )  # [bm, B]
    es = jnp.exp(s)
    row_ref[:, :] = jnp.log(jnp.sum(es, axis=1, keepdims=True))

    @pl.when(i == 0)
    def _():
        cols_ref[:, :] = jnp.zeros_like(cols_ref)

    cols_ref[:, :] += jnp.sum(es, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        col_ref[0:1, :] = jnp.log(cols_ref[:, :])


# |s| bound (= 1/temperature for unit-norm towers) below which the
# unshifted kernel is numerically safe in f32 with plenty of margin
_NOMAX_MAX_ABS = 60.0


@functools.partial(jax.jit, static_argnames=("interpret", "max_abs_logit"))
def _fused_lean_call(n_scaled, c, *, interpret: bool = False,
                     max_abs_logit: float | None = None):
    """Returns (row_lse [B], col_lse [B]). ``max_abs_logit`` is a STATIC
    bound on |logits| the caller can prove (1/τ for unit-norm inputs);
    when it is within the no-overflow margin the cheaper unshifted kernel
    runs, otherwise the max-shifted online-merge kernel."""
    b, d = n_scaled.shape
    bm = _BM if b % _BM == 0 else b
    grid = (b // bm,)
    nomax = max_abs_logit is not None and max_abs_logit <= _NOMAX_MAX_ABS
    row_lse, col_lse = pl.pallas_call(
        _fwd_lean_nomax_kernel if nomax else _fwd_lean_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((1, b), jnp.float32)]
            if nomax
            else [
                pltpu.VMEM((1, b), jnp.float32),
                pltpu.VMEM((1, b), jnp.float32),
            ]
        ),
        interpret=interpret,
    )(n_scaled.astype(jnp.bfloat16), c.astype(jnp.bfloat16))
    return row_lse[:, 0], col_lse[0]


# ---------------------------------------------------------------------------
# loss from stats
# ---------------------------------------------------------------------------


def _loss_from_stats(stats: FusedStats, label_smoothing: float) -> jax.Array:
    b = stats.row_lse.shape[0]
    eps = label_smoothing

    def side(lse, ssum):
        base = (1.0 - eps) * (lse - stats.diag)
        if eps:
            base = base + (eps / b) * (b * lse - ssum)
        return jnp.mean(base)

    return 0.5 * (side(stats.row_lse, stats.row_sum) + side(stats.col_lse, stats.col_sum))


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(n_ref, c_ref, rowlse_ref, collse_ref, eps_ref, dn_ref, dc_ref):
    """Grid: (B/_BM,). Recompute the S tile, form ∂L/∂S, contract.

    n_ref [bm, D] block, c_ref [B, D] full, rowlse_ref [bm, 1] block,
    collse_ref [1, B] full, eps_ref [1, 1] SMEM (label smoothing).
    dn_ref [bm, D] out block; dc_ref [B, D] out, revisited + accumulated.
    """
    i = pl.program_id(0)
    nblk = n_ref.shape[0]
    b = c_ref.shape[0]
    eps = eps_ref[0, 0]
    inv2b = 0.5 / b

    s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)
    p_row = jnp.exp(s - rowlse_ref[:, :])  # [bm, B]
    p_col = jnp.exp(s - collse_ref[:, :])  # broadcast [1,B]
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    diag = (cols == rows + i * nblk).astype(jnp.float32)
    # bf16 residual for the contractions: matches the inputs' precision so
    # both dots hit the MXU's native single-pass path (f32 x bf16 would
    # force a multi-pass f32 dot); error vs exact-f32 grads ~2e-4 relative.
    a = (inv2b * (p_row + p_col - 2.0 * (1.0 - eps) * diag - (2.0 * eps) / b)).astype(
        jnp.bfloat16
    )

    dn_ref[:, :] = jnp.dot(a, c_ref[:, :], preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref)

    dc_ref[:, :] += jnp.dot(a.T, n_ref[:, :], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_bwd_call(n_scaled, c, row_lse, col_lse, eps, *, interpret: bool = False):
    b, d = n_scaled.shape
    bm = _BM if b % _BM == 0 else b
    grid = (b // bm,)
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    dn, dc = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        n_scaled.astype(jnp.bfloat16),
        c.astype(jnp.bfloat16),
        row_lse.reshape(b, 1),
        col_lse.reshape(1, b),
        eps_arr,
    )
    return dn, dc


# ---------------------------------------------------------------------------
# public: differentiable fused loss
# ---------------------------------------------------------------------------


def _ce_primal(n, c, temperature, label_smoothing, interpret, max_abs_logit):
    """Loss + (row_lse, col_lse) residuals. With label_smoothing == 0 the
    loss needs only row_lse/diag/col_lse, so the lean kernel skips the
    rank/sum VPU passes (the stats kernel is VPU-bound, not MXU-bound)."""
    n_scaled = n.astype(jnp.float32) / temperature
    b, d = n_scaled.shape
    if label_smoothing == 0.0 and _supported(b, d):
        row_lse, col_lse = _fused_lean_call(
            n_scaled, c.astype(jnp.float32), interpret=interpret,
            max_abs_logit=max_abs_logit,
        )
        # diag_i = S_ii as an O(B·D) rowsum; bf16-round the operands exactly
        # like the kernel rounds its dot inputs so diag matches the lse's S
        nb = n_scaled.astype(jnp.bfloat16).astype(jnp.float32)
        cb = c.astype(jnp.bfloat16).astype(jnp.float32)
        diag = jnp.sum(nb * cb, axis=1)
        loss = 0.5 * (jnp.mean(row_lse - diag) + jnp.mean(col_lse - diag))
        return loss, (row_lse, col_lse)
    stats = fused_stats(n, c, temperature=temperature, interpret=interpret)
    return _loss_from_stats(stats, label_smoothing), (stats.row_lse, stats.col_lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_bidirectional_ce(
    n: jax.Array,
    c: jax.Array,
    temperature: float = 1.0,
    label_smoothing: float = 0.0,
    interpret: bool = False,
    max_abs_logit: float | None = None,
) -> jax.Array:
    """Bidirectional in-batch-negatives CE, O(B·D) HBM traffic.

    ``max_abs_logit``: STATIC bound on |logits| the caller can prove —
    pass ``1/temperature`` when both inputs are L2-normalized (the tower
    contract, models/tower.py). Within the f32 no-overflow margin it lets
    the lean forward drop its max-shift passes (~2x on the VPU-bound
    forward). ``None`` always uses the numerically-shifted kernel."""
    return _ce_primal(n, c, temperature, label_smoothing, interpret,
                      max_abs_logit)[0]


def _ce_fwd(n, c, temperature, label_smoothing, interpret, max_abs_logit):
    loss, (row_lse, col_lse) = _ce_primal(
        n, c, temperature, label_smoothing, interpret, max_abs_logit
    )
    return loss, (n, c, row_lse, col_lse)


def _ce_bwd(temperature, label_smoothing, interpret, max_abs_logit, res, g):
    n, c, row_lse, col_lse = res
    n_scaled = n.astype(jnp.float32) / temperature
    c32 = c.astype(jnp.float32)
    b, d = n_scaled.shape
    if _supported(b, d):
        dn_s, dc = _fused_bwd_call(
            n_scaled, c32, row_lse, col_lse, label_smoothing, interpret=interpret
        )
    else:
        s = jnp.dot(n_scaled, c32.T, preferred_element_type=jnp.float32)
        p_row = jnp.exp(s - row_lse[:, None])
        p_col = jnp.exp(s - col_lse[None, :])
        eye = jnp.eye(b, dtype=jnp.float32)
        a = (0.5 / b) * (
            p_row + p_col - 2.0 * (1.0 - label_smoothing) * eye - 2.0 * label_smoothing / b
        )
        dn_s = jnp.dot(a, c32, preferred_element_type=jnp.float32)
        dc = jnp.dot(a.T, n_scaled, preferred_element_type=jnp.float32)
    dn = (g * dn_s / temperature).astype(n.dtype)
    dc = (g * dc).astype(c.dtype)
    return dn, dc


fused_bidirectional_ce.defvjp(_ce_fwd, _ce_bwd)


# ---------------------------------------------------------------------------
# public: fused in-batch metrics (eval path)
# ---------------------------------------------------------------------------


def fused_in_batch_metrics(
    n: jax.Array,
    c: jax.Array,
    *,
    temperature: float = 1.0,
    recall_ks: tuple[int, ...] = (5, 10),
    interpret: bool = False,
) -> dict[str, jax.Array]:
    """Same metric surface as train.metrics.in_batch_metrics, one fused pass.

    Note diag/pos/neg are in similarity-over-temperature units, matching the
    reference which computed metrics on the scaled matrix
    (two_tower_train_task.py:162-179).
    """
    stats = fused_stats(n, c, temperature=temperature, interpret=interpret)
    b = stats.row_lse.shape[0]
    ranks = stats.rank
    neg_mean = (stats.row_sum - stats.diag) / jnp.maximum(b - 1, 1)
    metrics = {
        "accuracy": jnp.mean((ranks == 0).astype(jnp.float32)),
        "mrr": jnp.mean(1.0 / (ranks + 1.0)),
        "auc": jnp.mean(1.0 - ranks / jnp.maximum(b - 1, 1)),
        "positive_similarity": jnp.mean(stats.diag),
        "negative_similarity": jnp.mean(neg_mean),
    }
    metrics["similarity_gap"] = metrics["positive_similarity"] - metrics["negative_similarity"]
    for k in recall_ks:
        metrics[f"recall@{k}"] = jnp.mean((ranks < k).astype(jnp.float32))
    return metrics
