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


def _kernel_ok(interpret: bool) -> bool:
    """The TPU kernels only lower on TPU (or anywhere in interpret mode).
    Off-TPU callers of the fused API silently get the XLA path instead of
    a Mosaic lowering error — `use_fused_logits=True` configs stay runnable
    on the CPU dev/test meshes at any shape."""
    return interpret or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# forward: stats kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(n_ref, c_ref, off_ref, row_ref, col_ref, colm_ref, cols_ref, colsum_ref):
    """Grid: (rows/_BM,). n_ref: [bm, D] block; c_ref: [B, D] full.

    off_ref: [1] SMEM int32 — global row index of n's first row (0 on a
    single device; shard_offset under the sharded wrapper, so the diagonal
    mask lands on column ``offset + local_row``).
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
    diag_mask = cols == rows + i * nblk + off_ref[0]
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
def _fused_stats_call(n_scaled, c, row_offset=None, *, interpret: bool = False):
    """n_scaled [rows, D] (a row shard or the full batch), c [B, D] full.
    ``row_offset``: int32 scalar array, global row index of n's first row
    (None -> 0, the single-device square case)."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    grid = (rows // bm,)
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    row_stats, col_stats = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 4), jnp.float32),
            jax.ShapeDtypeStruct((2, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
        ],
        interpret=interpret,
    )(n_scaled.astype(jnp.bfloat16), c.astype(jnp.bfloat16), off)
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
    """All similarity-matrix statistics without materializing it in HBM.

    Dispatch: VMEM-resident kernel up to B=8192, col-blocked kernel beyond
    (to B=65536), XLA fallback outside both envelopes (or off-TPU)."""
    n_scaled = n.astype(jnp.float32) / temperature
    c = c.astype(jnp.float32)
    b, d = n_scaled.shape
    if force_xla or not _kernel_ok(interpret):
        return _stats_xla(n_scaled, c)
    if _supported(b, d):
        row_stats, col_stats = _fused_stats_call(n_scaled, c, interpret=interpret)
    elif _blocked_supported(b, b, d):
        row_stats, col_stats = _fused_stats_blocked_call(
            n_scaled, c, interpret=interpret
        )
    else:
        return _stats_xla(n_scaled, c)
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
    """Returns (row_lse [rows], col_lse [B]) for n [rows, D] against c
    [B, D] (rows == B single-device; rows == B/n_shards under the sharded
    wrapper, whose col_lse output is then the shard-partial logsumexp over
    its rows). ``max_abs_logit`` is a STATIC bound on |logits| the caller
    can prove (1/τ for unit-norm inputs); when it is within the no-overflow
    margin the cheaper unshifted kernel runs, otherwise the max-shifted
    online-merge kernel."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    grid = (rows // bm,)
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
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
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
# forward/backward: COL-BLOCKED lean kernels (B beyond the VMEM-resident cap)
# ---------------------------------------------------------------------------
#
# The resident kernels above hold all of C in VMEM, capping B at 8192. Past
# that, C streams through VMEM in [bn, D] column blocks over a 2-D grid
# (row blocks outer, col blocks inner) and BOTH softmax reductions run
# online: the row lse accumulates across the inner col sweep in a [bm, 1]
# scratch, the col lse accumulates across the outer row sweep in a [1, B]
# scratch (8 bytes/col — 0.5 MB at B=65536). C is re-read once per row
# block (2·B²/bm·D bytes total: ~0.5 ms at B=16384 — still nothing next to
# the XLA path's [B, B] HBM materialization, 1 GB at B=16384). The
# backward runs as TWO passes so every accumulator is a consecutively
# revisited block: dn with cols inner, dc with rows inner — recomputing S
# twice costs FLOPs, which this chip has to spare (the O(B²) HBM blob is
# the thing being avoided). BOTH surfaces get blocked variants: the lean
# loss (label_smoothing == 0) and, via _fwd_stats_blocked_kernel below, the
# full stats surface (smoothing loss + fused metrics) — the backward's
# ∂L/∂S tile carries the eps term either way.

_BN_BLOCKED = 1024  # col-block width (the [bm, bn] f32 tile: 512 KB)
_MAX_B_BLOCKED = 65536  # col-scratch [1, B] f32 x2 = 0.5 MB; plenty of slack


def _blocked_supported(rows: int, b: int, d: int) -> bool:
    return (
        _MAX_B < b <= _MAX_B_BLOCKED
        and b % _BN_BLOCKED == 0
        and d % 128 == 0
        and (rows % _BM == 0 or rows <= _BM)
    )


def _fwd_lean_blocked_kernel(nomax: bool):
    """Factory: grid (rows/bm, B/bn), n block [bm, D] (row-indexed), c block
    [bn, D] (col-indexed). Outputs row_lse [rows, 1] (row-indexed block,
    finalized on the last col block) and col_lse [1, B] (same full block
    every program; each col slice finalized on the last row block).
    Scratch: row online state [bm, 1] (x2 shifted), col online state [1, B]
    (x2 shifted) — col state persists across the whole grid."""

    if nomax:

        def kernel(n_ref, c_ref, row_ref, col_ref, rowe_ref, cole_ref):
            i, j = pl.program_id(0), pl.program_id(1)
            nj = pl.num_programs(1)
            bn = c_ref.shape[0]
            s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)
            es = jnp.exp(s)

            @pl.when(j == 0)
            def _():
                rowe_ref[:, :] = jnp.zeros_like(rowe_ref)

            rowe_ref[:, :] += jnp.sum(es, axis=1, keepdims=True)

            @pl.when(j == nj - 1)
            def _():
                row_ref[:, :] = jnp.log(rowe_ref[:, :])

            @pl.when(i == 0)
            def _():
                cole_ref[0:1, pl.ds(j * bn, bn)] = jnp.zeros((1, bn), jnp.float32)

            cole_ref[0:1, pl.ds(j * bn, bn)] += jnp.sum(es, axis=0, keepdims=True)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                col_ref[0:1, pl.ds(j * bn, bn)] = jnp.log(
                    cole_ref[0:1, pl.ds(j * bn, bn)]
                )

        return kernel

    def kernel(n_ref, c_ref, row_ref, col_ref, rowm_ref, rowe_ref, colm_ref, cole_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        nj = pl.num_programs(1)
        bn = c_ref.shape[0]
        s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)

        # --- row online logsumexp across the col sweep -----------------------
        @pl.when(j == 0)
        def _():
            rowm_ref[:, :] = jnp.full_like(rowm_ref, _NEG_INF)
            rowe_ref[:, :] = jnp.zeros_like(rowe_ref)

        bmax = jnp.max(s, axis=1, keepdims=True)
        newm = jnp.maximum(rowm_ref[:, :], bmax)
        rowe_ref[:, :] = rowe_ref[:, :] * jnp.exp(rowm_ref[:, :] - newm) + jnp.sum(
            jnp.exp(s - newm), axis=1, keepdims=True
        )
        rowm_ref[:, :] = newm

        @pl.when(j == nj - 1)
        def _():
            row_ref[:, :] = jnp.log(rowe_ref[:, :]) + rowm_ref[:, :]

        # --- col online logsumexp across the row sweep -----------------------
        @pl.when(i == 0)
        def _():
            colm_ref[0:1, pl.ds(j * bn, bn)] = jnp.full((1, bn), _NEG_INF, jnp.float32)
            cole_ref[0:1, pl.ds(j * bn, bn)] = jnp.zeros((1, bn), jnp.float32)

        cmax = jnp.max(s, axis=0, keepdims=True)
        oldm = colm_ref[0:1, pl.ds(j * bn, bn)]
        cnewm = jnp.maximum(oldm, cmax)
        cole_ref[0:1, pl.ds(j * bn, bn)] = cole_ref[0:1, pl.ds(j * bn, bn)] * jnp.exp(
            oldm - cnewm
        ) + jnp.sum(jnp.exp(s - cnewm), axis=0, keepdims=True)
        colm_ref[0:1, pl.ds(j * bn, bn)] = cnewm

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            col_ref[0:1, pl.ds(j * bn, bn)] = (
                jnp.log(cole_ref[0:1, pl.ds(j * bn, bn)])
                + colm_ref[0:1, pl.ds(j * bn, bn)]
            )

    return kernel


_LEAN_BLOCKED = _fwd_lean_blocked_kernel(nomax=False)
_LEAN_BLOCKED_NOMAX = _fwd_lean_blocked_kernel(nomax=True)


@functools.partial(jax.jit, static_argnames=("interpret", "max_abs_logit"))
def _fused_lean_blocked_call(n_scaled, c, *, interpret: bool = False,
                             max_abs_logit: float | None = None):
    """Col-blocked lean forward: (row_lse [rows], col_lse [B])."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    bn = _BN_BLOCKED
    grid = (rows // bm, b // bn)
    nomax = max_abs_logit is not None and max_abs_logit <= _NOMAX_MAX_ABS
    scratch = [pltpu.VMEM((bm, 1), jnp.float32), pltpu.VMEM((1, b), jnp.float32)]
    if not nomax:
        scratch = [
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
        ]
    row_lse, col_lse = pl.pallas_call(
        _LEAN_BLOCKED_NOMAX if nomax else _LEAN_BLOCKED,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(n_scaled.astype(jnp.bfloat16), c.astype(jnp.bfloat16))
    return row_lse[:, 0], col_lse[0]


def _diag_mxu_kernel(n_ref, c_ref, out_ref):
    """diag_i = S_ii via the SAME MXU dot the stats tiles use.

    A VPU rowsum of the elementwise product (the lean path's diag) differs
    from the MXU's systolic f32 accumulation by ~1 ulp-to-1e-3 relative —
    harmless for the loss, but rank counts every S_ij in that window around
    the diagonal: at B=16384 that measured ~20 miscounted positions per row
    on hardware (tpu_selftest r3). Each MXU output element is an independent
    dot over D in fixed systolic order, so s_ii from this [bm, bm] dot is
    bitwise the value the [bm, bn] stats tile produces."""
    s = jnp.dot(
        n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32
    )  # [bm, bm]
    rr = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    out_ref[:, :] = jnp.sum(jnp.where(rr == cc, s, 0.0), axis=1, keepdims=True)


def _diag_mxu_call(nb, cb_aligned, *, interpret: bool = False):
    """[rows, 1] f32 diagonal from bf16 row-aligned operands."""
    rows, d = nb.shape
    bm = _BM if rows % _BM == 0 else rows
    return pl.pallas_call(
        _diag_mxu_kernel,
        grid=(rows // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        interpret=interpret,
    )(nb, cb_aligned)


def _fwd_stats_blocked_kernel(
    n_ref, c_ref, diag_ref, off_ref, row_ref, col_ref,
    rowm_ref, rowe_ref, rowsum_ref, rowrank_ref,
    colm_ref, cole_ref, colsum_ref,
):
    """Col-blocked FULL stats forward: the 2-D-grid online machinery of the
    lean blocked kernel extended to the whole stats surface (row/col lse +
    sum, diag, rank), lifting the B=8192 VMEM-resident cap for the
    label-smoothing loss and the fused metrics to B=65536.

    Grid (rows/bm, B/bn), cols inner. ``diag_ref`` [bm, 1] (row-indexed) is
    the PRECOMPUTED S_ii (rank needs the diagonal *before* the col sweep
    reaches its block, so it can't come from the in-kernel S). It comes
    from _diag_mxu_kernel — the same MXU dot as the tiles, so it is bitwise
    the tile's own s_ii; the diagonal position is additionally EXCLUDED
    from the rank count by index, never by value comparison.

    Outputs: row_ref [bm, 4] (lse, sum, diag, rank — finalized on the last
    col block); col_ref [2, B] (lse, sum — each col slice finalized on the
    last row block). Scratch: four [bm, 1] row accumulators + three [1, B]
    col accumulators (persist across the whole grid; 0.75 MB at B=65536).
    """
    i, j = pl.program_id(0), pl.program_id(1)
    nj = pl.num_programs(1)
    bm = n_ref.shape[0]
    bn = c_ref.shape[0]
    s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)

    # --- row online stats across the col sweep -----------------------------
    @pl.when(j == 0)
    def _():
        rowm_ref[:, :] = jnp.full_like(rowm_ref, _NEG_INF)
        rowe_ref[:, :] = jnp.zeros_like(rowe_ref)
        rowsum_ref[:, :] = jnp.zeros_like(rowsum_ref)
        rowrank_ref[:, :] = jnp.zeros_like(rowrank_ref)

    bmax = jnp.max(s, axis=1, keepdims=True)
    newm = jnp.maximum(rowm_ref[:, :], bmax)
    rowe_ref[:, :] = rowe_ref[:, :] * jnp.exp(rowm_ref[:, :] - newm) + jnp.sum(
        jnp.exp(s - newm), axis=1, keepdims=True
    )
    rowm_ref[:, :] = newm
    rowsum_ref[:, :] += jnp.sum(s, axis=1, keepdims=True)
    rr = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    is_diag = cc + j * bn == rr + i * bm + off_ref[0]
    rowrank_ref[:, :] += jnp.sum(
        jnp.where(jnp.logical_and(jnp.logical_not(is_diag), s > diag_ref[:, :]), 1.0, 0.0),
        axis=1,
        keepdims=True,
    )

    @pl.when(j == nj - 1)
    def _():
        row_ref[:, :] = jnp.concatenate(
            [
                jnp.log(rowe_ref[:, :]) + rowm_ref[:, :],
                rowsum_ref[:, :],
                diag_ref[:, :],
                rowrank_ref[:, :],
            ],
            axis=1,
        )

    # --- col online stats across the row sweep -----------------------------
    @pl.when(i == 0)
    def _():
        colm_ref[0:1, pl.ds(j * bn, bn)] = jnp.full((1, bn), _NEG_INF, jnp.float32)
        cole_ref[0:1, pl.ds(j * bn, bn)] = jnp.zeros((1, bn), jnp.float32)
        colsum_ref[0:1, pl.ds(j * bn, bn)] = jnp.zeros((1, bn), jnp.float32)

    cmax = jnp.max(s, axis=0, keepdims=True)
    oldm = colm_ref[0:1, pl.ds(j * bn, bn)]
    cnewm = jnp.maximum(oldm, cmax)
    cole_ref[0:1, pl.ds(j * bn, bn)] = cole_ref[0:1, pl.ds(j * bn, bn)] * jnp.exp(
        oldm - cnewm
    ) + jnp.sum(jnp.exp(s - cnewm), axis=0, keepdims=True)
    colm_ref[0:1, pl.ds(j * bn, bn)] = cnewm
    colsum_ref[0:1, pl.ds(j * bn, bn)] += jnp.sum(s, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        col_ref[0:1, pl.ds(j * bn, bn)] = (
            jnp.log(cole_ref[0:1, pl.ds(j * bn, bn)])
            + colm_ref[0:1, pl.ds(j * bn, bn)]
        )
        col_ref[1:2, pl.ds(j * bn, bn)] = colsum_ref[0:1, pl.ds(j * bn, bn)]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_stats_blocked_call(n_scaled, c, row_offset=None, *, interpret: bool = False):
    """Col-blocked full-stats forward: (row_stats [rows, 4], col_stats
    [2, B]) — the same output surface as :func:`_fused_stats_call`, for B
    beyond the VMEM-resident cap. ``row_offset``: global row index of n's
    first row (shard offset under the sharded wrapper)."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    bn = _BN_BLOCKED
    grid = (rows // bm, b // bn)
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    nb = n_scaled.astype(jnp.bfloat16)
    cb = c.astype(jnp.bfloat16)
    # rank's reference diagonal, computed once outside the grid via the SAME
    # MXU dot the stats tiles run (_diag_mxu_kernel docstring: a VPU rowsum
    # here measured ~20 rank miscounts per row at B=16384). n's row i pairs
    # with c's row off + i — under the sharded wrapper c is the all-gathered
    # [B, D] side.
    c_aligned = jax.lax.dynamic_slice_in_dim(cb, off[0], rows, axis=0)
    diag_in = _diag_mxu_call(nb, c_aligned, interpret=interpret)
    row_stats, col_stats = pl.pallas_call(
        _fwd_stats_blocked_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, b), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 4), jnp.float32),
            jax.ShapeDtypeStruct((2, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
            pltpu.VMEM((1, b), jnp.float32),
        ],
        interpret=interpret,
    )(nb, cb, diag_in, off)
    return row_stats, col_stats


def _bwd_blocked_a(s, rowlse, collse, row0, i, j, bm, bn, b, eps):
    """The shared ∂L/∂S tile for the blocked backward passes."""
    p_row = jnp.exp(s - rowlse)
    p_col = jnp.exp(s - collse)
    rr = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    diag = (cc + j * bn == rr + i * bm + row0).astype(jnp.float32)
    return ((0.5 / b) * (p_row + p_col - 2.0 * (1.0 - eps) * diag
                         - (2.0 * eps) / b)).astype(jnp.bfloat16)


def _bwd_dn_blocked_kernel(n_ref, c_ref, rowlse_ref, collse_ref, eps_ref,
                           off_ref, bglob_ref, dn_ref):
    """Grid (rows/bm, B/bn): dn block (row-indexed) accumulates over the
    inner col sweep. collse_ref: [1, bn] col-indexed block."""
    i, j = pl.program_id(0), pl.program_id(1)
    bm, bn = dn_ref.shape[0], c_ref.shape[0]
    s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)
    a = _bwd_blocked_a(s, rowlse_ref[:, :], collse_ref[:, :], off_ref[0],
                       i, j, bm, bn, bglob_ref[0], eps_ref[0, 0])

    @pl.when(j == 0)
    def _():
        dn_ref[:, :] = jnp.zeros_like(dn_ref)

    dn_ref[:, :] += jnp.dot(a, c_ref[:, :], preferred_element_type=jnp.float32)


def _bwd_dc_blocked_kernel(n_ref, c_ref, rowlse_ref, collse_ref, eps_ref,
                           off_ref, bglob_ref, dc_ref):
    """Grid (B/bn, rows/bm) — cols OUTER: dc block (col-indexed) accumulates
    over the inner row sweep."""
    j, i = pl.program_id(0), pl.program_id(1)
    bm, bn = n_ref.shape[0], dc_ref.shape[0]
    s = jnp.dot(n_ref[:, :], c_ref[:, :].T, preferred_element_type=jnp.float32)
    a = _bwd_blocked_a(s, rowlse_ref[:, :], collse_ref[:, :], off_ref[0],
                       i, j, bm, bn, bglob_ref[0], eps_ref[0, 0])

    @pl.when(i == 0)
    def _():
        dc_ref[:, :] = jnp.zeros_like(dc_ref)

    dc_ref[:, :] += jnp.dot(a.T, n_ref[:, :], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_bwd_blocked_call(n_scaled, c, row_lse, col_lse, eps,
                            row_offset=None, *, interpret: bool = False):
    """Two-pass col-blocked backward: (dn [rows, D] complete, dc [B, D]
    partial over n's rows)."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    bn = _BN_BLOCKED
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    bglob = jnp.asarray(b, jnp.int32).reshape(1)
    nb = n_scaled.astype(jnp.bfloat16)
    cb = c.astype(jnp.bfloat16)
    rl = row_lse.reshape(rows, 1)
    cl = col_lse.reshape(1, b)

    dn = pl.pallas_call(
        _bwd_dn_blocked_kernel,
        grid=(rows // bm, b // bn),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), jnp.float32),
        interpret=interpret,
    )(nb, cb, rl, cl, eps_arr, off, bglob)

    dc = pl.pallas_call(
        _bwd_dc_blocked_kernel,
        grid=(b // bn, rows // bm),
        in_specs=[
            pl.BlockSpec((bm, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(nb, cb, rl, cl, eps_arr, off, bglob)
    return dn, dc


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


def _bwd_kernel(n_ref, c_ref, rowlse_ref, collse_ref, eps_ref, off_ref, dn_ref, dc_ref):
    """Grid: (rows/_BM,). Recompute the S tile, form ∂L/∂S, contract.

    n_ref [bm, D] block, c_ref [B, D] full, rowlse_ref [bm, 1] block,
    collse_ref [1, B] full, eps_ref [1, 1] SMEM (label smoothing),
    off_ref [1] SMEM int32 (global row index of n's first row — shard
    offset under the sharded wrapper, 0 single-device; 0.5/B uses B = the
    GLOBAL batch = c's rows, so per-shard dn/dc are global-loss cotangents).
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
    diag = (cols == rows + i * nblk + off_ref[0]).astype(jnp.float32)
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
def _fused_bwd_call(n_scaled, c, row_lse, col_lse, eps, row_offset=None, *,
                    interpret: bool = False):
    """n_scaled [rows, D] (row shard or full batch), c [B, D] full. Returns
    (dn [rows, D] complete, dc [B, D] — partial over n's rows; the sharded
    wrapper psum_scatters it across shards)."""
    rows, d = n_scaled.shape
    b = c.shape[0]
    bm = _BM if rows % _BM == 0 else rows
    grid = (rows // bm,)
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1, 1)
    if row_offset is None:
        row_offset = jnp.zeros((), jnp.int32)
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)
    dn, dc = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        n_scaled.astype(jnp.bfloat16),
        c.astype(jnp.bfloat16),
        row_lse.reshape(rows, 1),
        col_lse.reshape(1, b),
        eps_arr,
        off,
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
    if (
        label_smoothing == 0.0
        and _kernel_ok(interpret)
        and (_supported(b, d) or _blocked_supported(b, b, d))
    ):
        lean = _fused_lean_call if _supported(b, d) else _fused_lean_blocked_call
        row_lse, col_lse = lean(
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
    if _supported(b, d) and _kernel_ok(interpret):
        dn_s, dc = _fused_bwd_call(
            n_scaled, c32, row_lse, col_lse, label_smoothing, interpret=interpret
        )
    elif _blocked_supported(b, b, d) and _kernel_ok(interpret):
        # the blocked backward's ∂L/∂S tile (_bwd_blocked_a) carries the
        # full label-smoothing term, so eps > 0 batches beyond the resident
        # cap stay fused too
        dn_s, dc = _fused_bwd_blocked_call(
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
    # Z-gap parity with train.metrics.in_batch_metrics (reference
    # scripts/train.py:347-351)
    metrics["z_gap"] = metrics["similarity_gap"] / (
        jnp.abs(metrics["negative_similarity"]) + 1e-8
    )
    for k in recall_ks:
        metrics[f"recall@{k}"] = jnp.mean((ranks < k).astype(jnp.float32))
    return metrics


# ---------------------------------------------------------------------------
# public: mesh-sharded fused loss (shard_map + cross-shard col-lse merge)
# ---------------------------------------------------------------------------
#
# Under data parallelism each shard owns a [B/n, D] slice of both towers'
# embeddings. The XLA loss path all-gathers one side and materializes the
# per-shard [B/n, B] logits block in HBM plus the multi-pass softmax the
# fused kernel exists to kill. Here every shard instead runs the SAME
# row-block kernels against the all-gathered opposite side ([B, D] bf16 —
# 2 MB at B=8192, cheap on ICI) and only the per-column softmax statistics
# cross shards:
#
#   row_lse_i : complete on the owning shard (its rows see all B columns)
#   col_lse_j : each shard's kernel emits the partial logsumexp over ITS
#               rows; the global value is one logsumexp-merge across shards
#               (pmax + psum of shifted exps) — O(B) floats on the ICI,
#               the same online max/sum-exp trick the kernel runs
#               internally across row blocks.
#
# Backward: each shard's kernel recomputes its S tiles and contracts
# ∂L/∂S locally — dn is complete for its rows; its dc contribution covers
# all B rows but only its batch slice of the sum, so one psum_scatter both
# reduces across shards and returns each shard exactly its own C-rows
# gradient ([B/n, D] on the wire per hop).
#
# Semantics: GLOBAL in-batch negatives (the full all-gathered candidate
# set), identical to the single-device fused loss and to the reference
# (two_tower_train_task.py:114-134) at any mesh size.


def _sharded_supported(rows: int, b: int, d: int) -> bool:
    """Kernel envelope for a [rows, D] shard against a [B, D] gathered side:
    the VMEM-resident tensors are c [B, D] bf16 and the [bm, B] f32 tile —
    the same budget as the single-device kernel at batch B."""
    return (
        b <= _MAX_B
        and d % 128 == 0
        and b % 128 == 0
        and (rows % _BM == 0 or rows <= _BM)
    )


def _merge_col_lse(partial_lse: jax.Array, axis_name: str) -> jax.Array:
    """Global column logsumexp from per-shard partials (each the lse over
    that shard's rows): one max-shifted merge across the axis."""
    m = jax.lax.pmax(partial_lse, axis_name)
    return jnp.log(jax.lax.psum(jnp.exp(partial_lse - m), axis_name)) + m


def _sharded_ce_primal(n, c, axis_name, temperature, label_smoothing,
                       interpret, max_abs_logit):
    """Per-shard loss + residuals. n, c: LOCAL [B/n_shards, D] shards (call
    inside shard_map). Returns (loss replicated, (row_lse local, col_lse
    global))."""
    n_scaled = n.astype(jnp.float32) / temperature
    c32 = c.astype(jnp.float32)
    bl, d = n_scaled.shape
    c_full = jax.lax.all_gather(c32, axis_name, tiled=True)  # [B, D]
    b = c_full.shape[0]
    row0 = jax.lax.axis_index(axis_name) * bl
    eps = label_smoothing

    if (
        eps == 0.0
        and _kernel_ok(interpret)
        and (_sharded_supported(bl, b, d) or _blocked_supported(bl, b, d))
    ):
        # resident kernel while the gathered side fits VMEM; col-blocked
        # beyond it (global batches up to 65536 over the mesh)
        lean = (
            _fused_lean_call
            if _sharded_supported(bl, b, d)
            else _fused_lean_blocked_call
        )
        row_lse, col_part = lean(
            n_scaled, c_full, interpret=interpret, max_abs_logit=max_abs_logit
        )
        # diag_i = S_ii as an O(bl·D) rowsum of the LOCAL aligned rows;
        # bf16-round operands exactly like the kernel rounds its dot inputs
        nb = n_scaled.astype(jnp.bfloat16).astype(jnp.float32)
        cb = c32.astype(jnp.bfloat16).astype(jnp.float32)
        diag = jnp.sum(nb * cb, axis=1)  # [bl]
        col_lse = _merge_col_lse(col_part, axis_name)
        row_term = jax.lax.psum(jnp.sum(row_lse - diag), axis_name) / b
        col_term = (
            jnp.sum(col_lse) - jax.lax.psum(jnp.sum(diag), axis_name)
        ) / b
        return 0.5 * (row_term + col_term), (row_lse, col_lse)

    if _kernel_ok(interpret) and (
        _sharded_supported(bl, b, d) or _blocked_supported(bl, b, d)
    ):
        stats_call = (
            _fused_stats_call
            if _sharded_supported(bl, b, d)
            else _fused_stats_blocked_call
        )
        row_stats, col_stats = stats_call(
            n_scaled, c_full, row0, interpret=interpret
        )
        row_lse, row_sum, diag = row_stats[:, 0], row_stats[:, 1], row_stats[:, 2]
        col_lse = _merge_col_lse(col_stats[0], axis_name)
        col_sum = jax.lax.psum(col_stats[1], axis_name)
    else:  # XLA fallback — same collective merge, materializes [bl, B]
        s = jnp.dot(n_scaled, c_full.T, preferred_element_type=jnp.float32)
        row_lse = jax.nn.logsumexp(s, axis=1)
        row_sum = jnp.sum(s, axis=1)
        diag_cols = row0 + jnp.arange(bl, dtype=jnp.int32)
        diag = jnp.take_along_axis(s, diag_cols[:, None], axis=1)[:, 0]
        col_lse = _merge_col_lse(jax.nn.logsumexp(s, axis=0), axis_name)
        col_sum = jax.lax.psum(jnp.sum(s, axis=0), axis_name)

    row_base = (1.0 - eps) * (row_lse - diag)
    if eps:
        row_base = row_base + (eps / b) * (b * row_lse - row_sum)
    row_term = jax.lax.psum(jnp.sum(row_base), axis_name) / b
    diag_sum = jax.lax.psum(jnp.sum(diag), axis_name)
    col_total = (1.0 - eps) * (jnp.sum(col_lse) - diag_sum)
    if eps:
        col_total = col_total + (eps / b) * (b * jnp.sum(col_lse) - jnp.sum(col_sum))
    loss = 0.5 * (row_term + col_total / b)
    return loss, (row_lse, col_lse)


def _sharded_ce_grads_local(n, c, row_lse, col_lse, g, axis_name, temperature,
                            label_smoothing, interpret):
    """Per-shard backward: local (dn, dc) given the replicated upstream
    cotangent ``g``. Call inside shard_map."""
    n_scaled = n.astype(jnp.float32) / temperature
    c32 = c.astype(jnp.float32)
    bl, d = n_scaled.shape
    c_full = jax.lax.all_gather(c32, axis_name, tiled=True)  # recompute: cheap
    b = c_full.shape[0]
    row0 = jax.lax.axis_index(axis_name) * bl
    if _sharded_supported(bl, b, d) and _kernel_ok(interpret):
        dn_s, dc_part = _fused_bwd_call(
            n_scaled, c_full, row_lse, col_lse, label_smoothing, row0,
            interpret=interpret,
        )
    elif _blocked_supported(bl, b, d) and _kernel_ok(interpret):
        # blocked backward carries the full eps term (_bwd_blocked_a):
        # smoothing stays fused at global batches beyond the resident cap
        dn_s, dc_part = _fused_bwd_blocked_call(
            n_scaled, c_full, row_lse, col_lse, label_smoothing, row0,
            interpret=interpret,
        )
    else:
        s = jnp.dot(n_scaled, c_full.T, preferred_element_type=jnp.float32)
        p_row = jnp.exp(s - row_lse[:, None])
        p_col = jnp.exp(s - col_lse[None, :])
        diag_cols = row0 + jnp.arange(bl, dtype=jnp.int32)
        diag = (
            jnp.arange(b, dtype=jnp.int32)[None, :] == diag_cols[:, None]
        ).astype(jnp.float32)
        a = (0.5 / b) * (
            p_row + p_col - 2.0 * (1.0 - label_smoothing) * diag
            - 2.0 * label_smoothing / b
        )
        dn_s = jnp.dot(a, c_full, preferred_element_type=jnp.float32)
        dc_part = jnp.dot(a.T, n_scaled, preferred_element_type=jnp.float32)
    # dc_part [B, D] sums only this shard's rows i; reduce across shards AND
    # hand each shard its own C rows in one collective
    dc_local = jax.lax.psum_scatter(
        dc_part, axis_name, scatter_dimension=0, tiled=True
    )  # [bl, D]
    dn = (g * dn_s / temperature).astype(n.dtype)
    dc = (g * dc_local).astype(c.dtype)
    return dn, dc


def make_manual_fused_ce(
    axis_name: str,
    *,
    temperature: float = 1.0,
    label_smoothing: float = 0.0,
    interpret: bool | None = None,
    max_abs_logit: float | None = None,
):
    """Per-shard GLOBAL-negatives fused CE for callers ALREADY INSIDE a
    ``shard_map`` over ``axis_name`` (Manual-axes context).

    ``make_sharded_fused_ce`` wraps the per-shard primal/backward in its own
    shard_maps, which cannot nest inside another shard_map — but the
    per-shard functions themselves (:func:`_sharded_ce_primal` /
    :func:`_sharded_ce_grads_local`) are plain collective programs, so this
    builder exposes them as a ``custom_vjp`` callable directly. Used by the
    compressed-DP steps (parallel/compressed_grads.py) to keep the
    framework's flagship global in-batch-negatives loss while the dense
    gradient sync is quantized: the candidate set is the full global batch
    (one [B, D] f32 all-gather of the company side per forward+backward)
    at any mesh size, identical semantics to the GSPMD/fused path.

    Args are (n_local [B/n, D], c_local [B/n, D]); returns the replicated
    global loss. Gradients flow to both inputs (their LOCAL slices).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def loss_fn(n, c):
        loss, _ = _sharded_ce_primal(
            n, c, axis_name, temperature, label_smoothing, interpret,
            max_abs_logit,
        )
        return loss

    def fwd(n, c):
        loss, (row_lse, col_lse) = _sharded_ce_primal(
            n, c, axis_name, temperature, label_smoothing, interpret,
            max_abs_logit,
        )
        return loss, (n, c, row_lse, col_lse)

    def bwd(res, g):
        n, c, row_lse, col_lse = res
        return _sharded_ce_grads_local(
            n, c, row_lse, col_lse, jnp.asarray(g, jnp.float32), axis_name,
            temperature, label_smoothing, interpret,
        )

    loss_fn.defvjp(fwd, bwd)
    return loss_fn


def make_sharded_fused_ce(
    mesh,
    axis_name: str,
    *,
    temperature: float = 1.0,
    label_smoothing: float = 0.0,
    interpret: bool | None = None,
    max_abs_logit: float | None = None,
):
    """(n_emb [B, D], c_emb [B, D] global arrays) -> replicated scalar loss.

    The custom VJP sits OUTSIDE the shard_maps: forward and backward are
    each a primal-only shard_map over ``mesh[axis_name]``, so autodiff never
    transposes a shard_map (whose unchecked-replication transpose would
    scale the cotangent by 1/n_shards) and the replicated upstream cotangent
    reaches every shard verbatim as a P() input. ``interpret=None``
    auto-selects Pallas interpret mode off-TPU (virtual CPU test meshes).
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    spec_b = P(axis_name, None)

    def _primal(n, c):
        return _sharded_ce_primal(
            n, c, axis_name, temperature, label_smoothing, interpret,
            max_abs_logit,
        )

    # check_vma=False throughout: pallas_call out_shapes carry no vma
    # annotation, which the varying-manual-axes checker rejects. Replication
    # of the P() outputs holds by construction (each ends in psum/pmax).
    fwd_sm = jax.shard_map(
        _primal, mesh=mesh, in_specs=(spec_b, spec_b),
        out_specs=(P(), (P(axis_name), P())), check_vma=False,
    )

    def _bwd(n, c, row_lse, col_lse, g):
        return _sharded_ce_grads_local(
            n, c, row_lse, col_lse, g, axis_name, temperature,
            label_smoothing, interpret,
        )

    bwd_sm = jax.shard_map(
        _bwd, mesh=mesh,
        in_specs=(spec_b, spec_b, P(axis_name), P(), P()),
        out_specs=(spec_b, spec_b), check_vma=False,
    )

    @jax.custom_vjp
    def loss_fn(n, c):
        return fwd_sm(n, c)[0]

    def fwd(n, c):
        loss, (row_lse, col_lse) = fwd_sm(n, c)
        return loss, (n, c, row_lse, col_lse)

    def bwd(res, g):
        n, c, row_lse, col_lse = res
        return bwd_sm(n, c, row_lse, col_lse, jnp.asarray(g, jnp.float32))

    loss_fn.defvjp(fwd, bwd)
    return loss_fn
