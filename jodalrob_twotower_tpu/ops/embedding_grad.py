"""Dense-vocab embedding gradient: one-hot matmul Pallas kernel.

XLA lowers the embedding-table gradient (scatter-add of [B·K, D] rows into
[R, D]) to a sort-based serial scatter — measured at ~11 ms for B=8192,
K=32, R=33k on the bench chip, the single largest cost in a train step.

This workload's vocabularies are SMALL relative to the batch (~1k rows vs
8k hits per feature), so each feature's table gradient is dense over its
vocab and is exactly a matmul:

    dT[v, :] = Σ_b 1[ids_k(b) = v] · g_k(b, :)   =   onehotᵀ @ g_k

Materializing one-hots in HBM would cost more than the scatter; the kernel
builds each [B, 128] one-hot TILE on the fly in VMEM (iota compare) and
feeds it straight to the MXU. Grid = one program per 128-row table tile;
the 128-aligned per-feature layout (models/embedding.py) guarantees a tile
belongs to exactly one feature, whose column of ids/grads is selected via a
scalar-prefetched tile→feature map. HBM traffic: read ids + grads once,
write the dense [R, D] gradient once — no sort, no serial scatter.

Measured: ~0.6 ms vs 11 ms for the scatter it replaces (B=8192, K=32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 128
_B_CHUNK = 8192  # batch chunk per MXU pass; bounds VMEM for the mask tile


def _grad_kernel(tile_feature_ref, tile_row_ref, rows_ref, g_ref, out_ref):
    """One program = one 128-row tile of the table gradient.

    tile_feature_ref: prefetched int32 [T] tile -> feature index
    tile_row_ref:     prefetched int32 [T] tile -> first global row
    rows_ref: [K, B] int32, FULL array in VMEM (1 MB at B=8192, K=32);
              the tile's feature row is selected with a dynamic sublane index
    g_ref:    [1, B, D] bf16 block (upstream grads of the tile's feature;
              the caller casts before its feature-major transpose so the
              relayout copy moves half the bytes)
    out_ref:  [TILE_ROWS, D] f32 block
    """
    t = pl.program_id(0)
    row0 = tile_row_ref[t]
    feature = tile_feature_ref[t]
    b = rows_ref.shape[1]
    d = g_ref.shape[2]
    # transposed one-hot build: [128, C] straight from the id row — no
    # in-kernel relayouts
    tile_ids_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)

    n_chunks = b // _B_CHUNK  # caller pads B to a chunk multiple

    def body(i, acc):
        lo = i * _B_CHUNK
        ids_row = rows_ref[pl.ds(feature, 1), pl.ds(lo, _B_CHUNK)]  # [1, C]
        # bf16 operands: the one-hot is exact in bf16 and the grad rounding
        # (~1e-2 relative) is standard for embedding grads; f32 here costs
        # 4x on the MXU, which is already N-underutilized at small D
        onehot_t = (tile_ids_col == ids_row).astype(jnp.bfloat16)  # [128, C]
        g = g_ref[0, pl.ds(lo, _B_CHUNK), :].astype(jnp.bfloat16)  # [C, D]
        return acc + jnp.dot(onehot_t, g, preferred_element_type=jnp.float32)

    out_ref[:, :] = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((TILE_ROWS, d), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("total_rows", "tile_feature", "interpret"))
def dense_table_grad(
    rows: jax.Array,
    g: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    interpret: bool = False,
) -> jax.Array:
    """Table gradient [total_rows, D] from global row ids [B, K] and
    upstream grads [B, K, D]. ``tile_feature[t]`` = feature owning tile t
    (from models.embedding.tile_feature_map); len == total_rows // 128."""
    b, k = rows.shape
    d = g.shape[2]
    assert total_rows % TILE_ROWS == 0
    n_tiles = total_rows // TILE_ROWS
    assert len(tile_feature) == n_tiles

    # pad batch to the chunk size with ids that hit no tile (-1)
    pad = (-b) % _B_CHUNK
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad, k), -1, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((pad, k, d), g.dtype)])
    b_pad = rows.shape[0]

    # feature-major layouts so blocks satisfy TPU (sublane, lane) tiling:
    # rows [K, B] (full-array block), g [K, B, D] (block (1, B, D)).
    # The transpose is a real relayout copy (measured 0.21 ms/step at
    # B=8192, K=32 in f32); cast to bf16 FIRST — the kernel contracts in
    # bf16 anyway, so this halves the copy at zero accuracy cost.
    rows_t = rows.astype(jnp.int32).T
    g_t = jnp.transpose(g.astype(jnp.bfloat16), (1, 0, 2))

    tf = jnp.asarray(np.asarray(tile_feature, np.int32))
    tr = jnp.asarray(np.arange(n_tiles, dtype=np.int32) * TILE_ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, b_pad), lambda t, tf, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, b_pad, d), lambda t, tf, tr: (tf[t], 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_ROWS, d), lambda t, tf, tr: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _grad_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_rows, d), jnp.float32),
        interpret=interpret,
    )(tf, tr, rows_t, g_t)


def _grad_kernel_t(tile_feature_ref, tile_row_ref, rows_ref, g_ref, out_ref):
    """Transposed-output variant: one program = one 128-row tile, written as
    a [D, TILE_ROWS] column block of dTᵀ.

    Motivation: the standard kernel's matmul is [128, C] @ [C, D] — with
    D=32 the MXU drives only 32 of its 128 result lanes, which profiling
    shows is the kernel's floor (BENCHMARKS.md per-op table). Swapping the
    output orientation makes the matmul [D, C] @ᵀ [128, C] → [D, 128]: the
    128-row tile sits on the fully-used N axis and the small D becomes M,
    so ~4x fewer rows stream through the systolic array. The one-hot tile
    is built exactly as before (no in-kernel relayouts); the RHS-side
    contraction on the lane dim is native to the MXU's weight feed.
    """
    t = pl.program_id(0)
    row0 = tile_row_ref[t]
    feature = tile_feature_ref[t]
    b = rows_ref.shape[1]
    d = g_ref.shape[1]
    tile_ids_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)

    n_chunks = b // _B_CHUNK

    def body(i, acc):
        lo = i * _B_CHUNK
        ids_row = rows_ref[pl.ds(feature, 1), pl.ds(lo, _B_CHUNK)]  # [1, C]
        onehot_t = (tile_ids_col == ids_row).astype(jnp.bfloat16)  # [128, C]
        g = g_ref[0, :, pl.ds(lo, _B_CHUNK)].astype(jnp.bfloat16)  # [D, C]
        return acc + jax.lax.dot_general(
            g,
            onehot_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[:, :] = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((d, TILE_ROWS), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("total_rows", "tile_feature", "interpret"))
def dense_table_grad_t(
    rows: jax.Array,
    g: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    interpret: bool = False,
) -> jax.Array:
    """Transposed-layout table gradient: returns dTᵀ with shape
    [D, total_rows] (same math as :func:`dense_table_grad`; transpose
    outside, or feed an optimizer that accepts the D-major layout)."""
    b, k = rows.shape
    d = g.shape[2]
    assert total_rows % TILE_ROWS == 0
    n_tiles = total_rows // TILE_ROWS
    assert len(tile_feature) == n_tiles

    pad = (-b) % _B_CHUNK
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad, k), -1, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((pad, k, d), g.dtype)])
    b_pad = rows.shape[0]

    # feature-major ids as in the standard kernel; grads relayout to
    # [K, D, B] so each program's block is the feature's gᵀ (bf16 first —
    # halves the relayout copy, the kernel contracts in bf16 anyway)
    rows_t = rows.astype(jnp.int32).T
    g_t = jnp.transpose(g.astype(jnp.bfloat16), (1, 2, 0))

    tf = jnp.asarray(np.asarray(tile_feature, np.int32))
    tr = jnp.asarray(np.arange(n_tiles, dtype=np.int32) * TILE_ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, b_pad), lambda t, tf, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, d, b_pad), lambda t, tf, tr: (tf[t], 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (d, TILE_ROWS), lambda t, tf, tr: (0, t), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _grad_kernel_t,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, total_rows), jnp.float32),
        interpret=interpret,
    )(tf, tr, rows_t, g_t)


# ---------------------------------------------------------------------------
# differentiable lookup with the dense-grad backward
# ---------------------------------------------------------------------------


def make_dense_grad_lookup(total_rows: int, tile_feature: tuple[int, ...], *, interpret: bool = False):
    """Lookup (table [R, D], rows [B, K]) -> [B, K, D] whose backward uses
    the dense-vocab kernel instead of XLA's scatter."""

    @jax.custom_vjp
    def lookup(table, rows):
        return jnp.take(table, rows, axis=0)

    def fwd(table, rows):
        return jnp.take(table, rows, axis=0), rows

    def bwd(rows, ct):
        # transposed-output kernel + XLA transpose back: measured 6.6x the
        # standard kernel isolated (2.32 -> 0.35 ms at B=8192, K=32, 33k
        # rows) because the 128-row tile rides the MXU's N axis instead of
        # leaving 96 of 128 result lanes idle at D=32 (BENCHMARKS.md)
        dtable = dense_table_grad_t(
            rows, ct, total_rows=total_rows, tile_feature=tile_feature, interpret=interpret
        ).T
        # take() preserves dtype, so the cotangent dtype is the table's
        return dtable.astype(ct.dtype), None

    lookup.defvjp(fwd, bwd)
    return lookup
