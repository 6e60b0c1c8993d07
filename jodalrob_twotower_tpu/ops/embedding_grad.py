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
_B_CHUNK = 8192  # max batch chunk per MXU pass; bounds VMEM for the mask tile


def _batch_chunk(b: int) -> int:
    """Per-pass chunk: full 8192 for headline batches, the 128-aligned
    ceiling for smaller ones (per-shard batches under a mesh — padding a
    1024-row shard to 8192 would 8x the kernel's MXU streaming)."""
    return min(_B_CHUNK, -(-b // TILE_ROWS) * TILE_ROWS)


def _grad_kernel(transposed: bool, chunk: int):
    """Kernel factory; one program = one 128-row tile of the table gradient.

    Shared args:
      tile_feature_ref: prefetched int32 [T] tile -> feature index
      tile_row_ref:     prefetched int32 [T] tile -> first global row
      rows_ref: [K, B] int32, FULL array in VMEM (1 MB at B=8192, K=32);
                the tile's feature row is selected with a dynamic sublane
                index
    Standard orientation (transposed=False):
      g_ref [1, B, D] bf16 block, out_ref [TILE_ROWS, D] f32 — the matmul
      is onehotᵀ[128, C] @ g[C, D]; with D=32 only 32 of the MXU's 128
      result lanes are driven.
    Transposed orientation (transposed=True):
      g_ref [1, D, B] bf16 block, out_ref [D, TILE_ROWS] f32 column block
      of dTᵀ — the matmul contracts g[D, C] against the SAME one-hot tile
      on its lane dim, so the 128-row tile rides the fully-used N axis and
      the small D streams as M: measured 6.6x isolated / ~0.3 ms/step
      in-step (BENCHMARKS.md). Both build the one-hot identically (no
      in-kernel relayouts) and are bit-identical up to output orientation
      (selftest-checked on chip).
    """

    def kernel(tile_feature_ref, tile_row_ref, rows_ref, g_ref, out_ref):
        t = pl.program_id(0)
        row0 = tile_row_ref[t]
        feature = tile_feature_ref[t]
        b = rows_ref.shape[1]
        d = g_ref.shape[1] if transposed else g_ref.shape[2]
        # transposed one-hot build: [128, C] straight from the id row — no
        # in-kernel relayouts
        tile_ids_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)

        n_chunks = b // chunk  # caller pads B to a chunk multiple

        def body(i, acc):
            lo = i * chunk
            ids_row = rows_ref[pl.ds(feature, 1), pl.ds(lo, chunk)]  # [1, C]
            # bf16 operands: the one-hot is exact in bf16 and the grad
            # rounding (~1e-2 relative) is standard for embedding grads; f32
            # here costs 4x on the MXU
            onehot_t = (tile_ids_col == ids_row).astype(jnp.bfloat16)  # [128, C]
            if transposed:
                g = g_ref[0, :, pl.ds(lo, chunk)].astype(jnp.bfloat16)  # [D, C]
                return acc + jax.lax.dot_general(
                    g,
                    onehot_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            g = g_ref[0, pl.ds(lo, chunk), :].astype(jnp.bfloat16)  # [C, D]
            return acc + jnp.dot(onehot_t, g, preferred_element_type=jnp.float32)

        shape = (d, TILE_ROWS) if transposed else (TILE_ROWS, d)
        out_ref[:, :] = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(shape, jnp.float32))

    return kernel


@functools.lru_cache(maxsize=None)
def _get_kernel(transposed: bool, chunk: int):
    return _grad_kernel(transposed, chunk)


@functools.partial(
    jax.jit, static_argnames=("total_rows", "tile_feature", "transposed", "interpret")
)
def _dense_table_grad(
    rows: jax.Array,
    g: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    transposed: bool,
    interpret: bool = False,
) -> jax.Array:
    b, k = rows.shape
    d = g.shape[2]
    assert total_rows % TILE_ROWS == 0
    n_tiles = total_rows // TILE_ROWS
    assert len(tile_feature) == n_tiles

    # pad batch to the chunk size with ids that hit no tile (-1)
    chunk = _batch_chunk(b)
    pad = (-b) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad, k), -1, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((pad, k, d), g.dtype)])
    b_pad = rows.shape[0]

    # feature-major layouts so blocks satisfy TPU (sublane, lane) tiling:
    # rows [K, B] (full-array block); grads [K, B, D] (standard) or
    # [K, D, B] (transposed). The relayout is a real copy — cast to bf16
    # FIRST (the kernel contracts in bf16 anyway), halving the copied bytes.
    rows_t = rows.astype(jnp.int32).T
    g_t = jnp.transpose(g.astype(jnp.bfloat16), (1, 2, 0) if transposed else (1, 0, 2))

    tf = jnp.asarray(np.asarray(tile_feature, np.int32))
    tr = jnp.asarray(np.arange(n_tiles, dtype=np.int32) * TILE_ROWS)

    g_block = (1, d, b_pad) if transposed else (1, b_pad, d)
    out_block = (d, TILE_ROWS) if transposed else (TILE_ROWS, d)
    out_index = (lambda t, tf, tr: (0, t)) if transposed else (lambda t, tf, tr: (t, 0))
    out_shape = (d, total_rows) if transposed else (total_rows, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, b_pad), lambda t, tf, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(g_block, lambda t, tf, tr: (tf[t], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, out_index, memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _get_kernel(transposed, chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
    )(tf, tr, rows_t, g_t)


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
    return _dense_table_grad(
        rows, g, total_rows=total_rows, tile_feature=tile_feature,
        transposed=False, interpret=interpret,
    )


def dense_table_grad_t(
    rows: jax.Array,
    g: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    interpret: bool = False,
) -> jax.Array:
    """Transposed-layout table gradient: returns dTᵀ with shape
    [D, total_rows] (same math as :func:`dense_table_grad`, ~4x less MXU
    streaming at D=32; transpose outside or consume the D-major layout)."""
    return _dense_table_grad(
        rows, g, total_rows=total_rows, tile_feature=tile_feature,
        transposed=True, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# B-major cotangent variant (VERDICT r4 #5b): absorb the relayout
# ---------------------------------------------------------------------------
#
# The transposed kernel above wants its grads [K, D, B]; the tower's
# backward emits them [B, K·D]-contiguous, so the jit carries a real
# [B,K,D]→[K,D,B] relayout copy (`copy.65`, 0.08 ms/step in the round-3
# trace — ≈ the HBM floor for moving 16 MB bf16). This variant reads the
# cotangent in its NATIVE layout and contracts g[C, D]'s sublane dim
# against the one-hot's lane dim → [D, 128], so no relayout exists.
#
# MEASURED/STRUCTURAL REJECT at the flagship shape (round 5,
# scripts/embgrad_microbench.py): any native-layout block leaves D=32 on
# the LANE dim, which Mosaic pads to 128 lanes — the [B, 8, D] group block
# costs 4x its logical bytes in VMEM (32.03 MB > the 16 MB scoped limit,
# compile-time OOM on the chip at B=8192). Addressing a single feature's
# [B, 1, D] stripe instead is rejected by the 8-sublane alignment rule.
# The [K, D, B] relayout (B on lanes, fully utilized) is exactly what
# makes the shipped t-kernel VMEM-viable — the 0.08 ms copy buys a legal
# layout, and the round-5 default-program trace no longer shows it as a
# distinct line (largest copy 0.033 ms/step, BENCHMARKS.md). The kernel
# stays as the recorded experiment: bit-exact vs the t-kernel in
# interpret mode (tests/test_embedding_grad.py), VMEM-infeasible on
# hardware at the shapes where it would matter.


def _grad_kernel_bmajor(chunk: int, group: int):
    """One program = one 128-row table tile; g arrives [B, K, D] in its
    NATIVE layout, blocked as [B, group, D] feature groups (Mosaic needs
    block sublanes divisible by 8 — a lone feature's [B, 1, D] stripe is
    not addressable, its 8-feature group is)."""

    def kernel(tile_feature_ref, tile_row_ref, rows_ref, g_ref, out_ref):
        t = pl.program_id(0)
        row0 = tile_row_ref[t]
        feature = tile_feature_ref[t]
        f_in = feature - (feature // group) * group  # feature % group
        b = rows_ref.shape[1]
        d = g_ref.shape[2]
        tile_ids_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)
        n_chunks = b // chunk

        def body(i, acc):
            lo = i * chunk
            ids_row = rows_ref[pl.ds(feature, 1), pl.ds(lo, chunk)]  # [1, C]
            onehot_t = (tile_ids_col == ids_row).astype(jnp.bfloat16)  # [128, C]
            # native-layout group read + VPU one-hot select of the owning
            # feature (a dynamic sublane slice needs 8-alignment Mosaic
            # cannot prove for f_in; the masked sum is cheap VPU work)
            g_grp = g_ref[pl.ds(lo, chunk), :, :].astype(jnp.bfloat16)  # [C, G, D]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, group, 1), 1) == f_in
            ).astype(jnp.bfloat16)
            g = jnp.sum(g_grp * sel, axis=1)  # [C, D]
            # contract C on g's SUBLANE dim and the one-hot's lane dim:
            # result [D, 128] — same full-lane output as the transposed
            # kernel; Mosaic supplies the operand orientation
            return acc + jax.lax.dot_general(
                g,
                onehot_t,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:, :] = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((d, TILE_ROWS), jnp.float32)
        )

    return kernel


@functools.lru_cache(maxsize=None)
def _get_kernel_bmajor(chunk: int, group: int):
    return _grad_kernel_bmajor(chunk, group)


@functools.partial(
    jax.jit, static_argnames=("total_rows", "tile_feature", "interpret")
)
def dense_table_grad_bmajor(
    rows: jax.Array,
    g: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    interpret: bool = False,
) -> jax.Array:
    """Transposed-output table gradient ([D, total_rows], same math as
    :func:`dense_table_grad_t`) whose grads input keeps the tower's native
    [B, K, D] layout — no [K, D, B] relayout copy. See the section comment
    for when this wins; parity asserted in tests/test_embedding_grad.py."""
    b, k = rows.shape
    d = g.shape[2]
    assert total_rows % TILE_ROWS == 0
    n_tiles = total_rows // TILE_ROWS
    assert len(tile_feature) == n_tiles

    # smaller chunks than the t-kernel: the loop body materializes the
    # [C, G, D] group read + its masked select in VMEM alongside the
    # double-buffered 4 MB g block
    chunk = min(2048, _batch_chunk(b))
    pad = (-b) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad, k), -1, jnp.int32)])
        g = jnp.concatenate([g, jnp.zeros((pad, k, d), g.dtype)])
    b_pad = rows.shape[0]

    rows_t = rows.astype(jnp.int32).T  # [K, B] — 1 MB, tiny
    # the ONLY transform on g: bf16 cast (fuses with its producer)
    g3 = g.astype(jnp.bfloat16)
    group = 8 if k % 8 == 0 else k

    tf = jnp.asarray(np.asarray(tile_feature, np.int32))
    tr = jnp.asarray(np.arange(n_tiles, dtype=np.int32) * TILE_ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, b_pad), lambda t, tf, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (b_pad, group, d),
                lambda t, tf, tr: (0, tf[t] // group, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (d, TILE_ROWS), lambda t, tf, tr: (0, t), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _get_kernel_bmajor(chunk, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d, total_rows), jnp.float32),
        interpret=interpret,
    )(tf, tr, rows_t, g3)


# ---------------------------------------------------------------------------
# forward twin: one-hot MXU lookup (VERDICT r3 #2)
# ---------------------------------------------------------------------------
#
# The forward gather is the step's largest per-op line (0.45 ms/step at
# B=8192, K=32 — 262k random row-DMAs, row-COUNT-bound at ~2.7 ns/row,
# BENCHMARKS.md). For small vocabs the lookup is the exact forward twin of
# the grad kernel's math:
#
#     emb_k[b, :] = Σ_v 1[ids_k(b) = v] · T_k[v, :]   =   onehot @ T_k
#
# i.e. ~17 GFLOP of bf16 MXU work at the flagship shape vs 0.45 ms of
# serial row DMA. Same transposed orientation as dense_table_grad_t: the
# batch dim rides the MXU's N axis (full 128 result lanes), D=32 streams
# as M. Output is [K, D, B] bf16 (bf16 accumulation across a feature's
# tiles is EXACT: each output column receives its value from exactly one
# tile, all other tiles contribute true zeros).


def _lookup_kernel(chunk: int):
    """One program = one 128-row table tile; accumulates its contribution
    into the owning feature's [1, D, B] output block (revisited across the
    feature's consecutive tiles; zeroed at the feature's first tile)."""

    def kernel(tile_feature_ref, tile_row_ref, rows_ref, tt_ref, out_ref):
        t = pl.program_id(0)
        feature = tile_feature_ref[t]
        row0 = tile_row_ref[t]
        b = rows_ref.shape[1]
        d = tt_ref.shape[0]
        first = jnp.logical_or(
            t == 0, feature != tile_feature_ref[jnp.maximum(t - 1, 0)]
        )

        @pl.when(first)
        def _zero():
            out_ref[0, :, :] = jnp.zeros((d, b), out_ref.dtype)

        tile_ids_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, 1), 0)
        tt = tt_ref[:, :].astype(jnp.bfloat16)  # [D, 128]
        n_chunks = b // chunk

        def body(i, _):
            lo = i * chunk
            ids_row = rows_ref[pl.ds(feature, 1), pl.ds(lo, chunk)]  # [1, C]
            onehot_t = (tile_ids_col == ids_row).astype(jnp.bfloat16)  # [128, C]
            contrib = jax.lax.dot_general(
                tt,
                onehot_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)  # [D, C]
            out_ref[0, :, pl.ds(lo, chunk)] += contrib
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _get_lookup_kernel(chunk: int):
    return _lookup_kernel(chunk)


@functools.partial(
    jax.jit, static_argnames=("total_rows", "tile_feature", "interpret")
)
def dense_table_lookup_t(
    table: jax.Array,
    rows: jax.Array,
    *,
    total_rows: int,
    tile_feature: tuple[int, ...],
    interpret: bool = False,
) -> jax.Array:
    """One-hot MXU lookup: (table [R, D], rows [B, K] global row ids) ->
    embeddings in TRANSPOSED layout [K, D, B] bf16 (transpose or consume
    K-major outside). ``tile_feature`` as in :func:`dense_table_grad`."""
    b, k = rows.shape
    d = table.shape[1]
    assert total_rows % TILE_ROWS == 0
    n_tiles = total_rows // TILE_ROWS
    assert len(tile_feature) == n_tiles

    chunk = _batch_chunk(b)
    pad = (-b) % chunk
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad, k), -1, jnp.int32)])
    b_pad = rows.shape[0]

    rows_t = rows.astype(jnp.int32).T  # [K, B]
    tt = table.astype(jnp.bfloat16).T  # [D, R] — a ~2 MB relayout, tiny
    tf = jnp.asarray(np.asarray(tile_feature, np.int32))
    tr = jnp.asarray(np.arange(n_tiles, dtype=np.int32) * TILE_ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((k, b_pad), lambda t, tf, tr: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, TILE_ROWS), lambda t, tf, tr: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, d, b_pad), lambda t, tf, tr: (tf[t], 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _get_lookup_kernel(chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, d, b_pad), jnp.bfloat16),
        interpret=interpret,
    )(tf, tr, rows_t, tt)
    return out[:, :, :b]


def make_onehot_lookup(
    total_rows: int, tile_feature: tuple[int, ...], *, interpret: bool = False
):
    """Lookup (table [R, D], rows [B, K]) -> [B, K, D] bf16 whose FORWARD is
    the one-hot MXU kernel (vs the row-DMA gather) and whose backward is the
    dense-vocab grad kernel — both ends of the embedding ride the MXU.
    Clamp semantics live in the caller's row mapping (cat_embed.py:115-117
    parity, models/embedding.absolute_rows)."""

    @jax.custom_vjp
    def lookup(table, rows):
        emb_t = dense_table_lookup_t(
            table, rows, total_rows=total_rows, tile_feature=tile_feature,
            interpret=interpret,
        )  # [K, D, B]
        return jnp.transpose(emb_t, (2, 0, 1))  # [B, K, D]

    def fwd(table, rows):
        # the forward emits bf16 regardless of the table dtype, so the
        # cotangent dtype no longer tells us the grad dtype — carry a
        # dtype-prototype scalar in the residuals
        return lookup(table, rows), (rows, jnp.zeros((), table.dtype))

    def bwd(res, ct):
        rows, proto = res
        dtable = dense_table_grad_t(
            rows, ct, total_rows=total_rows, tile_feature=tile_feature,
            interpret=interpret,
        ).T
        return dtable.astype(proto.dtype), None

    lookup.defvjp(fwd, bwd)
    return lookup


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
