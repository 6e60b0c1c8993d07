"""Embedding-row gather: XLA reference path + Pallas TPU kernel.

The reference's lookup was a python dict of ``nn.Embedding`` with a B*K
python decode loop (its hottest CPU spot, cat_embed.py:88-123). Here the
lookup is a single unified-table row gather over static-shape ``[B, K]`` id
matrices: one XLA gather (reference path), or a Pallas kernel that streams
rows HBM->VMEM with double-buffered DMA (TPU path).

Clamp semantics: ids are clamped into ``[0, vocab)`` *per feature* before the
table offset is added (never crash on out-of-range ids - reference behavior
cat_embed.py:115-117). Clamping happens in the caller
(models/embedding.py); this module gathers already-valid absolute rows.

Measured on the bench chip (8192 rows from a [100k, 128] table): the Pallas
DMA pipeline is correct (bit-equal) but ~3.7x slower than XLA's native
gather (5.5ms vs 1.5ms) - row-granular DMAs cannot beat the fused gather.
It stays as a validated reference for the DMA-pipeline pattern and for
layouts XLA gathers poorly; the default path is XLA
(MeshConfig.use_pallas_lookup=False). The kernel that actually wins on this
workload is the dense-vocab gradient (ops/embedding_grad.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def embedding_lookup_xla(table: jax.Array, rows: jax.Array) -> jax.Array:
    """Gather table rows. table: [R, D]; rows: int32 [...]; -> [..., D]."""
    return jnp.take(table, rows, axis=0)


# ---------------------------------------------------------------------------
# Pallas gather kernel
# ---------------------------------------------------------------------------

_IDS_PER_PROGRAM = 256
_N_BUFFERS = 8  # DMA slots in flight


def _gather_kernel(rows_ref, table_hbm, out_ref, scratch, sems):
    """One program gathers _IDS_PER_PROGRAM rows from HBM into its out block.

    rows_ref: scalar-prefetch int32 [total_ids] (SMEM)
    table_hbm: [R, D] in ANY/HBM
    out_ref:  [_IDS_PER_PROGRAM, D] VMEM block
    scratch:  [_N_BUFFERS, 1, D] VMEM
    sems:     DMA semaphores [_N_BUFFERS]
    """
    pid = pl.program_id(0)
    base = pid * _IDS_PER_PROGRAM

    def dma(slot, i):
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(rows_ref[base + i], 1), :],
            scratch.at[slot],
            sems.at[slot],
        )

    # Warm up the pipeline.
    for j in range(_N_BUFFERS):
        dma(j, j).start()

    def body(i, _):
        slot = jax.lax.rem(i, _N_BUFFERS)
        dma(slot, i).wait()
        out_ref[pl.ds(i, 1), :] = scratch[slot]
        nxt = i + _N_BUFFERS

        @pl.when(nxt < _IDS_PER_PROGRAM)
        def _():
            dma(slot, nxt).start()

        return 0

    jax.lax.fori_loop(0, _IDS_PER_PROGRAM, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_gather_flat(table: jax.Array, rows: jax.Array, *, interpret: bool = False) -> jax.Array:
    n = rows.shape[0]
    assert n % _IDS_PER_PROGRAM == 0
    d = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // _IDS_PER_PROGRAM,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_IDS_PER_PROGRAM, d), lambda i, rows: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_N_BUFFERS, 1, d), table.dtype),
            pltpu.SemaphoreType.DMA((_N_BUFFERS,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rows, table)


def embedding_lookup_pallas(
    table: jax.Array, rows: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Pallas row gather with padding to the per-program tile.

    Forward-only fast path; gradients route through the XLA gather (see
    ``embedding_lookup``). rows: int32 [...] of absolute row indices.
    """
    shape = rows.shape
    flat = rows.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    pad = (-n) % _IDS_PER_PROGRAM
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    out = _pallas_gather_flat(table, flat, interpret=interpret)
    return out[:n].reshape(*shape, table.shape[1])


@jax.custom_vjp
def _lookup_pallas_differentiable(table, rows):
    return embedding_lookup_pallas(table, rows)


def _lookup_fwd(table, rows):
    return embedding_lookup_pallas(table, rows), (table.shape, table.dtype, rows)


def _lookup_bwd(res, g):
    shape, dtype, rows = res
    # Scatter-add of upstream grads into the table rows (XLA handles this as
    # an efficient segment-sum; same transpose XLA derives for jnp.take).
    grad = jnp.zeros(shape, dtype).at[rows.reshape(-1)].add(
        g.reshape(-1, shape[1]).astype(dtype)
    )
    return grad, None


_lookup_pallas_differentiable.defvjp(_lookup_fwd, _lookup_bwd)


def embedding_lookup(table: jax.Array, rows: jax.Array, *, use_pallas: bool = False) -> jax.Array:
    """Gather ``table[rows]``; differentiable in ``table`` on both paths."""
    if use_pallas:
        return _lookup_pallas_differentiable(table, rows)
    return embedding_lookup_xla(table, rows)
