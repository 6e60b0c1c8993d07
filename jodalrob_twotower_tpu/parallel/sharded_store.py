"""Row-sharded FEATURE STORES on the mesh: train device-resident when the
corpus's dense features exceed one chip's HBM.

The reference's mode 4 ("features too large for memory",
unified_bid_data_loader.py:408-456) streams per-chunk feature SQL loads
through an LRU cache — a host-side answer. At TPU scale the host link IS
the bottleneck (the host-fed fallback measured an 868 ms/step link floor,
BENCHMARKS.md "host-side feature pipeline"), so the TPU-native answer keeps
the store device-resident but SHARDED: each chip holds 1/n of the dense
[N, D] and categorical [N, K] matrices (a 10M-notice x 768-d f32 text
store is ~30 GB — replicable on no single chip, 3.8 GB/chip on 8).

Batch-row gather uses the same explicit all-gather-ids -> psum_scatter-rows
exchange as the row-sharded embedding tables
(parallel/sharded_embedding.make_sharded_lookup — see its module docstring
for why the exchange is written out instead of left to GSPMD: the algorithm
and its cost model stay pinned regardless of partitioner version, and the
partitioner can never "helpfully" all-gather a 30 GB operand):

  1. every chip all-gathers the global batch's row ids (B·4 bytes — tiny);
  2. each chip gathers the ids landing in its row range from its LOCAL
     store shard, contributing zeros elsewhere;
  3. one ``psum_scatter`` sums the one-hot contributions and hands each
     chip exactly its own batch-shard rows — the combine half of an
     all-to-all, riding the ICI ring. Wire cost per step: B·(D+K) elements,
     independent of the store height N.

The gather sits OUTSIDE autodiff (feature stores are inputs, not
parameters), so no custom VJP is needed.

Config: ``MeshConfig.store_sharding = "rows"`` (default "replicated").
Equality with the replicated path is asserted on the 8-virtual-device CPU
mesh (tests/test_sharded_store.py) and in dryrun mode 7 (__graft_entry__).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS


def pad_rows_to(mat: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad dim 0 up to a multiple (padding rows are never gathered —
    row ids come from the pair set, which indexes real rows only)."""
    n = mat.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return mat
    pad = np.zeros((rem, *mat.shape[1:]), dtype=mat.dtype)
    return np.concatenate([mat, pad], axis=0)


def put_row_sharded_store(store: tuple, mesh: Mesh, axis: str = DATA_AXIS):
    """Device-put a (dense [N, D], cat_ids [N, K]) host store tuple with the
    rows sharded over ``mesh[axis]`` (padding N up to the axis size). Each
    chip's HBM holds N/n rows — the whole point of the mode.

    Multi-process meshes assemble the global array through
    ``jax.make_array_from_callback`` — every process holds the same full
    host copy and uploads only its addressable row shards. This mirrors
    ``put_replicated`` (parallel/mesh.py): the documented-stable assembly
    API instead of relying on ``device_put`` handling shardings that span
    non-addressable devices (ADVICE r4)."""
    n_shards = mesh.shape[axis]
    sh2 = NamedSharding(mesh, P(axis, None))
    out = []
    for m in store:
        padded = pad_rows_to(np.asarray(m), n_shards)
        if jax.process_count() > 1:
            out.append(
                jax.make_array_from_callback(
                    padded.shape, sh2, lambda idx, p=padded: p[idx]
                )
            )
        else:
            out.append(jax.device_put(padded, sh2))
    return tuple(out)


def make_store_gather(mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Build gather(mat [N, D] row-sharded, rows int32 [B] batch-sharded)
    -> [B, D] batch-sharded, via the explicit exchange (module docstring).

    Works for float (dense features) and integer (cat id) matrices —
    psum_scatter of one-hot contributions is exact for both (each global
    row's value is contributed by exactly one shard, the rest add zeros).
    """
    n_shards = mesh.shape[axis]

    def gather(mat: jax.Array, rows: jax.Array) -> jax.Array:
        n, d = mat.shape
        b = rows.shape[0]
        if n % n_shards or b % n_shards:
            raise ValueError(
                f"store rows {n} and batch {b} must divide the {axis!r} "
                f"axis ({n_shards}); pad the store with put_row_sharded_store"
            )
        rows_per_shard = n // n_shards

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=P(axis, None),
        )
        def _exchange(m_shard, rows_shard):
            my = jax.lax.axis_index(axis)
            offset = my * rows_per_shard
            all_rows = jax.lax.all_gather(rows_shard, axis, tiled=True)  # [B]
            local = all_rows - offset
            in_range = (local >= 0) & (local < rows_per_shard)
            picked = jnp.take(
                m_shard, jnp.clip(local, 0, rows_per_shard - 1), axis=0
            )
            partial = jnp.where(in_range[:, None], picked, jnp.zeros((), m_shard.dtype))
            return jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True
            )  # [B / n_shards, d]: this shard's batch rows

        return _exchange(mat, rows)

    return gather


def resolve_store_placement(cfg, mesh: Mesh, axis: str = DATA_AXIS):
    """(store_gather, store_shardings, put_store) for a TrainConfig + mesh —
    the ONE place MeshConfig.store_sharding is interpreted (used by the
    dense indexed, sparse, and sampled mesh step builders).

    "rows": store matrices row-sharded; gather = the explicit exchange.
    "replicated": full copies everywhere; gather = None (plain jnp.take).
    """
    if cfg.mesh.store_sharding == "rows":
        store_gather = make_tower_batch_gather(mesh, axis)
        row_sh = NamedSharding(mesh, P(axis, None))

        def put_store(store):
            return put_row_sharded_store(store, mesh, axis)

        return store_gather, (row_sh, row_sh), put_store

    rep = NamedSharding(mesh, P())

    def put_store(store):
        from jodalrob_twotower_tpu.parallel.mesh import put_replicated

        return tuple(put_replicated(x, mesh) for x in store)

    return None, (rep, rep), put_store


def make_tower_batch_gather(mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """store_gather(store (dense, cat), rows [B]) -> TowerBatch — the
    pluggable gather the indexed train steps accept
    (train_step.make_indexed_train_step / sparse_tables.make_sparse_train_step).
    """
    from jodalrob_twotower_tpu.data.types import TowerBatch

    gather = make_store_gather(mesh, axis)

    def store_gather(store, rows):
        dense, cat = store
        return TowerBatch(dense=gather(dense, rows), cat_ids=gather(cat, rows))

    # consumers (evaluator chunking / batch-size validation) read the
    # divisibility the exchange imposes from the gather itself;
    # cache_token identifies the exchange SEMANTICALLY (mesh + axis) so
    # compiled-program caches keyed on it survive rebuilding the closure
    # (a fresh gather per Trainer.train() call must not recompile
    # 30-160 s remote-compile signatures — CLAUDE.md)
    store_gather.batch_multiple = mesh.shape[axis]
    store_gather.cache_token = (mesh, axis)
    return store_gather
