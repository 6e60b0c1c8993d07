"""Explicit row-sharded embedding lookup: shard_map + collectives.

The TPU-native answer to TorchRec's model-parallel embedding tables
(SURVEY.md §2.5: the reference shipped plain per-key nn.Embedding on one
GPU; scaling the tables is this framework's job). Two modes exist:

* ``gspmd_rows`` (default, parallel/sharded_train.py): the table gets a
  NamedSharding on dim 0 and XLA chooses the collectives for `jnp.take`.
* ``shard_map`` (this module): the exchange is written explicitly, which
  pins the algorithm and its cost model regardless of compiler version:

    1. every chip all-gathers the flat id list over the ``data`` axis (ids
       are tiny: B·K·4 bytes);
    2. each chip looks up the ids that fall in its row range from its LOCAL
       table shard, contributing zeros elsewhere;
    3. one ``psum_scatter`` both sums the one-hot contributions and returns
       to each chip exactly its own batch rows — the combine step of an
       all-to-all, riding the ICI ring.

Every op used (all_gather / where / take / psum_scatter) has a defined
transpose, so `jax.grad` through the shard_map yields the correct
scatter-add of embedding grads back onto the owning shards — no custom VJP
needed, and rowwise-Adagrad state shards with the rows untouched.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS


def make_sharded_lookup(mesh: Mesh, axis: str = DATA_AXIS) -> Callable:
    """Build lookup(table [R, D], rows int32 [B, K]) -> [B, K, D].

    Requires R % axis_size == 0 (guaranteed by the 128-aligned unified-table
    layout, models/embedding.py) and B % axis_size == 0.
    """
    n_shards = mesh.shape[axis]

    def lookup(table: jax.Array, rows: jax.Array) -> jax.Array:
        b, k = rows.shape
        r, d = table.shape
        if r % n_shards or b % n_shards:
            raise ValueError(
                f"rows {r} and batch {b} must divide the {axis!r} axis ({n_shards})"
            )
        rows_per_shard = r // n_shards

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis, None, None),
        )
        def _exchange(t_shard, ids_shard):
            my = jax.lax.axis_index(axis)
            offset = my * rows_per_shard
            flat = ids_shard.reshape(-1)  # [b_local * k]
            all_ids = jax.lax.all_gather(flat, axis, tiled=True)  # [b * k]
            local_idx = all_ids - offset
            in_range = (local_idx >= 0) & (local_idx < rows_per_shard)
            picked = jnp.take(
                t_shard, jnp.clip(local_idx, 0, rows_per_shard - 1), axis=0
            )
            partial = jnp.where(in_range[:, None], picked, 0)
            mine = jax.lax.psum_scatter(
                partial, axis, scatter_dimension=0, tiled=True
            )  # [b * k / n, D] = this shard's batch rows
            return mine.reshape(ids_shard.shape[0], k, d)

        return _exchange(table, rows)

    return lookup
