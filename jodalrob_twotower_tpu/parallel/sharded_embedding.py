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


class ShardedDenseGradLookup:
    """Embedding lookup for REPLICATED tables on a mesh whose backward runs
    the dense-vocab one-hot-matmul Pallas kernel per shard + one psum.

    GSPMD cannot partition a Pallas custom call, so round 1 gated the
    dense-grad kernel to ``jax.device_count() == 1`` (models/embedding.py)
    and any sharded program re-inherited XLA's sort-based scatter (~11 ms at
    B=8192, K=32, 33k rows — the cost the kernel bought 2.1x whole-step to
    remove, ops/embedding_grad.py). Here the backward is an explicit
    shard_map: each shard runs the kernel over ITS batch shard's cotangents
    against the full table layout (the table is replicated — the flagship
    unified tables are ~4 MB, far cheaper to replicate than to exchange rows
    per step) and one psum sums the [R, D] partials. Total MXU work equals
    the single-device kernel, distributed over shards; the wire cost is one
    [R, D] f32 all-reduce.

    The custom VJP wraps the shard_map (not vice versa) so autodiff never
    transposes a shard_map — same structure as
    ops/fused_logits.make_sharded_fused_ce and for the same reason.

    ``EmbeddingCollection`` detects ``needs_layout`` and calls with the
    unified-table layout; tables above ``max_rows`` (where the dense
    gradient loses to the scatter) fall back to the plain gather.
    """

    needs_layout = True
    # honors ModelConfig.embedding_lookup (build_model rejects forced
    # 'onehot' on lookup_fns without this marker — ADVICE r4)
    supports_onehot = True

    def __init__(
        self,
        mesh: Mesh,
        axis: str = DATA_AXIS,
        *,
        interpret: bool | None = None,
        max_rows: int = 1 << 16,
        forced: bool = False,
        lookup_mode: str = "auto",
    ) -> None:
        """``forced``: the config explicitly asked for the dense-grad
        backward (embedding_grad="dense"), so run the kernel at ANY table
        height — matching the single-device 'dense' semantics
        (models/embedding.py) instead of silently reverting to the scatter
        above ``max_rows`` (the 'auto' crossover).

        ``lookup_mode`` (config.ModelConfig.embedding_lookup): with
        "onehot", or "auto" on a TPU backend, the FORWARD also runs as the
        one-hot MXU kernel per shard (ops/embedding_grad.
        dense_table_lookup_t over each shard's batch rows against the
        replicated table) — the mesh form of the round-4 headline win
        (single-chip in-step 2.65 -> 2.07 ms, BENCHMARKS.md); "gather"
        keeps the plain take forward."""
        self.mesh = mesh
        self.axis = axis
        self.interpret = (
            (jax.default_backend() != "tpu") if interpret is None else interpret
        )
        self.max_rows = max_rows
        self.forced = forced
        self.lookup_mode = lookup_mode
        self.onehot_forward = lookup_mode == "onehot" or (
            lookup_mode == "auto" and jax.default_backend() == "tpu"
        )
        self._cache: dict = {}

    def __call__(self, table, rows, *, total_rows: int, tile_feature: tuple):
        if self.lookup_mode == "onehot":
            # FORCED kernel: reject statically-impossible configs loudly
            # (the single-device path does the same, models/embedding.py);
            # per-shape fallbacks below (odd eval chunks) stay silent —
            # they are bit-exact and shape-local, not config errors
            if total_rows > self.max_rows:
                raise ValueError(
                    f"embedding_lookup='onehot' forced but the unified "
                    f"table ({total_rows} rows) exceeds the dense one-hot "
                    f"envelope ({self.max_rows}); use 'auto' or 'gather'"
                )
            if table.shape[1] % 8:
                raise ValueError(
                    f"embedding_lookup='onehot' needs embed_dim % 8 == 0 "
                    f"for TPU sublane tiling; got {table.shape[1]}"
                )
        if total_rows > self.max_rows and not self.forced:
            return jnp.take(table, rows, axis=0)  # XLA scatter backward
        # the one-hot FORWARD needs (a) the dense envelope even when the
        # BACKWARD is forced (its cost grows with rows x batch — forced
        # 'dense' only promises the kernel backward) and (b) a batch that
        # divides the mesh axis (the fwd shard_map splits rows over it;
        # eval/corpus-encode chunks of arbitrary size keep the plain take
        # forward the old code always had)
        n_shards = self.mesh.shape[self.axis]
        use_onehot = (
            self.onehot_forward
            and total_rows <= self.max_rows
            and rows.shape[0] % max(n_shards, 1) == 0
            # sublane-tiling envelope — same gate as the single-device auto
            # path (models/embedding.py _onehot_lookup_active)
            and table.shape[1] % 8 == 0
        )
        key = (total_rows, tile_feature, use_onehot)
        if key not in self._cache:
            self._cache[key] = self._build(total_rows, tile_feature, use_onehot)
        return self._cache[key](table, rows)

    def _build(self, total_rows: int, tile_feature: tuple, use_onehot: bool):
        from jodalrob_twotower_tpu.ops.embedding_grad import (
            dense_table_grad_t,
            dense_table_lookup_t,
        )

        axis, interpret = self.axis, self.interpret

        def bwd_local(rows_l, ct_l):
            # transposed-output kernel (N-axis rides the 128-row tile) +
            # transpose back, then sum shard partials — each shard saw only
            # its batch rows
            dt = dense_table_grad_t(
                rows_l, ct_l, total_rows=total_rows,
                tile_feature=tile_feature, interpret=interpret,
            ).T
            return jax.lax.psum(dt, axis)

        bwd_sm = shard_map(
            bwd_local,
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None, None)),
            out_specs=P(),
            check_vma=False,  # pallas out_shapes carry no vma annotation
        )

        if use_onehot:
            # forward as the one-hot MXU kernel per shard: the replicated
            # table streams once per shard, each shard emits its own
            # [b_local, K, D] batch rows — same math distribution as the
            # backward, bit-exact vs take (selftest)
            def fwd_local(table_l, rows_l):
                emb_t = dense_table_lookup_t(
                    table_l, rows_l, total_rows=total_rows,
                    tile_feature=tile_feature, interpret=interpret,
                )  # [K, D, b_local]
                return jnp.transpose(emb_t, (2, 0, 1))

            fwd_sm = shard_map(
                fwd_local,
                mesh=self.mesh,
                in_specs=(P(), P(axis, None)),
                out_specs=P(axis, None, None),
                check_vma=False,
            )

            @jax.custom_vjp
            def lookup(table, rows):
                return fwd_sm(table, rows)

            def fwd(table, rows):
                # bf16 activation regardless of table dtype: carry a
                # dtype prototype for the grad (ops/embedding_grad.
                # make_onehot_lookup does the same)
                return fwd_sm(table, rows), (rows, jnp.zeros((), table.dtype))

            def bwd(res, ct):
                rows, proto = res
                return bwd_sm(rows, ct).astype(proto.dtype), None

            lookup.defvjp(fwd, bwd)
            return lookup

        @jax.custom_vjp
        def lookup(table, rows):
            return jnp.take(table, rows, axis=0)

        def fwd(table, rows):
            return jnp.take(table, rows, axis=0), rows

        def bwd(rows, ct):
            # take() preserves dtype, so the cotangent dtype is the table's
            return bwd_sm(rows, ct).astype(ct.dtype), None

        lookup.defvjp(fwd, bwd)
        return lookup


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
