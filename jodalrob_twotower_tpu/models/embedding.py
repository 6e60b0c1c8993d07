"""Unified categorical embedding table.

The reference keeps a python dict of per-key ``nn.Embedding`` modules and
decodes each batch with a B*K python loop (cat_embed.py:88-123, its hottest
CPU spot). TPU-native design: ALL features share one ``[total_rows, D]``
table ("table-batched" layout, the same idea FBGEMM's TBE kernels use on
GPU); per-feature id ranges are remapped with static offsets and the lookup
is a single row gather, so one op serves every feature, row-sharding is a
single NamedSharding on dim 0, and the rowwise-Adagrad accumulator is one
``[total_rows, 1]`` array.

Out-of-range ids clamp into the feature's vocab (reference parity,
cat_embed.py:115-117).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.ops.embedding_lookup import embedding_lookup

# Each feature's row block is padded to a multiple of 128 rows. This (a)
# lets any mesh axis up to 128 row-shard the table evenly and (b) makes
# every 128-row tile belong to exactly ONE feature, which the Pallas
# dense-vocab gradient kernel relies on (ops/embedding_grad.py). The waste
# is < 128 rows per feature.
ROW_ALIGNMENT = 128


def table_layout(vocab_sizes: tuple[int, ...], row_alignment: int = ROW_ALIGNMENT):
    """Compute (offsets, total_rows) for the unified table; every feature's
    block starts at a row_alignment boundary."""
    offsets = np.zeros(len(vocab_sizes), dtype=np.int32)
    acc = 0
    for i, v in enumerate(vocab_sizes):
        offsets[i] = acc
        acc += -(-v // row_alignment) * row_alignment
    return offsets, max(acc, row_alignment)


def absolute_rows(vocab_sizes: tuple[int, ...], cat_ids) -> "jax.Array":
    """Clamp per-feature ids into their vocab and add the unified-table
    offsets — the same mapping EmbeddingCollection applies (clamp parity
    with the reference, cat_embed.py:115-117). cat_ids: int32 [B, K]."""
    offsets, _ = table_layout(vocab_sizes)
    vocabs = jnp.asarray(np.asarray(vocab_sizes, np.int32))
    ids = jnp.clip(cat_ids, 0, vocabs[None, :] - 1)
    return ids + jnp.asarray(offsets)[None, :]


def resolve_lookup_mode(model_cfg) -> str:
    """``ModelConfig.embedding_lookup`` with the dtype gate applied: "auto"
    demotes to "gather" when ``compute_dtype != bfloat16`` — the one-hot
    kernel emits bf16 activations (and takes the bf16 dense-grad backward),
    which is numerically free exactly when the towers already compute in
    bf16; an explicitly-f32 config keeps its exact f32 gather across the
    upgrade. "onehot" stays forced (the user opted into bf16 activations).
    """
    mode = getattr(model_cfg, "embedding_lookup", "auto")
    if mode == "auto" and getattr(model_cfg, "compute_dtype", "bfloat16") != "bfloat16":
        return "gather"
    return mode


def tile_feature_map(vocab_sizes: tuple[int, ...], row_alignment: int = ROW_ALIGNMENT):
    """Static map tile_index -> owning feature for the aligned layout."""
    out = []
    for k, v in enumerate(vocab_sizes):
        out.extend([k] * (-(-v // row_alignment)))
    return np.asarray(out or [0], dtype=np.int32)


class EmbeddingCollection(nn.Module):
    """One embedding table row-block per categorical feature, unified.

    Call with int32 ids ``[B, K]`` -> embeddings ``[B, K * embed_dim]``.

    ``lookup_fn`` optionally overrides the row gather with a custom
    implementation, e.g. the explicit shard_map all-to-all exchange
    (parallel/sharded_embedding.py); signature (table [R,D], rows [B,K]) ->
    [B, K, D].
    """

    vocab_sizes: tuple[int, ...]
    embed_dim: int
    use_pallas: bool = False
    param_dtype: jnp.dtype = jnp.float32
    lookup_fn: object | None = None
    # "auto" | "dense" | "scatter" - see config.ModelConfig.embedding_grad
    grad_mode: str = "auto"
    # "auto" | "gather" | "onehot" - see config.ModelConfig.embedding_lookup
    lookup_mode: str = "auto"

    def setup(self) -> None:
        offsets, total_rows = table_layout(self.vocab_sizes)
        self._offsets = jnp.asarray(offsets, jnp.int32)
        self._vocabs = jnp.asarray(np.asarray(self.vocab_sizes, np.int32))
        self._total_rows = total_rows
        self.table = self.param(
            "table",
            nn.initializers.normal(stddev=1.0 / np.sqrt(self.embed_dim)),
            (total_rows, self.embed_dim),
            self.param_dtype,
        )

    def __call__(self, cat_ids: jax.Array) -> jax.Array:
        if cat_ids.ndim != 2 or cat_ids.shape[1] != len(self.vocab_sizes):
            raise ValueError(
                f"cat_ids must be [B, {len(self.vocab_sizes)}], got {cat_ids.shape}"
            )
        ids = jnp.clip(cat_ids, 0, self._vocabs[None, :] - 1)
        rows = ids + self._offsets[None, :]
        if self.lookup_fn is not None:
            if getattr(self.lookup_fn, "needs_layout", False):
                # layout-aware lookups (parallel/sharded_embedding.py
                # ShardedDenseGradLookup) get the unified-table geometry so
                # their backward can run the dense-vocab kernel per shard
                emb = self.lookup_fn(
                    self.table,
                    rows,
                    total_rows=self._total_rows,
                    tile_feature=tuple(
                        tile_feature_map(self.vocab_sizes).tolist()
                    ),
                )
            else:
                emb = self.lookup_fn(self.table, rows)
        elif self._onehot_lookup_active():
            # forward AND backward as one-hot MXU matmuls (the forward twin
            # of the dense-grad kernel; ops/embedding_grad.make_onehot_lookup)
            from jodalrob_twotower_tpu.ops.embedding_grad import make_onehot_lookup

            lookup = make_onehot_lookup(
                self._total_rows,
                tuple(tile_feature_map(self.vocab_sizes).tolist()),
                interpret=jax.default_backend() == "cpu",
            )
            emb = lookup(self.table, rows)
        elif self._dense_grad_active():
            from jodalrob_twotower_tpu.ops.embedding_grad import make_dense_grad_lookup

            lookup = make_dense_grad_lookup(
                self._total_rows, tuple(tile_feature_map(self.vocab_sizes).tolist())
            )
            emb = lookup(self.table, rows)
        else:
            emb = embedding_lookup(self.table, rows, use_pallas=self.use_pallas)
        b, k = cat_ids.shape
        return emb.reshape(b, k * self.embed_dim)

    # Above this many table rows the dense gradient (cost ∝ rows × batch)
    # loses to the scatter; measured crossover is far above the bid-matching
    # vocabs (33k rows: dense 4.0ms/step vs scatter 8.6ms/step at B=8192).
    DENSE_GRAD_MAX_ROWS = 1 << 16

    def _onehot_lookup_active(self) -> bool:
        """config.ModelConfig.embedding_lookup resolution (the caller has
        already applied :func:`resolve_lookup_mode`'s dtype gate). MEASURED
        on the chip (BENCHMARKS.md round 4): the one-hot MXU forward beats
        the row-DMA gather in-step — 2.08 vs 2.66 ms/step at the flagship
        shape (B=8192, K=32, 33k rows), selftest-verified bit-exact — so
        "auto" resolves to the kernel wherever the dense-grad regime
        holds: single-device TPU, table within the dense envelope, and a
        grad mode that keeps the matching one-hot backward. "gather"
        forces the row-DMA path. "onehot" FORCES the kernel (interpret on
        CPU) and raises loudly where it cannot run, instead of silently
        reverting."""
        if self.lookup_mode == "gather":
            return False
        if self.lookup_mode == "onehot":
            if self.grad_mode == "scatter":
                raise ValueError(
                    "embedding_lookup='onehot' forces the one-hot MXU "
                    "forward, whose backward is the dense one-hot matmul — "
                    "it cannot honor embedding_grad='scatter'; use "
                    "embedding_lookup='auto'/'gather' to keep the scatter "
                    "backward, or embedding_grad='auto'/'dense'"
                )
            if self._total_rows > self.DENSE_GRAD_MAX_ROWS:
                raise ValueError(
                    f"embedding_lookup='onehot' forced but the unified "
                    f"table ({self._total_rows} rows) exceeds the dense "
                    f"one-hot envelope ({self.DENSE_GRAD_MAX_ROWS}) — its "
                    "cost grows with rows x batch; use 'auto' or 'gather'"
                )
            if self.embed_dim % 8:
                raise ValueError(
                    f"embedding_lookup='onehot' needs embed_dim % 8 == 0 "
                    f"for TPU sublane tiling; got {self.embed_dim} — use "
                    "'auto' or 'gather'"
                )
            if jax.device_count() > 1 and jax.default_backend() != "cpu":
                raise ValueError(
                    "embedding_lookup='onehot' forced on a multi-device "
                    "TPU backend without a mesh lookup_fn — GSPMD cannot "
                    "partition the Pallas call; use "
                    "embedding_sharding='replicated' "
                    "(ShardedDenseGradLookup carries the kernel) or 'auto'"
                )
            return True
        return (
            jax.device_count() == 1
            and self._total_rows <= self.DENSE_GRAD_MAX_ROWS
            and jax.default_backend() not in ("cpu",)
            and self.grad_mode != "scatter"
            and self.embed_dim % 8 == 0
        )

    def _dense_grad_active(self) -> bool:
        if self.grad_mode == "dense":
            return True
        if self.grad_mode == "scatter":
            return False
        # auto: the Pallas backward runs on single-device TPU backends with
        # small-enough tables; the scatter transpose stays for CPU tests and
        # huge tables. Meshes don't reach this gate: build_model installs
        # the shard_map dense-grad lookup_fn for replicated tables
        # (parallel/sharded_embedding.ShardedDenseGradLookup), which is how
        # the kernel survives sharding — GSPMD itself cannot partition the
        # custom call.
        return (
            jax.default_backend() not in ("cpu",)
            and jax.device_count() == 1
            and self._total_rows <= self.DENSE_GRAD_MAX_ROWS
        )
