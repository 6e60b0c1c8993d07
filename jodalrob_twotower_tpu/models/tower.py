"""One retrieval tower.

Capability parity with the reference ``BaseTower`` (base_tower.py:49-146):
dense projection, per-feature categorical embeddings, MLP of
Linear->ReLU->BatchNorm->Dropout blocks, final linear to the embedding dim,
L2 normalization. Differences, by design (SURVEY.md 7):

* the raw numeric / text blocks are projected by *learned* linear layers
  inside the tower (the reference used a frozen random 2-layer MLP applied
  under ``no_grad`` - feature_projector.py + feature_preprocessor.py:170);
* matmuls run in bfloat16 (MXU-native) with float32 params and a float32
  L2-normalize at the end;
* no per-forward device debug scans (base_tower.py:114-127 was overhead).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from jodalrob_twotower_tpu.config import ModelConfig
from jodalrob_twotower_tpu.data.types import TowerBatch
from jodalrob_twotower_tpu.models.embedding import (
    EmbeddingCollection,
    resolve_lookup_mode,
)
from jodalrob_twotower_tpu.schema import SideSchema


def _dtype(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class Tower(nn.Module):
    """Encode a :class:`TowerBatch` into an L2-normalized [B, final_dim] embedding."""

    schema: SideSchema
    config: ModelConfig
    use_pallas_lookup: bool = False
    lookup_fn: object | None = None  # custom embedding lookup (sharded path)

    @nn.compact
    def __call__(
        self,
        batch: TowerBatch,
        *,
        train: bool = False,
        emb_override: jax.Array | None = None,
    ) -> jax.Array:
        """``emb_override`` ([B, K*embed_dim]) substitutes the categorical
        embedding activations — the sparse-table training path computes the
        lookup outside autodiff and feeds activations in, so table grads
        arrive as compact [B, K, D] cotangents instead of a full-table
        scatter (train/sparse_tables.py)."""
        cfg = self.config
        compute_dtype = _dtype(cfg.compute_dtype)
        dense = batch.dense.astype(compute_dtype)

        # -- learned per-block dense projections (numeric, then each text) ----
        blocks = []
        off = 0
        if self.schema.num_numeric:
            num = dense[:, : self.schema.num_numeric]
            blocks.append(nn.relu(nn.Dense(cfg.dense_projection_dim, dtype=compute_dtype, name="proj_numeric")(num)))
            off = self.schema.num_numeric
        for t in self.schema.text:
            blk = dense[:, off : off + t.embed_dim]
            blocks.append(nn.relu(nn.Dense(cfg.dense_projection_dim, dtype=compute_dtype, name=f"proj_{t.name}")(blk)))
            off += t.embed_dim

        parts = []
        if blocks:
            projected = jnp.concatenate(blocks, axis=1) if len(blocks) > 1 else blocks[0]
            # dense -> first hidden width before joining the embeddings
            # (reference: base_tower.py:59,133)
            parts.append(
                nn.Dense(cfg.tower_hidden_dims[0], dtype=compute_dtype, name="dense_projection")(projected)
            )

        if self.schema.num_categorical and emb_override is not None:
            parts.append(emb_override.astype(compute_dtype))
        elif self.schema.num_categorical:
            emb = EmbeddingCollection(
                vocab_sizes=self.schema.vocab_sizes,
                embed_dim=cfg.categorical_embedding_dim,
                use_pallas=self.use_pallas_lookup,
                lookup_fn=self.lookup_fn,
                grad_mode=cfg.embedding_grad,
                lookup_mode=resolve_lookup_mode(cfg),
                name="embeddings",
            )(batch.cat_ids)
            parts.append(emb.astype(compute_dtype))

        if not parts:
            raise ValueError(f"tower {self.schema.table!r} has no features")
        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

        # -- MLP over hidden_dims[1:] (reference: base_tower.py:71-99) --------
        for i, width in enumerate(cfg.tower_hidden_dims[1:]):
            x = nn.Dense(width, dtype=compute_dtype, name=f"mlp_{i}")(x)
            x = nn.relu(x)
            if cfg.use_batch_norm:
                x = nn.BatchNorm(
                    use_running_average=not train, dtype=compute_dtype, name=f"bn_{i}"
                )(x)
            if cfg.dropout_rate > 0:
                x = nn.Dropout(rate=cfg.dropout_rate, deterministic=not train)(x)

        x = nn.Dense(cfg.final_embedding_dim, dtype=compute_dtype, name="head")(x)
        # L2-normalize in float32 (reference: base_tower.py:145)
        x = x.astype(jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
