"""Device-facing batch pytrees.

Replaces the reference's TorchRec ``KeyedJaggedTensor`` batches
(src/torchrec_preprocess/torchrec_inputs.py:59-133) with static-shape
NamedTuples - the TPU-friendly representation. Every categorical feature in
the reference hot path has exactly one id per sample (lengths all 1,
unified_bid_data_loader.py:827-841), so ids are a dense ``[B, K]`` int32
matrix; no ragged container is needed. Static shapes keep everything
jit-stable and MXU-tileable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np


class TowerBatch(NamedTuple):
    """Inputs for one tower.

    dense: float32 [B, dense_dim] - numeric features ++ text embeddings.
    cat_ids: int32 [B, K] - one label-encoded id per categorical feature.
    """

    dense: jax.Array | np.ndarray
    cat_ids: jax.Array | np.ndarray

    @property
    def batch_size(self) -> int:
        return self.dense.shape[0]


class PairBatch(NamedTuple):
    """A batch of aligned positive pairs: row i of notice matches row i of company."""

    notice: TowerBatch
    company: TowerBatch

    @property
    def batch_size(self) -> int:
        return self.notice.batch_size


def default_tower_gather(store, rows) -> TowerBatch:
    """The canonical device-resident batch assembly: plain row gathers from
    a (dense [N, D], cat_ids [N, K]) store tuple. The ONE implementation of
    this contract — the indexed train/eval steps and the compressed-DP step
    all use it; row-sharded stores swap in the explicit exchange
    (parallel/sharded_store.make_tower_batch_gather) instead."""
    import jax.numpy as jnp

    dense, cat = store
    return TowerBatch(
        dense=jnp.take(dense, rows, axis=0),
        cat_ids=jnp.take(cat, rows, axis=0),
    )
