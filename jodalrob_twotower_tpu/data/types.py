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
