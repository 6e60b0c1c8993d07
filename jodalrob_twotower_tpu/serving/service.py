"""Retrieval service: frozen towers + corpus index -> top-k companies.

The end-to-end serving loop the reference never built (SURVEY.md §3.5):
encode the company corpus once with the frozen company tower, build an exact
or int8 index, then serve notice queries (raw features -> notice tower ->
MIPS top-k) with a fixed-signature jitted path.
"""

from __future__ import annotations

import time
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.data.types import TowerBatch
from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.serving.index import BruteForceIndex, Int8Index, SearchResult


class RetrievalService:
    def __init__(
        self,
        model: TwoTowerModel,
        cfg: TrainConfig,
        state,
        company_store: FeatureStore,
        *,
        index_kind: Literal["exact", "int8"] = "exact",
        query_chunk: int = 1024,
    ) -> None:
        self.model = model
        self.cfg = cfg
        self.state = state
        self.company_store = company_store
        self._evaluator = Evaluator(model, cfg)
        corpus_emb = self._evaluator.encode_corpus(
            state, company_store.dense, company_store.cat_ids, side="company"
        )
        cls = {"exact": BruteForceIndex, "int8": Int8Index}[index_kind]
        self.index = cls(corpus_emb, query_chunk=query_chunk)
        self._encode_notice = self._evaluator._encode_notice

    def encode_queries(self, batch: TowerBatch) -> jax.Array:
        return self._encode_notice(self.state, batch)

    def search(self, batch: TowerBatch, k: int = 10) -> SearchResult:
        """notice features -> top-k company rows + scores."""
        return self.index.search(self.encode_queries(batch), k)

    def search_keys(self, batch: TowerBatch, k: int = 10) -> list[list[tuple[str, float]]]:
        """Same, resolved to company primary keys (the serving payload)."""
        res = self.search(batch, k)
        keys = self.company_store.keys
        return [
            [(str(keys[ci]), float(s)) for ci, s in zip(idx_row, score_row)]
            for idx_row, score_row in zip(res.indices, res.scores)
        ]


def qps_bench(
    service: RetrievalService,
    query_store: FeatureStore,
    *,
    k: int = 100,
    batch_size: int = 1024,
    n_batches: int = 20,
    seed: int = 0,
) -> dict:
    """Sustained queries/sec through encode + index search."""
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, len(query_store), size=(n_batches, batch_size))
    # warmup / compile
    warm = query_store.gather(rows[0])
    service.search(warm, k)
    t0 = time.perf_counter()
    last = None
    for i in range(n_batches):
        last = service.search(query_store.gather(rows[i]), k)
    # SearchResult is already host numpy -> loop above is synchronous
    elapsed = time.perf_counter() - t0
    assert last is not None and np.isfinite(last.scores).all()
    return {
        "qps": n_batches * batch_size / elapsed,
        "latency_ms_per_batch": elapsed / n_batches * 1e3,
        "batch_size": batch_size,
        "k": k,
        "corpus_size": len(service.index),
    }
