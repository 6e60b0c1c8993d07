"""Retrieval service: frozen towers + corpus index -> top-k companies.

The end-to-end serving loop the reference never built (SURVEY.md §3.5):
encode the company corpus once with the frozen company tower, build an
exact / int8 / mesh-sharded index, then serve notice queries (raw features
-> notice tower -> MIPS top-k).

Encode and search are fused into ONE jitted dispatch per query batch
(`search_device`), and `qps_bench` pipelines batches (dispatch i+1 before
fetching i's results) so host round-trip latency overlaps device compute —
the dominant cost on a high-dispatch-latency link.
"""

from __future__ import annotations

import functools
import time
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.data.types import TowerBatch
from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
from jodalrob_twotower_tpu.serving.index import (
    BruteForceIndex,
    Int8Index,
    SearchResult,
    ShardedIndex,
)


from typing import Any

import flax.struct


@flax.struct.dataclass
class FrozenState:
    """Weights-only model state for serving (no optimizer, no step counter) —
    what `CheckpointManager.restore_weights` returns, shaped like the slice
    of TrainState the encoders read. A pytree, so it passes through jit."""

    params: Any
    batch_stats: Any = flax.struct.field(default_factory=dict)


class RetrievalService:
    def __init__(
        self,
        model,
        cfg: TrainConfig,
        state,
        company_store: FeatureStore,
        *,
        index_kind: Literal["exact", "int8"] = "exact",
        query_chunk: int = 1024,
        corpus_chunk: int | None = None,
        approx_recall: float | None = None,
        rescore_depth: int | None = None,
        rescore_dtype: str = "int8",
        mesh=None,
        precomputed_corpus_emb=None,
        prebuilt_index=None,
        payload_dtype=None,
    ) -> None:
        """``payload_dtype`` (e.g. jnp.float16) casts the returned scores
        inside the fused jit — free on device, and it halves the result
        bytes crossing the host link, which is the serving bottleneck when
        D2H bandwidth is scarce (measured 10 MB/s effective on the tunneled
        chip: fetching [1024, 100] f32+int32 costs ~80 ms vs ~20 ms of
        compute for a 10M-row int8 scan)."""
        self.model = model
        self.cfg = cfg
        if mesh is not None:
            if prebuilt_index is not None:
                # a persisted index is a single-host npz committed to one
                # device; mixing it with a mesh-replicated state would hit
                # the same incompatible-devices rejection the state fix
                # below exists for — rebuild the index under the mesh
                raise ValueError(
                    "prebuilt_index cannot be combined with a mesh: "
                    "persisted indexes are single-host — rebuild with "
                    "mesh=... (ShardedIndex) instead"
                )
            # the fused encode+search jit mixes the tower state with the
            # mesh-sharded corpus: a single-device-committed state makes
            # jit reject the computation (incompatible devices) — place it
            # replicated over the serving mesh
            from jodalrob_twotower_tpu.parallel.mesh import replicated

            state = jax.device_put(
                state, jax.tree.map(lambda _: replicated(mesh), state)
            )
        self.state = state
        self.company_store = company_store
        self._evaluator = Evaluator(model, cfg)
        if prebuilt_index is not None:
            self.index = prebuilt_index
        else:
            if precomputed_corpus_emb is not None:
                corpus_emb = precomputed_corpus_emb
            else:
                corpus_emb = self._evaluator.encode_corpus(
                    state, company_store.dense, company_store.cat_ids, side="company"
                )
            if index_kind not in ("exact", "int8"):
                raise ValueError(
                    f"index_kind must be 'exact' or 'int8', got {index_kind!r}"
                )
            if mesh is not None:
                if corpus_chunk is not None:
                    raise ValueError(
                        "corpus_chunk is not supported with a mesh: ShardedIndex "
                        "scores each shard whole — bound per-chip memory by the "
                        "shard size (more devices) instead. Silently ignoring the "
                        "request would OOM at exactly the corpus sizes it targets."
                    )
                self.index = ShardedIndex(
                    corpus_emb, mesh, kind=index_kind, query_chunk=query_chunk,
                    approx_recall=approx_recall, rescore_depth=rescore_depth,
                    rescore_dtype=rescore_dtype,
                )
            elif index_kind == "int8":
                self.index = Int8Index(
                    corpus_emb, query_chunk=query_chunk, corpus_chunk=corpus_chunk,
                    approx_recall=approx_recall, rescore_depth=rescore_depth,
                    rescore_dtype=rescore_dtype,
                )
            else:
                self.index = BruteForceIndex(
                    corpus_emb, query_chunk=query_chunk, corpus_chunk=corpus_chunk,
                    approx_recall=approx_recall, rescore_depth=rescore_depth,
                )
        self._encode_notice = self._evaluator._encode_notice
        # one dispatch per query batch: tower forward + MIPS fused in one jit.
        # The corpus rides as explicit jit arguments — closing over it would
        # embed it in the HLO as a constant (a 10M-row corpus is GBs of
        # compile payload; fatal over a remote-compile relay).
        from jodalrob_twotower_tpu.train.train_step import make_encode_fn

        encode_body = make_encode_fn(model, "notice", jit=False)

        # topk_body is a STATIC jit argument: the index's python metadata
        # (n_valid padding mask, shard offsets, chunking) is baked into the
        # trace, so replacing/rebuilding service.index must retrace — keying
        # the cache on the bound method (hashes by index identity) does that.
        # Only the corpus ARRAYS ride as dynamic args.
        @functools.partial(jax.jit, static_argnums=(0, 3))
        def _fused_impl(topk_body, state, batch, k, *corpus_args):
            s, i = topk_body(encode_body(state, batch), k, *corpus_args)
            return (s if payload_dtype is None else s.astype(payload_dtype)), i

        self._fused = lambda state, batch, k: _fused_impl(
            self.index.topk_body, state, batch, k, *self.index.corpus_args()
        )

    def encode_queries(self, batch: TowerBatch) -> jax.Array:
        return self._encode_notice(self.state, batch)

    def search_device(self, batch: TowerBatch, k: int = 10):
        """Fused encode+search; returns device arrays (pipelineable)."""
        return self._fused(self.state, batch, k)

    def search(self, batch: TowerBatch, k: int = 10) -> SearchResult:
        """notice features -> top-k company rows + scores."""
        s, i = self.search_device(batch, k)
        return SearchResult(np.asarray(s), np.asarray(i))

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
    pipeline_depth: int = 2,
) -> dict:
    """Sustained queries/sec through fused encode+search.

    Keeps ``pipeline_depth`` batches in flight: batch i+1 is dispatched
    before batch i's results are pulled to the host, so D2H and dispatch
    latency overlap compute. Each result's host copy starts asynchronously
    at dispatch time (``copy_to_host_async``) — blocking ``np.asarray``
    fetches serialize D2H behind compute and cost 2-3x in sustained QPS on
    a bandwidth-starved host link. Every result IS fetched to host numpy —
    the loop measures real end-to-end serving, just not serially.
    """
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, len(query_store), size=(n_batches, batch_size))
    batches = [query_store.gather(r) for r in rows]
    # warmup / compile
    service.search(batches[0], k)
    in_flight: list = []
    results: list[SearchResult] = []

    def drain(limit: int) -> None:
        while len(in_flight) > limit:
            s, i = in_flight.pop(0)
            results.append(SearchResult(np.asarray(s), np.asarray(i)))

    t0 = time.perf_counter()
    for i in range(n_batches):
        out = service.search_device(batches[i], k)
        for arr in out:
            arr.copy_to_host_async()
        in_flight.append(out)
        drain(pipeline_depth - 1)
    drain(0)
    elapsed = time.perf_counter() - t0
    assert len(results) == n_batches and np.isfinite(results[-1].scores).all()
    return {
        "qps": n_batches * batch_size / elapsed,
        "latency_ms_per_batch": elapsed / n_batches * 1e3,
        "batch_size": batch_size,
        "k": k,
        "corpus_size": len(service.index),
    }
