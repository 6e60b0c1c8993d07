"""Evaluation: in-batch metrics, corpus-level retrieval, prediction demo.

Capability parity with the reference ``TwoTowerEvaluator``
(src/evaluation/evaluator.py): per-batch recall@k / MRR / accuracy /
similarity means over in-batch candidates, random baselines, a qualitative
assessment, and a top-k prediction demo — plus what the reference lacked
(SURVEY.md §3.4 note): **corpus-level** retrieval metrics, where each query
ranks against the ENTIRE company corpus, not just its batch.

All ranking math runs on device in fused/vectorized form (the reference
computed MRR with a per-row python loop, evaluator.py:45-71).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.metrics import random_baselines
from jodalrob_twotower_tpu.train.train_step import make_encode_fn, make_eval_step


def qualitative_assessment(metrics: Mapping[str, float], batch_size: int) -> str:
    """Human-readable verdict vs random baselines (reference:
    evaluator.py:195-267 printed a similar assessment)."""
    rb = random_baselines(batch_size)
    lift = metrics.get("accuracy", 0.0) / max(rb["accuracy"], 1e-12)
    gap = metrics.get("similarity_gap", 0.0)
    if lift >= 20 and gap > 0.2:
        quality = "excellent"
    elif lift >= 5:
        quality = "good"
    elif lift >= 2:
        quality = "weak"
    else:
        quality = "no better than random"
    return (
        f"{quality}: top-1 accuracy {metrics.get('accuracy', 0.0):.4f} is "
        f"{lift:.1f}x the random baseline {rb['accuracy']:.4f}; "
        f"similarity gap {gap:.4f}"
    )


class Evaluator:
    """Runs eval over batches and aggregates the reference metric surface."""

    def __init__(self, model: TwoTowerModel, cfg: TrainConfig) -> None:
        self.model = model
        self.cfg = cfg
        self._eval_step = make_eval_step(model, cfg)
        self._encode_notice = make_encode_fn(model, "notice")
        self._encode_company = make_encode_fn(model, "company")
        # built lazily (train_step.make_indexed_eval_steps), keyed on the
        # gather flavor like _dev_encoders — a take-compiled program must
        # never serve a rows-sharded store (and vice versa)
        self._indexed_eval: dict = {}
        self._dev_encoders: dict = {}

    def evaluate(self, state, batches: Iterable[PairBatch]) -> dict[str, float]:
        """Average the in-batch metrics over all batches (reference
        evaluate_comprehensive, evaluator.py:157-267)."""
        total: dict[str, float] = {}
        n = 0
        batch_size = 0
        for batch in batches:
            # ONE device fetch per batch — per-metric float(v) would cost a
            # full host round trip each (~9 fetches/batch; the tunneled link
            # charges ~30 ms per synchronous fetch)
            m = jax.device_get(self._eval_step(state, batch))
            batch_size = batch.batch_size
            for k, v in m.items():
                total[k] = total.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return {}
        out = {k: v / n for k, v in total.items()}
        out["num_batches"] = float(n)
        out["assessment_batch_size"] = float(batch_size)
        return out

    def evaluate_indexed(
        self,
        state,
        pairs: np.ndarray,
        notice_store,
        company_store,
        *,
        batch_size: int,
        stack: int = 32,
        put_idx=None,
        store_gather=None,
    ) -> dict[str, float]:
        """evaluate() over DEVICE-RESIDENT stores: only [n, B, 2] indices
        cross the link and whole stacks of batches run in one dispatch
        (train_step.make_indexed_eval_steps). Same metric surface as
        :meth:`evaluate`; partial trailing batches are dropped (eval over
        thousands of batches is insensitive; the host path remains for
        exact small-set eval). ``put_idx`` overrides the index placement
        (mesh runs pass a replicated put so the jit sees consistently
        placed inputs); ``store_gather`` plugs the explicit cross-shard
        exchange for ROW-SHARDED stores."""
        from jodalrob_twotower_tpu.train.train_step import (
            make_indexed_eval_steps,
        )

        n_batches = len(pairs) // batch_size
        if n_batches == 0:
            return {}
        multiple = (
            getattr(store_gather, "batch_multiple", 1)
            if store_gather is not None else 1
        )
        if batch_size % multiple:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of the "
                f"row-sharded store's mesh axis ({multiple}) — the eval "
                "batch is split over it by the cross-shard exchange"
            )
        # cache on the gather's SEMANTIC identity (mesh, axis) when it
        # exports one — a bool would collide two meshes' exchanges, while
        # raw closure identity would recompile for every rebuilt gather
        cache_key = (
            getattr(store_gather, "cache_token", store_gather)
            if store_gather is not None else None
        )
        if cache_key not in self._indexed_eval:
            self._indexed_eval[cache_key] = make_indexed_eval_steps(
                self.model, self.cfg, store_gather=store_gather
            )
        indexed_eval = self._indexed_eval[cache_key]
        put = put_idx if put_idx is not None else jax.device_put
        idx = pairs[: n_batches * batch_size].astype(np.int32).reshape(
            n_batches, batch_size, 2
        )
        stack = min(stack, n_batches)
        # ONE compiled signature: the final stack starts early when
        # n_batches % stack != 0 (overlap) and its already-covered head is
        # sliced off host-side (the scan returns per-batch metrics). All
        # dispatches are issued before any fetch — a per-stack device_get
        # would serialize on the ~30 ms tunnel RTT each (CLAUDE.md).
        starts = list(range(0, n_batches - stack + 1, stack))
        if starts[-1] + stack < n_batches:
            starts.append(n_batches - stack)
        results = []
        for i, start in enumerate(starts):
            # for the overlapping final stack keep only the uncovered tail
            prev_end = starts[i - 1] + stack if i else 0
            keep = start + stack - max(prev_end, start)
            m = indexed_eval(
                state, put(idx[start : start + stack]), notice_store,
                company_store,
            )
            results.append((keep, m))
        fetched = jax.device_get([m for _, m in results])
        totals: dict[str, float] = {}
        for (keep, _), m in zip(results, fetched):
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(np.sum(v[-keep:]))
        out = {k: v / n_batches for k, v in totals.items()}
        out["num_batches"] = float(n_batches)
        out["assessment_batch_size"] = float(batch_size)
        return out

    def encode_corpus_device(
        self,
        state,
        store,
        n_rows: int,
        *,
        side: str = "company",
        chunk: int = 8192,
        store_gather=None,
    ) -> jax.Array:
        """encode_corpus() over a DEVICE-RESIDENT (dense, cat_ids) store
        tuple: zero feature H2D (the whole-store host path ships 5+ GB at
        10M rows). The store's row count may exceed ``n_rows`` (padding);
        the returned embeddings are sliced to ``n_rows``. ``store_gather``
        plugs the explicit cross-shard exchange for ROW-SHARDED stores
        (parallel/sharded_store.make_tower_batch_gather)."""
        from jodalrob_twotower_tpu.train.train_step import (
            make_device_encode_fn,
        )

        store_rows = store[0].shape[0]
        chunk = min(chunk, store_rows)
        if store_gather is not None:
            # the exchange splits the chunk over the mesh axis: round the
            # chunk DOWN to a multiple (store_rows is padded to one, so
            # min() above already is when it binds)
            multiple = getattr(store_gather, "batch_multiple", 1)
            if multiple > 1:
                chunk = max(chunk - chunk % multiple, multiple)
        key = (
            side, chunk,
            getattr(store_gather, "cache_token", store_gather)
            if store_gather is not None else None,
        )  # semantic gather identity (see evaluate_indexed)
        if key not in self._dev_encoders:
            self._dev_encoders[key] = make_device_encode_fn(
                self.model, side, chunk, store_gather=store_gather
            )
        encode = self._dev_encoders[key]
        # fixed-size chunks (one compiled program); the final chunk starts
        # early when store_rows % chunk != 0, so drop its overlapping head
        pieces = []
        covered = 0
        while covered < store_rows:
            start = min(covered, store_rows - chunk)
            emb = encode(state, store, start)
            pieces.append(emb[covered - start :])
            covered = start + chunk
        return jnp.concatenate(pieces, axis=0)[:n_rows]

    # -- corpus-level ------------------------------------------------------
    def encode_corpus(
        self,
        state,
        store_dense: np.ndarray,
        store_cat: np.ndarray,
        *,
        side: str = "company",
        batch_size: int = 8192,
    ) -> jax.Array:
        """Encode a whole side's feature store into [N, D] embeddings
        (index-building path; reference two_tower_model.py:102-108)."""
        encode = self._encode_company if side == "company" else self._encode_notice
        n = store_dense.shape[0]
        starts = list(range(0, n, batch_size))

        def stage(start: int) -> TowerBatch:
            # async H2D: the transfer is enqueued and returns immediately,
            # so staging chunk k+1 BEFORE dispatching encode(k) overlaps
            # host->device copy with compute (double buffering) — at 10M
            # rows this is ~1,200 sequential dispatches on a ~1 ms-latency
            # link, so serialization here is the whole wall clock
            return TowerBatch(
                dense=jax.device_put(store_dense[start : start + batch_size]),
                cat_ids=jax.device_put(store_cat[start : start + batch_size]),
            )

        chunks = []
        nxt = stage(starts[0]) if starts else None
        for i in range(len(starts)):
            cur, nxt = nxt, (stage(starts[i + 1]) if i + 1 < len(starts) else None)
            chunks.append(encode(state, cur))
        return jnp.concatenate(chunks, axis=0)


@dataclasses.dataclass
class CorpusEvalResult:
    recall: dict[int, float]
    mrr: float
    num_queries: int
    corpus_size: int


def corpus_retrieval_eval(
    query_emb: jax.Array,
    corpus_emb: jax.Array,
    positive_rows: np.ndarray,
    *,
    ks: tuple[int, ...] = (10, 100),
    query_chunk: int = 1024,
    corpus_chunk: int | None = None,
) -> CorpusEvalResult:
    """True retrieval eval: rank each query's positive against the FULL corpus.

    recall@k = fraction of queries whose positive lands in the top-k;
    MRR over full-corpus rank. Rank is a pure count (#corpus rows scoring
    strictly above the positive, the positive's own column excluded) — no
    argsort, no python loops. Because the count is a reduction consuming
    the scores, XLA:TPU fuses it into the scoring matmul and the [Q, N]
    block never materializes — a FLAT 10M-row corpus ranks 1024 queries in
    20 ms (the HBM floor of reading the corpus once), where scanning 262k
    chunks under `lax.scan` measured ~50x slower. So flat is the default at
    every corpus size; pass ``corpus_chunk`` only for backends that
    materialize the dot (e.g. CPU) with corpora too big for [Q, N] scores.
    The corpus rides as a jit argument (a closure would bake it into the
    HLO).

    The positive's score is always computed on the VPU from its gathered
    row (not read out of the MXU score matrix): on TPU the f32 matmul runs
    as bf16 passes, so the two differ in the last bits — using one basis in
    both modes keeps one-shot and chunk-scanned ranks exactly equal, and
    masking the positive's column makes self-comparison moot.
    """
    nq = query_emb.shape[0]
    pos = jnp.asarray(np.asarray(positive_rows), jnp.int32)
    n_valid = corpus_emb.shape[0]

    if corpus_chunk is None:

        @jax.jit
        def ranks_for(queries, pos_rows, corpus):
            sims = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
            pos_vec = jnp.take(corpus, pos_rows, axis=0)
            pos_sim = jnp.sum(queries * pos_vec, axis=1, keepdims=True)
            not_self = jnp.arange(corpus.shape[0])[None, :] != pos_rows[:, None]
            return jnp.sum(((sims > pos_sim) & not_self).astype(jnp.int32), axis=1)

        corpus_arg = jnp.asarray(corpus_emb)
    else:
        from jodalrob_twotower_tpu.serving.index import _pad_chunks

        chunks, _ = _pad_chunks(
            corpus_emb if isinstance(corpus_emb, jax.Array)
            else np.asarray(corpus_emb, np.float32),
            corpus_chunk,
        )
        corpus_arg = jnp.asarray(chunks)  # [nc, C, D]

        @jax.jit
        def ranks_for(queries, pos_rows, corpus):
            nc, c, _ = corpus.shape
            rows = jnp.arange(c)
            # positive's score from its row directly (no [Q, N] needed)
            pos_vec = _flat_take(corpus, pos_rows, c)
            pos_sim = jnp.sum(queries * pos_vec, axis=1, keepdims=True)

            def body(count, ci):
                sims = jnp.dot(queries, corpus[ci].T,
                               preferred_element_type=jnp.float32)
                gl = ci * c + rows[None, :]
                live = (gl < n_valid) & (gl != pos_rows[:, None])
                count += jnp.sum(((sims > pos_sim) & live).astype(jnp.int32), axis=1)
                return count, None

            count, _ = jax.lax.scan(
                body, jnp.zeros((queries.shape[0],), jnp.int32), jnp.arange(nc)
            )
            return count

    all_ranks = []
    for start in range(0, nq, query_chunk):
        all_ranks.append(
            np.asarray(
                ranks_for(
                    query_emb[start : start + query_chunk],
                    pos[start : start + query_chunk],
                    corpus_arg,
                )
            )
        )
    ranks = np.concatenate(all_ranks)
    return CorpusEvalResult(
        recall={k: float((ranks < k).mean()) for k in ks},
        mrr=float((1.0 / (ranks + 1.0)).mean()),
        num_queries=nq,
        corpus_size=n_valid,
    )


def _flat_take(chunked: jax.Array, rows: jax.Array, chunk: int) -> jax.Array:
    """take() rows from a [nc, C, D] chunk-stacked array by flat row index."""
    return chunked[rows // chunk, rows % chunk]


def sharded_corpus_retrieval_eval(
    query_emb: jax.Array,
    corpus_emb,
    positive_rows: np.ndarray,
    mesh,
    *,
    ks: tuple[int, ...] = (10, 100),
    query_chunk: int = 1024,
) -> CorpusEvalResult:
    """`corpus_retrieval_eval` with the corpus row-sharded over a mesh.

    Each chip scores queries against only its corpus shard and counts rows
    above the positive; a `psum` over integer counts merges shards exactly
    (same definition as the single-device path: strict >, positive's own
    column excluded, positive score from its gathered row). Cross-chip
    traffic per query block: the [Q, D] positive rows (psum) + [Q] counts.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS

    axis = DATA_AXIS
    ndev = mesh.shape[axis]
    corpus = np.asarray(corpus_emb, np.float32) if not isinstance(corpus_emb, jax.Array) else corpus_emb
    n_valid = corpus.shape[0]
    shard_rows = -(-n_valid // ndev)
    pad = ndev * shard_rows - n_valid
    if pad:
        xp = jnp if isinstance(corpus, jax.Array) else np
        corpus = xp.concatenate([corpus, xp.zeros((pad, corpus.shape[1]), xp.float32)])
    corpus = jax.device_put(corpus, NamedSharding(mesh, P(axis, None)))
    pos = jnp.asarray(np.asarray(positive_rows), jnp.int32)
    rows = jnp.arange(shard_rows)

    def local_ranks(queries, pos_rows, shard):
        me = jax.lax.axis_index(axis)
        offset = me * shard_rows
        local = pos_rows - offset
        mine = (local >= 0) & (local < shard_rows)
        picked = jnp.take(shard, jnp.clip(local, 0, shard_rows - 1), axis=0)
        pos_vec = jax.lax.psum(jnp.where(mine[:, None], picked, 0), axis)
        pos_sim = jnp.sum(queries * pos_vec, axis=1, keepdims=True)
        sims = jnp.dot(queries, shard.T, preferred_element_type=jnp.float32)
        gl = offset + rows[None, :]
        live = (gl < n_valid) & (gl != pos_rows[:, None])
        return jax.lax.psum(
            jnp.sum(((sims > pos_sim) & live).astype(jnp.int32), axis=1), axis
        )

    ranks_fn = jax.jit(
        shard_map(
            local_ranks, mesh=mesh,
            in_specs=(P(), P(), P(axis, None)),
            out_specs=P(),
            check_vma=False,
        )
    )
    all_ranks = []
    for start in range(0, query_emb.shape[0], query_chunk):
        all_ranks.append(np.asarray(ranks_fn(
            jnp.asarray(query_emb[start : start + query_chunk]),
            pos[start : start + query_chunk],
            corpus,
        )))
    ranks = np.concatenate(all_ranks)
    return CorpusEvalResult(
        recall={k: float((ranks < k).mean()) for k in ks},
        mrr=float((1.0 / (ranks + 1.0)).mean()),
        num_queries=query_emb.shape[0],
        corpus_size=n_valid,
    )


def demonstrate_predictions(
    query_emb: jax.Array,
    corpus_emb: jax.Array,
    *,
    k: int = 10,
    query_keys=None,
    corpus_keys=None,
) -> list[dict]:
    """Top-k demo (reference: predict_batch + demonstrate_predictions,
    two_tower_train_task.py:181-207, evaluator.py:269-284)."""
    sims = jnp.dot(query_emb, corpus_emb.T, preferred_element_type=jnp.float32)
    scores, idx = jax.lax.top_k(sims, k)
    scores, idx = np.asarray(scores), np.asarray(idx)
    out = []
    for qi in range(query_emb.shape[0]):
        out.append(
            {
                "query": str(query_keys[qi]) if query_keys is not None else qi,
                "top_k": [
                    {
                        "candidate": str(corpus_keys[ci]) if corpus_keys is not None else int(ci),
                        "score": float(s),
                    }
                    for ci, s in zip(idx[qi], scores[qi])
                ],
            }
        )
    return out
