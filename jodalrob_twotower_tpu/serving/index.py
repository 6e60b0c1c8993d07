"""MIPS top-k indexes over a frozen corpus of tower embeddings.

The reference had single-side encoders "for serving/index building" but **no
index or serving loop at all** (SURVEY.md §3.5, two_tower_model.py:102-108).
This module supplies the serving path from BASELINE config 5:

* :class:`BruteForceIndex` — exact maximum-inner-product search: [Q, N]
  matmul + top-k, corpus resident in HBM.
* :class:`Int8Index` — corpus rows quantized to int8 with one f32 scale per
  row (max-abs symmetric). Scores are ``(q · int8_rowᵀ) * row_scale`` with
  the int8→bf16 convert fused into the matmul by XLA, so HBM reads are 4x
  smaller than f32 brute force.
* :class:`ShardedIndex` — corpus row-sharded over a device mesh: each chip
  scores its shard and takes a local top-k, the [k] candidates ride ICI via
  ``all_gather`` and merge — search over corpora beyond one chip's HBM.

Large corpora (BASELINE config 5: 10M companies) cannot materialize the
full [Q, N] score matrix (1024×10M f32 = 40 GB). Passing ``corpus_chunk``
stores the corpus as [n_chunks, C, D] and searches with a `lax.scan` that
carries a running top-k, so peak memory is [Q, C] regardless of N.

All indexes expose a *traceable* ``topk_body(queries, k)`` so serving can
fuse encode+search into one dispatch, plus a host-facing
``search(queries, k)`` with a fixed (chunk, k) jit signature.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SearchResult(NamedTuple):
    scores: np.ndarray  # [Q, k] float32, descending
    indices: np.ndarray  # [Q, k] int32 corpus rows


_NEG = float(np.finfo(np.float32).min)


def _topk_chunked(score_fn, queries: jax.Array, k: int, query_chunk: int) -> SearchResult:
    q = queries.shape[0]
    scores_out = []
    idx_out = []
    for start in range(0, q, query_chunk):
        chunk = queries[start : start + query_chunk]
        s, i = score_fn(chunk, k)
        scores_out.append(np.asarray(s))
        idx_out.append(np.asarray(i))
    return SearchResult(np.concatenate(scores_out), np.concatenate(idx_out))


def _xp(arr):
    """numpy for host arrays, jnp for device arrays (avoids 5 GB D2H round
    trips when building indexes from embeddings that already live in HBM)."""
    return jnp if isinstance(arr, jax.Array) else np


def _pad_chunks(arr, chunk: int):
    """[N, ...] -> ([n_chunks, chunk, ...], N). Padding rows are zeros."""
    xp = _xp(arr)
    n = arr.shape[0]
    n_chunks = max(1, -(-n // chunk))
    pad = n_chunks * chunk - n
    if pad:
        arr = xp.concatenate([arr, xp.zeros((pad, *arr.shape[1:]), arr.dtype)])
    return arr.reshape(n_chunks, chunk, *arr.shape[1:]), n


def _merge_topk(scores_a, idx_a, scores_b, idx_b, k: int):
    """Merge two per-query candidate sets into the best k of their union."""
    s, sel = jax.lax.top_k(jnp.concatenate([scores_a, scores_b], axis=1), k)
    i = jnp.take_along_axis(jnp.concatenate([idx_a, idx_b], axis=1), sel, axis=1)
    return s, i


def _rescore_topk(queries, cand_scores, cand_idx, k: int, rescore_rows,
                  rescore_scales=None):
    """Second-stage exact rescore of first-pass candidates.

    ``cand_idx`` [Q, R] (R >= k) indexes ``rescore_rows`` [N, D] (bf16/f32
    full-precision copy, or the int8 values with ``rescore_scales`` for a
    memory-free dequantized rescore). Gathers the R candidate rows per query
    (Q·R row DMAs — ~1 ms for 1024×400) and replaces the approximate scores
    with exact dots before the final top-k, recovering the recall lost to
    ``approx_max_k`` bucketing (and, with a full-precision copy, to int8
    quantization). The classic two-stage retrieval design the reference
    lacked entirely.
    """
    cand = jnp.take(rescore_rows, cand_idx, axis=0)  # [Q, R, D]
    if rescore_scales is not None:
        scale = jnp.take(rescore_scales[:, 0], cand_idx, axis=0)  # [Q, R]
    qd = queries.astype(jnp.bfloat16 if cand.dtype == jnp.int8 else cand.dtype)
    s = jnp.einsum(
        "qd,qrd->qr", qd, cand.astype(qd.dtype), preferred_element_type=jnp.float32
    )
    if rescore_scales is not None:
        s = s * scale
    # first-pass padding sentinels stay unselectable
    s = jnp.where(cand_scores <= _NEG, _NEG, s)
    s2, sel = jax.lax.top_k(s, k)
    return s2, jnp.take_along_axis(cand_idx, sel, axis=1)


def _check_rescore_depth(depth: int | None) -> int | None:
    if depth is not None and depth < 1:
        raise ValueError(f"rescore_depth must be >= 1, got {depth}")
    return depth


def _select_topk(sims, k: int, approx_recall: float | None):
    """Per-block candidate selection: exact sort-based top-k, or the TPU-native
    ``approx_max_k``. On this hardware approx_max_k fuses with the producing
    matmul and never materializes the [Q, N] score block — measured 89 ms →
    3.8 ms for [1024, 262144] k=100 (scripts/topk_microbench.py); exact
    top_k pays a full sort."""
    if approx_recall is None:
        return jax.lax.top_k(sims, k)
    return jax.lax.approx_max_k(sims, k, recall_target=approx_recall)


def _scanned_topk(chunk_sims_fn, n_chunks: int, chunk_rows: int, n_valid: int,
                  queries: jax.Array, k: int, approx_recall: float | None):
    """Running top-k over corpus chunks; peak memory is one [Q, chunk] block.

    ``chunk_sims_fn(queries, ci) -> [Q, chunk_rows] f32`` scores chunk ci.
    Padding rows (global row >= n_valid) are masked to -inf before top-k.
    """
    rows = jnp.arange(chunk_rows)

    def body(carry, ci):
        best_s, best_i = carry
        sims = chunk_sims_fn(queries, ci)
        sims = jnp.where(ci * chunk_rows + rows[None, :] < n_valid, sims, _NEG)
        s, i = _select_topk(sims, k, approx_recall)
        carry = _merge_topk(best_s, best_i, s, (i + ci * chunk_rows).astype(jnp.int32), k)
        return carry, None

    q = queries.shape[0]
    init = (jnp.full((q, k), _NEG, jnp.float32), jnp.zeros((q, k), jnp.int32))
    (s, i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return s, i


class BruteForceIndex:
    """Exact MIPS: corpus [N, D] f32 resident on device.

    ``corpus_chunk=None`` keeps one flat [N, D] array and a single-matmul
    search (fastest for corpora whose [Q, N] scores fit). With
    ``corpus_chunk=C`` the corpus lives as [n_chunks, C, D] and search scans.
    """

    kind = "exact"

    def __init__(self, corpus_emb, *, query_chunk: int = 1024,
                 corpus_chunk: int | None = None,
                 approx_recall: float | None = None,
                 rescore_depth: int | None = None) -> None:
        corpus = (corpus_emb if isinstance(corpus_emb, jax.Array)
                  else np.asarray(corpus_emb, np.float32))
        corpus = corpus.astype(_xp(corpus).float32)
        self.query_chunk = query_chunk
        self.corpus_chunk = corpus_chunk
        self.approx_recall = approx_recall
        self.rescore_depth = _check_rescore_depth(rescore_depth)
        if corpus_chunk is None:
            self.corpus = jnp.asarray(corpus)
            self.n_valid = corpus.shape[0]
        else:
            chunks, self.n_valid = _pad_chunks(corpus, corpus_chunk)
            self.corpus = jnp.asarray(chunks)  # [nc, C, D]
        # corpus is an explicit argument, NOT a closure: a closed-over device
        # array is baked into the HLO as a constant, which ships the whole
        # corpus inside every (remote) compile request
        self._jit_search = jax.jit(self._topk_impl, static_argnums=(1,))

    def _topk_impl(self, queries, k: int, corpus):
        q32 = queries.astype(jnp.float32)
        kk = max(k, self.rescore_depth or 0)
        if self.corpus_chunk is None:
            kk = max(k, min(kk, corpus.shape[0]))
            sims = jnp.dot(q32, corpus.T, preferred_element_type=jnp.float32)
            s, i = _select_topk(sims, kk, self.approx_recall)
            flat = corpus
        else:
            nc, c, _ = corpus.shape
            kk = max(k, min(kk, c))  # per-chunk candidate cap

            def chunk_sims(qs, ci):
                return jnp.dot(qs, corpus[ci].T, preferred_element_type=jnp.float32)

            s, i = _scanned_topk(chunk_sims, nc, c, self.n_valid, q32, kk,
                                 self.approx_recall)
            flat = corpus.reshape(-1, corpus.shape[-1])
        if not self.rescore_depth:
            return s, i
        # exact second pass over the kk candidates (fixes approx_max_k /
        # chunk-merge selection error; scores become exact f32 dots)
        return _rescore_topk(q32, s, i, k, flat)

    def corpus_args(self) -> tuple:
        """Device arrays the search body needs (pass through enclosing jits)."""
        return (self.corpus,)

    def topk_body(self, queries, k: int, *corpus_args):
        """Traceable search body (fuse into larger jits, e.g. encode+search).

        Pass ``*index.corpus_args()`` through the enclosing jit's arguments —
        closing over them instead works but embeds the corpus in the HLO."""
        return self._topk_impl(queries, k, *(corpus_args or self.corpus_args()))

    def __len__(self) -> int:
        return self.n_valid

    def search(self, queries, k: int = 10) -> SearchResult:
        score = lambda q, k: self._jit_search(q, k, *self.corpus_args())
        return _topk_chunked(score, jnp.asarray(queries), k, self.query_chunk)

    def _host_corpus(self) -> np.ndarray:
        if self.corpus_chunk is None:
            return np.asarray(self.corpus)
        flat = np.asarray(self.corpus).reshape(-1, self.corpus.shape[-1])
        return flat[: self.n_valid]


class Int8Index:
    """Row-wise symmetric int8 quantized MIPS (4x less HBM traffic)."""

    kind = "int8"

    def __init__(self, corpus_emb, *, query_chunk: int = 1024,
                 corpus_chunk: int | None = None,
                 approx_recall: float | None = None,
                 rescore_depth: int | None = None,
                 rescore_dtype: str = "int8") -> None:
        corpus = (corpus_emb if isinstance(corpus_emb, jax.Array)
                  else np.asarray(corpus_emb, np.float32))
        corpus = corpus.astype(_xp(corpus).float32)
        values, scales = quantize_int8(corpus)
        rescore_rows = None
        if rescore_depth and rescore_dtype == "bfloat16":
            rescore_rows = corpus  # cast + pad in _init_from_quantized
        self._init_from_quantized(values, scales, query_chunk, corpus_chunk,
                                  approx_recall, rescore_depth=rescore_depth,
                                  rescore_dtype=rescore_dtype,
                                  rescore_rows=rescore_rows)

    def _init_from_quantized(self, values, scales, query_chunk: int,
                             corpus_chunk: int | None,
                             approx_recall: float | None = None,
                             rescore_depth: int | None = None,
                             rescore_dtype: str = "int8",
                             rescore_rows=None) -> None:
        if rescore_dtype not in ("int8", "bfloat16"):
            raise ValueError(
                f"rescore_dtype must be 'int8' or 'bfloat16', got {rescore_dtype!r}"
            )
        if rescore_depth and rescore_dtype == "bfloat16" and rescore_rows is None:
            raise ValueError(
                "bfloat16 rescore needs the full-precision corpus; build via "
                "Int8Index(corpus_emb, ...) or pass rescore_rows"
            )
        if rescore_rows is not None and rescore_rows.shape[0] != values.shape[0]:
            # jnp.take clamps out-of-bounds indices, so a mismatched copy
            # would silently score candidates against the WRONG rows
            raise ValueError(
                f"rescore_rows has {rescore_rows.shape[0]} rows but values has "
                f"{values.shape[0]} — they must cover the same corpus"
            )
        self.query_chunk = query_chunk
        self.corpus_chunk = corpus_chunk
        self.approx_recall = approx_recall
        self.rescore_depth = _check_rescore_depth(rescore_depth)
        self.rescore_dtype = rescore_dtype
        if corpus_chunk is None:
            self.values = jnp.asarray(values)  # [N, D] int8
            self.scales = jnp.asarray(scales)  # [N, 1] f32
            self.n_valid = values.shape[0]
        else:
            vc, self.n_valid = _pad_chunks(values, corpus_chunk)
            sc, _ = _pad_chunks(scales, corpus_chunk)
            self.values = jnp.asarray(vc)  # [nc, C, D]
            self.scales = jnp.asarray(sc)  # [nc, C, 1]
        self.rescore_rows = None
        if self.rescore_depth and rescore_dtype == "bfloat16":
            rows = rescore_rows.astype(jnp.bfloat16)
            if corpus_chunk is not None:
                # pad flat to the chunked row count so candidate indices into
                # padding rows stay in-bounds (their scores are masked)
                rows, _ = _pad_chunks(rows, corpus_chunk)
                rows = rows.reshape(-1, rows.shape[-1])
            self.rescore_rows = jnp.asarray(rows)  # [N_pad, D] bf16
        self._jit_search = jax.jit(self._topk_impl, static_argnums=(1,))

    @classmethod
    def from_quantized(cls, values, scales, *, query_chunk: int = 1024,
                       corpus_chunk: int | None = None,
                       approx_recall: float | None = None,
                       rescore_depth: int | None = None,
                       rescore_dtype: str = "int8",
                       rescore_rows=None) -> "Int8Index":
        """Build from already-quantized rows (device arrays stay on device)."""
        idx = cls.__new__(cls)
        if not isinstance(values, jax.Array):
            values, scales = np.asarray(values), np.asarray(scales)
        idx._init_from_quantized(values, scales, query_chunk, corpus_chunk,
                                 approx_recall, rescore_depth=rescore_depth,
                                 rescore_dtype=rescore_dtype,
                                 rescore_rows=rescore_rows)
        return idx

    def _topk_impl(self, queries, k: int, values, scales, *rescore_args):
        qbf = queries.astype(jnp.bfloat16)
        kk = max(k, self.rescore_depth or 0)
        if self.corpus_chunk is None:
            kk = max(k, min(kk, values.shape[0]))
            sims = jnp.dot(qbf, values.T.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32) * scales[:, 0][None, :]
            s, i = _select_topk(sims, kk, self.approx_recall)
            values_flat, scales_flat = values, scales
        else:
            nc, c, _ = values.shape
            kk = max(k, min(kk, c))  # per-chunk candidate cap

            def chunk_sims(qs, ci):
                return jnp.dot(qs, values[ci].T.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) * scales[ci][:, 0][None, :]

            s, i = _scanned_topk(chunk_sims, nc, c, self.n_valid, qbf, kk,
                                 self.approx_recall)
            values_flat = values.reshape(-1, values.shape[-1])
            scales_flat = scales.reshape(-1, 1)
        if not self.rescore_depth:
            return s, i
        if rescore_args:  # bf16 full-precision second pass
            return _rescore_topk(queries, s, i, k, rescore_args[0])
        # memory-free second pass on dequantized int8 rows: fixes the
        # approx_max_k / chunk-merge selection error (not quantization)
        return _rescore_topk(queries, s, i, k, values_flat, scales_flat)

    def corpus_args(self) -> tuple:
        """Device arrays the search body needs (pass through enclosing jits)."""
        if self.rescore_rows is not None:
            return (self.values, self.scales, self.rescore_rows)
        return (self.values, self.scales)

    def topk_body(self, queries, k: int, *corpus_args):
        """Traceable search body; see BruteForceIndex.topk_body."""
        return self._topk_impl(queries, k, *(corpus_args or self.corpus_args()))

    def __len__(self) -> int:
        return self.n_valid

    @property
    def nbytes(self) -> int:
        """Device bytes the index pins: int8 values + f32 scales + the bf16
        rescore copy when present."""
        n = self.values.size + self.scales.size * 4
        if self.rescore_rows is not None:
            n += self.rescore_rows.size * 2
        return n

    def search(self, queries, k: int = 10) -> SearchResult:
        score = lambda q, k: self._jit_search(q, k, *self.corpus_args())
        return _topk_chunked(score, jnp.asarray(queries), k, self.query_chunk)

    def _host_quantized(self) -> tuple[np.ndarray, np.ndarray]:
        if self.corpus_chunk is None:
            return np.asarray(self.values), np.asarray(self.scales)
        v = np.asarray(self.values).reshape(-1, self.values.shape[-1])[: self.n_valid]
        s = np.asarray(self.scales).reshape(-1, 1)[: self.n_valid]
        return v, s


def _quantize_int8_fused(corpus):
    amax = jnp.max(jnp.abs(corpus), axis=1, keepdims=True)
    scales = (amax / 127.0).astype(jnp.float32)
    safe = jnp.where(scales > 0, scales, jnp.ones_like(scales))
    values = jnp.clip(jnp.round(corpus / safe), -127, 127).astype(jnp.int8)
    return values, scales


_quantize_int8_jit = jax.jit(_quantize_int8_fused)


def quantize_int8(corpus):
    """Row-wise symmetric int8: values [N, D] int8, scales [N, 1] f32.

    Works on host numpy or device jax arrays. The device path runs under
    ONE jit so XLA fuses the divide/round/clip/cast chain — eager ops each
    materialize a corpus-sized f32 temp, which at 10M x 128 (5 GB apiece)
    OOMs HBM next to the corpus itself (hit by the round-5 10M
    calibration bench).
    """
    if isinstance(corpus, jax.Array):
        return _quantize_int8_jit(corpus)
    amax = np.max(np.abs(corpus), axis=1, keepdims=True)
    scales = (amax / 127.0).astype(np.float32)
    safe = np.where(scales > 0, scales, np.ones_like(scales))
    values = np.clip(np.round(corpus / safe), -127, 127).astype(np.int8)
    return values, scales


class ShardedIndex:
    """MIPS over a corpus row-sharded across a device mesh.

    Each device scores only its rows and takes a local top-k; the k
    candidates per device are all-gathered over ICI and merged — total
    cross-chip traffic is O(ndev·k), never the corpus. Scales serving to
    corpora that exceed one chip's HBM (the multi-chip half of BASELINE
    config 5). ``kind`` picks f32-exact or int8-quantized shards.
    """

    def __init__(self, corpus_emb, mesh, *, axis: str = "data",
                 kind: str = "exact", query_chunk: int = 1024,
                 approx_recall: float | None = None,
                 rescore_depth: int | None = None,
                 rescore_dtype: str = "int8") -> None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if rescore_dtype not in ("int8", "bfloat16"):
            raise ValueError(
                f"rescore_dtype must be 'int8' or 'bfloat16', got {rescore_dtype!r}"
            )
        self.mesh = mesh
        self.axis = axis
        self.kind = kind
        self.query_chunk = query_chunk
        self.approx_recall = approx_recall
        self.rescore_depth = _check_rescore_depth(rescore_depth)
        self.rescore_dtype = rescore_dtype
        ndev = mesh.shape[axis]
        corpus = (corpus_emb if isinstance(corpus_emb, jax.Array)
                  else np.asarray(corpus_emb, np.float32))
        xp = _xp(corpus)
        corpus = corpus.astype(xp.float32)
        self.n_valid = corpus.shape[0]
        shard_rows = -(-self.n_valid // ndev)
        pad = ndev * shard_rows - self.n_valid
        if pad:
            corpus = xp.concatenate(
                [corpus, xp.zeros((pad, corpus.shape[1]), xp.float32)]
            )
        self.shard_rows = shard_rows
        row_sharded = NamedSharding(mesh, P(axis, None))
        self.rescore_rows = None
        if kind == "int8":
            values, scales = quantize_int8(corpus)
            self.values = jax.device_put(values, row_sharded)
            self.scales = jax.device_put(scales, row_sharded)
            if self.rescore_depth and rescore_dtype == "bfloat16":
                self.rescore_rows = jax.device_put(
                    corpus.astype(jnp.bfloat16), row_sharded
                )
        elif kind == "exact":
            self.corpus = jax.device_put(corpus, row_sharded)
        else:
            raise ValueError(f"unknown kind: {kind}")
        self._jit_search = jax.jit(self._topk_impl, static_argnums=(1,))

    def __len__(self) -> int:
        return self.n_valid

    def corpus_args(self) -> tuple:
        """Device arrays the search body needs (pass through enclosing jits)."""
        if self.kind != "int8":
            return (self.corpus,)
        if self.rescore_rows is not None:
            return (self.values, self.scales, self.rescore_rows)
        return (self.values, self.scales)

    def topk_body(self, queries, k: int, *corpus_args):
        """Traceable search body; see BruteForceIndex.topk_body."""
        return self._topk_impl(queries, k, *(corpus_args or self.corpus_args()))

    def _topk_impl(self, queries, k: int, *shards):
        """queries replicated in, [Q, k] replicated out."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis, shard_rows, n_valid = self.axis, self.shard_rows, self.n_valid
        rows = jnp.arange(shard_rows)
        kk = max(k, min(self.rescore_depth or 0, shard_rows))

        def local_search(queries, *shard):
            me = jax.lax.axis_index(axis)
            if self.kind == "int8":
                values, scales = shard[0], shard[1]
                sims = jnp.dot(queries.astype(jnp.bfloat16),
                               values.T.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32) * scales[:, 0][None, :]
            else:
                (corpus,) = shard
                sims = jnp.dot(queries.astype(jnp.float32), corpus.T,
                               preferred_element_type=jnp.float32)
            sims = jnp.where(me * shard_rows + rows[None, :] < n_valid, sims, _NEG)
            s, i = _select_topk(sims, kk, self.approx_recall)
            if self.rescore_depth and self.kind == "int8":
                # second pass on LOCAL shard rows (indices are still shard-
                # local here) — merge then happens on exact scores, so the
                # cross-shard ordering is exact too
                if len(shard) == 3:  # bf16 full-precision shard
                    s, i = _rescore_topk(queries, s, i, k, shard[2])
                else:  # dequantized int8: fixes selection loss only
                    s, i = _rescore_topk(queries, s, i, k, values, scales)
            elif self.rescore_depth:  # exact shards: fix approx selection loss
                s, i = _rescore_topk(queries, s, i, k, shard[0])
            # (kk == k whenever rescore_depth is unset, so no trim needed)
            i = (i + me * shard_rows).astype(jnp.int32)
            # k candidates per device ride ICI; merge is replicated work
            s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [Q, ndev*k]
            i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
            s2, sel = jax.lax.top_k(s_all, k)
            return s2, jnp.take_along_axis(i_all, sel, axis=1)

        fn = shard_map(
            local_search,
            mesh=self.mesh,
            in_specs=(P(), *([P(axis, None)] * len(shards))),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, *shards)

    def search(self, queries, k: int = 10) -> SearchResult:
        score = lambda q, k: self._jit_search(q, k, *self.corpus_args())
        return _topk_chunked(score, jnp.asarray(queries), k, self.query_chunk)


def save_index(index: "BruteForceIndex | Int8Index", path) -> None:
    """Persist a built index (npz): rebuildable without the towers."""
    if isinstance(index, Int8Index):
        values, scales = index._host_quantized()
        extra = {}
        if index.rescore_rows is not None:
            # bf16 doesn't survive npz: persist as f32 (exact superset);
            # truncate padding like values/scales — load re-pads to the
            # chunk multiple
            extra["rescore_rows"] = np.asarray(
                index.rescore_rows.astype(jnp.float32)
            )[: index.n_valid]
        np.savez_compressed(
            path, kind="int8", values=values, scales=scales,
            query_chunk=index.query_chunk,
            corpus_chunk=index.corpus_chunk or 0,
            approx_recall=index.approx_recall or 0.0,
            rescore_depth=index.rescore_depth or 0,
            rescore_dtype=index.rescore_dtype,
            **extra,
        )
    else:
        np.savez_compressed(
            path, kind="exact", corpus=index._host_corpus(),
            query_chunk=index.query_chunk,
            corpus_chunk=index.corpus_chunk or 0,
            approx_recall=index.approx_recall or 0.0,
            rescore_depth=index.rescore_depth or 0,
        )


def load_index(path) -> "BruteForceIndex | Int8Index":
    with np.load(path) as z:
        kind = str(z["kind"])
        corpus_chunk = int(z["corpus_chunk"]) if "corpus_chunk" in z else 0
        approx = float(z["approx_recall"]) if "approx_recall" in z else 0.0
        depth = int(z["rescore_depth"]) if "rescore_depth" in z else 0
        if kind == "int8":
            return Int8Index.from_quantized(
                z["values"], z["scales"],
                query_chunk=int(z["query_chunk"]),
                corpus_chunk=corpus_chunk or None,
                approx_recall=approx or None,
                rescore_depth=depth or None,
                rescore_dtype=(str(z["rescore_dtype"])
                               if "rescore_dtype" in z else "int8"),
                rescore_rows=(z["rescore_rows"] if "rescore_rows" in z else None),
            )
        return BruteForceIndex(z["corpus"], query_chunk=int(z["query_chunk"]),
                               corpus_chunk=corpus_chunk or None,
                               approx_recall=approx or None,
                               rescore_depth=depth or None)


def recall_vs_exact(
    approx: SearchResult, exact: SearchResult, k: int | None = None
) -> float:
    """Fraction of exact top-k that the approximate index recovered."""
    k = k or exact.indices.shape[1]
    hits = 0
    for a_row, e_row in zip(approx.indices[:, :k], exact.indices[:, :k]):
        hits += len(set(a_row.tolist()) & set(e_row.tolist()))
    return hits / (exact.indices.shape[0] * k)
