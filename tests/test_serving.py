"""Serving path: exact and int8 MIPS indexes, retrieval service, QPS bench."""

import jax
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
from jodalrob_twotower_tpu.serving.index import (
    BruteForceIndex,
    Int8Index,
    recall_vs_exact,
)
from jodalrob_twotower_tpu.serving.service import RetrievalService, qps_bench
from jodalrob_twotower_tpu.train.trainer import Trainer

_CFG = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=8,
        dense_projection_dim=16,
        tower_hidden_dims=(32, 16),
        final_embedding_dim=8,
        dropout_rate=0.0,
        compute_dtype="float32",
    ),
    loss=LossConfig(temperature=0.1),
    optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=4),
    data=DataConfig(batch_size=64),
    results_csv="",
)


def _unit(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_brute_force_exactness(rng):
    corpus = _unit(rng, 500, 16)
    queries = _unit(rng, 40, 16)
    res = BruteForceIndex(corpus, query_chunk=16).search(queries, k=5)
    sims = queries @ corpus.T
    expected = np.argsort(-sims, axis=1)[:, :5]
    np.testing.assert_array_equal(res.indices, expected)
    np.testing.assert_allclose(
        res.scores, np.take_along_axis(sims, expected, axis=1), rtol=1e-5
    )
    # scores descend
    assert np.all(np.diff(res.scores, axis=1) <= 1e-6)


def test_int8_index_high_recall(rng):
    corpus = _unit(rng, 2000, 32)
    queries = _unit(rng, 64, 32)
    exact = BruteForceIndex(corpus).search(queries, k=10)
    approx = Int8Index(corpus).search(queries, k=10)
    r = recall_vs_exact(approx, exact)
    assert r >= 0.9, f"int8 recall vs exact too low: {r}"
    # 4x memory compression (int8 values + f32 scale per row)
    idx = Int8Index(corpus)
    assert idx.nbytes < corpus.nbytes / 3


def test_int8_zero_rows_safe():
    corpus = np.zeros((64, 16), np.float32)
    corpus[0, 0] = 1.0
    res = Int8Index(corpus).search(np.ones((2, 16), np.float32), k=3)
    assert np.isfinite(res.scores).all()
    assert res.indices[0, 0] == 0  # only nonzero row wins


@pytest.fixture(scope="module")
def service_setup(tiny_dataset):
    ds = tiny_dataset
    trainer = Trainer(_CFG, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va[:500], corpus_eval=False)
    return ds, trainer, result, va


@pytest.mark.parametrize("kind", ["exact", "int8"])
def test_service_end_to_end(service_setup, kind):
    ds, trainer, result, va = service_setup
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store, index_kind=kind
    )
    batch = ds.notice_store.gather(va[:32, 0])
    res = svc.search(batch, k=10)
    assert res.indices.shape == (32, 10)
    # trained model: positives should appear in top-10 far above chance
    hits = sum(int(va[i, 1]) in set(res.indices[i].tolist()) for i in range(32))
    assert hits >= 5, f"only {hits}/32 positives in top-10"
    keys = svc.search_keys(batch, k=3)
    assert len(keys) == 32 and len(keys[0]) == 3
    assert keys[0][0][0] in ds.company_store.key_to_row


def test_qps_bench_runs(service_setup):
    ds, trainer, result, _ = service_setup
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store, index_kind="int8"
    )
    out = qps_bench(svc, ds.notice_store, k=10, batch_size=64, n_batches=3)
    assert out["qps"] > 0 and out["corpus_size"] == len(ds.company_store)


@pytest.mark.parametrize("cls", [BruteForceIndex, Int8Index])
def test_corpus_chunked_scan_matches_single_shot(rng, cls):
    """Chunk-scanned top-k (huge-corpus path) must equal the one-matmul path,
    including when N is not a multiple of the chunk (padding is masked)."""
    corpus = _unit(rng, 1000, 16)  # 1000 = 3*384 + 232: exercises padding
    queries = _unit(rng, 24, 16)
    single = cls(corpus).search(queries, k=7)
    chunked = cls(corpus, corpus_chunk=384).search(queries, k=7)
    np.testing.assert_array_equal(chunked.indices, single.indices)
    np.testing.assert_allclose(chunked.scores, single.scores, rtol=1e-5, atol=1e-6)
    assert chunked.indices.max() < 1000  # never returns a padding row


def test_sharded_index_matches_single_device(rng):
    """Row-sharded mesh search == single-device exact, incl. padded shards."""
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.serving.index import ShardedIndex

    mesh = make_mesh(jax.devices()[:8])
    corpus = _unit(rng, 1003, 16)  # not a multiple of 8
    queries = _unit(rng, 16, 16)
    exact = BruteForceIndex(corpus).search(queries, k=9)
    for kind in ("exact", "int8"):
        sharded = ShardedIndex(corpus, mesh, kind=kind).search(queries, k=9)
        assert sharded.indices.max() < 1003
        if kind == "exact":
            np.testing.assert_array_equal(sharded.indices, exact.indices)
            np.testing.assert_allclose(sharded.scores, exact.scores, rtol=1e-5, atol=1e-6)
        else:
            assert recall_vs_exact(sharded, exact) >= 0.85


def test_fused_search_device_matches_search(service_setup):
    """search_device (one fused dispatch) == unfused encode->index search."""
    ds, trainer, result, va = service_setup
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store, index_kind="exact"
    )
    batch = ds.notice_store.gather(va[:16, 0])
    fused = svc.search(batch, k=5)
    q = svc.encode_queries(batch)
    unfused = svc.index.search(q, k=5)
    np.testing.assert_array_equal(fused.indices, unfused.indices)
    np.testing.assert_allclose(fused.scores, unfused.scores, rtol=1e-5, atol=1e-6)


def test_sharded_service_end_to_end(service_setup):
    """RetrievalService over a mesh-sharded corpus retrieves trained positives."""
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh

    ds, trainer, result, va = service_setup
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store,
        index_kind="int8", mesh=make_mesh(jax.devices()[:8]),
    )
    batch = ds.notice_store.gather(va[:32, 0])
    res = svc.search(batch, k=10)
    assert res.indices.shape == (32, 10)
    hits = sum(int(va[i, 1]) in set(res.indices[i].tolist()) for i in range(32))
    assert hits >= 5, f"only {hits}/32 positives in top-10 (sharded)"


def test_qps_bench_pipelined(service_setup):
    ds, trainer, result, _ = service_setup
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store,
        index_kind="exact", corpus_chunk=512,
    )
    out = qps_bench(svc, ds.notice_store, k=10, batch_size=64, n_batches=5,
                    pipeline_depth=3)
    assert out["qps"] > 0 and out["corpus_size"] == len(ds.company_store)


def test_chunked_index_save_load_roundtrip(tmp_path, rng):
    from jodalrob_twotower_tpu.serving.index import load_index, save_index

    corpus = _unit(rng, 700, 16)
    queries = _unit(rng, 8, 16)
    for cls in (BruteForceIndex, Int8Index):
        idx = cls(corpus, corpus_chunk=256)
        ref = idx.search(queries, k=5)
        p = tmp_path / f"{cls.__name__}_chunked.npz"
        save_index(idx, p)
        loaded = load_index(p)
        assert type(loaded) is cls and len(loaded) == 700
        assert loaded.corpus_chunk == 256
        out = loaded.search(queries, k=5)
        np.testing.assert_array_equal(out.indices, ref.indices)
        np.testing.assert_allclose(out.scores, ref.scores, rtol=1e-6)


def test_approx_recall_candidate_selection(rng):
    """approx_max_k selection (the TPU-fast path) keeps high recall vs exact,
    in both single-shot and chunk-scanned modes."""
    corpus = _unit(rng, 2000, 32)
    queries = _unit(rng, 32, 32)
    exact = BruteForceIndex(corpus).search(queries, k=10)
    for kwargs in ({}, {"corpus_chunk": 640}):
        approx = BruteForceIndex(corpus, approx_recall=0.95, **kwargs).search(
            queries, k=10
        )
        r = recall_vs_exact(approx, exact)
        assert r >= 0.9, f"approx recall too low ({kwargs}): {r}"
        assert approx.indices.max() < 2000


def test_device_built_int8_index_matches_host_built(rng):
    """Device-resident build path (10M-corpus bench): quantize on device,
    from_quantized without host round-trip, equals host-numpy build."""
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.serving.index import quantize_int8

    corpus = _unit(rng, 512, 16)
    queries = _unit(rng, 8, 16)
    host = Int8Index(corpus, corpus_chunk=128).search(queries, k=5)
    dv, dscale = quantize_int8(jnp.asarray(corpus))
    assert isinstance(dv, jax.Array) and dv.dtype == jnp.int8
    dev_idx = Int8Index.from_quantized(dv, dscale, corpus_chunk=128)
    dev = dev_idx.search(queries, k=5)
    np.testing.assert_array_equal(dev.indices, host.indices)
    np.testing.assert_allclose(dev.scores, host.scores, rtol=1e-6)


def test_service_prebuilt_index(service_setup):
    ds, trainer, result, va = service_setup
    emb = trainer.evaluator.encode_corpus(
        result.state, ds.company_store.dense, ds.company_store.cat_ids, side="company"
    ) if hasattr(trainer, "evaluator") else None
    svc_ref = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store, index_kind="exact"
    )
    idx = BruteForceIndex(svc_ref.index.corpus, corpus_chunk=512)
    svc = RetrievalService(
        trainer.model, _CFG, result.state, ds.company_store, prebuilt_index=idx
    )
    batch = ds.notice_store.gather(va[:8, 0])
    a, b = svc.search(batch, k=5), svc_ref.search(batch, k=5)
    np.testing.assert_array_equal(a.indices, b.indices)


def test_index_save_load_roundtrip(tmp_path, rng):
    from jodalrob_twotower_tpu.serving.index import load_index, save_index

    corpus = _unit(rng, 300, 16)
    queries = _unit(rng, 8, 16)
    for cls in (BruteForceIndex, Int8Index):
        idx = cls(corpus)
        ref = idx.search(queries, k=5)
        p = tmp_path / f"{cls.__name__}.npz"
        save_index(idx, p)
        loaded = load_index(p)
        assert type(loaded) is cls and len(loaded) == 300
        out = loaded.search(queries, k=5)
        np.testing.assert_array_equal(out.indices, ref.indices)
        np.testing.assert_allclose(out.scores, ref.scores, rtol=1e-6)


def test_rescore_recovers_approx_and_quant_loss(rng):
    """Two-stage search: approx int8 first pass over-fetches rescore_depth
    candidates, exact second pass re-ranks. bf16 rescore must recover BOTH
    the approx_max_k selection loss and (most of) the int8 quantization
    loss; int8 (memory-free) rescore recovers the selection loss only."""
    from jodalrob_twotower_tpu.serving.index import save_index, load_index

    corpus = _unit(rng, 4096, 32)
    queries = _unit(rng, 64, 32)
    k = 10
    exact = BruteForceIndex(corpus).search(queries, k=k)

    plain = Int8Index(corpus, approx_recall=0.9).search(queries, k=k)
    res_i8 = Int8Index(corpus, approx_recall=0.9, rescore_depth=8 * k
                       ).search(queries, k=k)
    res_bf = Int8Index(corpus, approx_recall=0.9, rescore_depth=8 * k,
                       rescore_dtype="bfloat16").search(queries, k=k)
    r_plain = recall_vs_exact(plain, exact)
    r_i8 = recall_vs_exact(res_i8, exact)
    r_bf = recall_vs_exact(res_bf, exact)
    assert r_i8 >= r_plain - 1e-9
    assert r_bf >= max(r_i8, 0.97), (r_plain, r_i8, r_bf)
    # bf16-rescored scores approximate the exact f32 dots closely
    np.testing.assert_allclose(res_bf.scores, exact.scores, atol=2e-2)

    # exact index + approx selection + rescore = fully exact result
    res_ex = BruteForceIndex(corpus, approx_recall=0.9, rescore_depth=8 * k
                             ).search(queries, k=k)
    assert recall_vs_exact(res_ex, exact) >= 0.99
    np.testing.assert_allclose(res_ex.scores, exact.scores, atol=1e-5)


def test_rescore_chunked_and_roundtrip(tmp_path, rng):
    """Rescore composes with the chunk-scanned layout (candidate indices are
    global rows; padding rows stay unselectable) and survives save/load."""
    from jodalrob_twotower_tpu.serving.index import load_index, save_index

    corpus = _unit(rng, 1000, 16)  # pads to 2 chunks of 512
    queries = _unit(rng, 32, 16)
    exact = BruteForceIndex(corpus).search(queries, k=5)
    idx = Int8Index(corpus, corpus_chunk=512, rescore_depth=50,
                    rescore_dtype="bfloat16")
    res = idx.search(queries, k=5)
    assert res.indices.max() < 1000  # never a padding row
    assert recall_vs_exact(res, exact) >= 0.95

    save_index(idx, tmp_path / "idx.npz")
    idx2 = load_index(tmp_path / "idx.npz")
    assert idx2.rescore_depth == 50 and idx2.rescore_dtype == "bfloat16"
    res2 = idx2.search(queries, k=5)
    np.testing.assert_array_equal(res.indices, res2.indices)

    # depth larger than a chunk clamps instead of crashing
    big = Int8Index(corpus, corpus_chunk=512, rescore_depth=5000)
    big.search(queries, k=5)

    with pytest.raises(ValueError, match="rescore_depth"):
        Int8Index(corpus, rescore_depth=0)
    with pytest.raises(ValueError, match="rescore_dtype"):
        Int8Index(corpus, rescore_depth=10, rescore_dtype="fp4")
    with pytest.raises(ValueError, match="full-precision"):
        Int8Index.from_quantized(np.zeros((8, 4), np.int8),
                                 np.ones((8, 1), np.float32),
                                 rescore_depth=4, rescore_dtype="bfloat16")


def test_sharded_rescore_matches_single_device(rng):
    """ShardedIndex rescore: each shard rescored locally before the ICI
    merge, so the merged ordering is exact among surfaced candidates."""
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.serving.index import ShardedIndex
    import jax

    corpus = _unit(rng, 1000, 16)  # 8 shards x 125 rows
    queries = _unit(rng, 32, 16)
    mesh = make_mesh(jax.devices()[:8], None)
    exact = BruteForceIndex(corpus).search(queries, k=5)

    sh = ShardedIndex(corpus, mesh, kind="int8", approx_recall=0.9,
                      rescore_depth=40, rescore_dtype="bfloat16")
    res = sh.search(queries, k=5)
    assert res.indices.max() < 1000
    assert recall_vs_exact(res, exact) >= 0.95
    np.testing.assert_allclose(res.scores, exact.scores, atol=3e-2)

    # single-device reference with the same settings agrees on recall level
    single = Int8Index(corpus, approx_recall=0.9, rescore_depth=40,
                       rescore_dtype="bfloat16").search(queries, k=5)
    assert abs(recall_vs_exact(res, exact) - recall_vs_exact(single, exact)) <= 0.1

    # memory-free int8 rescore and exact-kind rescore also run
    ShardedIndex(corpus, mesh, kind="int8", approx_recall=0.9,
                 rescore_depth=40).search(queries, k=5)
    r_ex = ShardedIndex(corpus, mesh, kind="exact", approx_recall=0.9,
                        rescore_depth=40).search(queries, k=5)
    np.testing.assert_allclose(r_ex.scores, exact.scores, atol=1e-5)


def test_rescore_review_fixes(tmp_path, rng):
    """Regression coverage for review findings: mismatched rescore_rows
    rejected, nbytes accounts the bf16 copy, persisted rescore rows are
    truncated like values, bad index_kind raises."""
    from jodalrob_twotower_tpu.serving.index import load_index, save_index

    corpus = _unit(rng, 1000, 16)
    with pytest.raises(ValueError, match="must cover the same corpus"):
        Int8Index.from_quantized(
            np.zeros((100, 16), np.int8), np.ones((100, 1), np.float32),
            rescore_depth=10, rescore_dtype="bfloat16",
            rescore_rows=corpus[:50],
        )

    idx = Int8Index(corpus, corpus_chunk=512, rescore_depth=20,
                    rescore_dtype="bfloat16")
    plain = Int8Index(corpus, corpus_chunk=512)
    assert idx.nbytes == plain.nbytes + idx.rescore_rows.size * 2

    save_index(idx, tmp_path / "i.npz")
    with np.load(tmp_path / "i.npz") as z:
        assert z["rescore_rows"].shape[0] == 1000  # truncated, not padded
        assert z["values"].shape[0] == 1000
    idx2 = load_index(tmp_path / "i.npz")
    q = _unit(rng, 8, 16)
    np.testing.assert_array_equal(
        idx.search(q, k=5).indices, idx2.search(q, k=5).indices
    )

    import jax
    from jodalrob_twotower_tpu.serving.service import RetrievalService

    with pytest.raises(ValueError, match="index_kind"):
        RetrievalService(None, None, None, None, index_kind="Int8",
                         precomputed_corpus_emb=corpus)


def test_choose_serving_config():
    """Recall-targeted auto-config (serving/autoconfig.py, VERDICT r2 #4):
    fastest measured config meeting the target; plain int8 never chosen
    (strictly dominated by rescore-400-over-0.90)."""
    from jodalrob_twotower_tpu.serving.autoconfig import choose_serving_config

    # any target <= 0.988 -> the dominating fast config
    for t in (0.5, 0.95, 0.980, 0.988):
        c = choose_serving_config(t)
        assert (c.index_kind, c.approx_recall, c.rescore_depth) == ("int8", 0.90, 400)
        assert c.expected_recall >= t
    # the plain-int8 operating point (recall 0.980, SLOWER than the above)
    # must never surface — the dominated-config guard
    assert choose_serving_config(0.980).rescore_depth == 400

    c = choose_serving_config(0.99)
    assert (c.index_kind, c.approx_recall, c.rescore_depth) == ("int8", 0.97, 400)
    assert c.rescore_dtype == "bfloat16"

    for t in (0.996, 0.999, 1.0):
        assert choose_serving_config(t).index_kind == "exact"

    # k beyond the measured curve -> conservative exact scan
    assert choose_serving_config(0.9, k=400).index_kind == "exact"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="target_recall"):
        choose_serving_config(0.0)
    with _pytest.raises(ValueError, match="target_recall"):
        choose_serving_config(1.2)

    flags = choose_serving_config(0.99).cli_flags()
    assert "--approx-recall" in flags and "--rescore-depth" in flags


def test_calibrate_serving_config_measures_on_the_index():
    """calibrate_serving_config (VERDICT r4 #4): the selection is a
    MEASUREMENT on the given corpus/queries, not the hardcoded table —
    a candidate that genuinely loses recall on this corpus is skipped and
    an unreachable target falls back to the exact scan.

    Self-seeded rng: the assertion thresholds depend on the exact drawn
    corpus, and the session-shared ``rng`` fixture's state varies with
    which tests ran before (order-dependent flake in the full suite)."""
    from jodalrob_twotower_tpu.serving.autoconfig import (
        ServingConfig,
        calibrate_serving_config,
    )

    rng = np.random.default_rng(321)

    d = 32
    # near-tie corpus: one direction + per-row noise far below the int8
    # quantization step, so plain int8 scrambles the exact ordering
    base = rng.normal(size=(d,)).astype(np.float32)
    base /= np.linalg.norm(base)
    corpus = base[None, :] + 1e-5 * rng.normal(size=(4096, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = base[None, :] + 1e-5 * rng.normal(size=(64, d)).astype(np.float32)
    queries = (queries / np.linalg.norm(queries, axis=1, keepdims=True)).astype(
        np.float32
    )

    lossy = ServingConfig("int8", None, None, "int8", 0.99, "plain int8")
    exact = ServingConfig("exact", None, None, "int8", 1.0, "exact scan")
    curve = (lossy, exact)

    chosen, measured = calibrate_serving_config(
        0.999, corpus, queries, k=10, curve=curve
    )
    # int8 rounding destroyed the near-tie ordering: measured well below
    # the candidate's table value (near-ZERO — identical quantized rows
    # tie-break by index order), so the target is unreachable -> exact.
    # The acceptance branch (+ measured-recall carry-through) is covered
    # on a well-separated corpus by
    # test_calibrate_serving_config_default_curve.
    assert measured["plain int8"] < 0.9
    assert chosen.index_kind == "exact"


def test_calibrate_serving_config_default_curve():
    """On a well-separated corpus the default curve's first candidate
    (rescore-400 over approx 0.90) measures ~1.0 at small scale and wins.
    Self-seeded rng (see test_calibrate_serving_config_measures_on_the_index)."""
    from jodalrob_twotower_tpu.serving.autoconfig import (
        calibrate_serving_config,
    )

    rng = np.random.default_rng(654)

    corpus = rng.normal(size=(2048, 16)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = corpus[rng.choice(2048, size=128, replace=False)]
    chosen, measured = calibrate_serving_config(0.95, corpus, queries, k=10)
    assert chosen.index_kind == "int8"
    assert chosen.rescore_depth == 400
    assert measured[chosen.note] >= 0.95
    # the chosen config carries its MEASURED (not tabled) recall
    assert chosen.expected_recall == pytest.approx(
        measured[chosen.note], abs=1e-6
    )
    with pytest.raises(ValueError, match="target_recall"):
        calibrate_serving_config(0.0, corpus, queries, k=10)
