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
