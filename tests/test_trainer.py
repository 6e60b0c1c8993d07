"""Trainer driver, evaluator, checkpointing, ledger, CLI — end to end."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    CheckpointConfig,
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.parquet_dataset import load_pairs_parquet, save_dataset
from jodalrob_twotower_tpu.evaluation.evaluator import (
    corpus_retrieval_eval,
    demonstrate_predictions,
    qualitative_assessment,
)
from jodalrob_twotower_tpu.train.checkpoint import CheckpointManager
from jodalrob_twotower_tpu.train.ledger import append_result, read_results
from jodalrob_twotower_tpu.train.trainer import Trainer


def _cfg(tmp_path, epochs=2, batch=64):
    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.1),
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=epochs),
        data=DataConfig(batch_size=batch, test_split=0.2),
        checkpoint=CheckpointConfig(keep_n=2),
        results_csv=str(tmp_path / "train_results.csv"),
    )


@pytest.fixture(scope="module")
def trained_result(tiny_dataset, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("trainer")
    ds = tiny_dataset
    cfg = _cfg(tmp)
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va, checkpoint_dir=tmp / "ckpt", corpus_eval=True)
    return tmp, cfg, ds, trainer, result


def test_training_learns(trained_result):
    _, _, _, _, result = trained_result
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert result.final_val["accuracy"] > 3.0 / 64


def test_corpus_eval_reasonable(trained_result):
    _, _, ds, _, result = trained_result
    corpus = result.corpus
    assert corpus is not None
    assert corpus.corpus_size == len(ds.company_store)
    # planted clusters: top-100 of 512 should contain the positive often
    assert corpus.recall[100] > 0.4
    assert corpus.recall[10] <= corpus.recall[100]
    assert 0.0 < corpus.mrr <= 1.0


def test_sample_on_device_trains(tiny_dataset, tmp_path):
    """--sample-on-device path (VERDICT r2 #3): the headline-bench on-device
    IID sampling configuration reachable from the Trainer. steps_per_epoch
    deliberately NOT a multiple of n_inner so the remainder-dispatch variant
    compiles and runs too."""
    ds = tiny_dataset
    cfg = _cfg(tmp_path, epochs=2)
    cfg = cfg.replace(data=DataConfig(batch_size=64, sample_on_device=True))
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None
    )
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va, n_inner=7, corpus_eval=False)
    # 3277 train pairs / 64 = 51 steps/epoch = 7*7 + remainder 2
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.final_val["loss"])


def test_sample_on_device_rejects_streaming_and_sparse(tiny_dataset, tmp_path):
    ds = tiny_dataset
    cfg = _cfg(tmp_path).replace(data=DataConfig(batch_size=64, sample_on_device=True))
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None
    )
    tr, va = ds.split(0.2, seed=0)
    with pytest.raises(ValueError, match="streaming"):
        trainer.train(tr, va, batch_source=lambda e: iter([tr[:64]]),
                      steps_per_epoch=4, corpus_eval=False)

def test_sample_on_device_sparse_deferred(tiny_dataset, tmp_path):
    """Sampled x deferred sparse (one key per window, one batched table
    update per window — the fastest 10M config, key-fed): trains and
    learns on the Trainer surface."""
    ds = tiny_dataset
    cfg = _cfg(tmp_path, epochs=2).replace(
        data=DataConfig(batch_size=64, sample_on_device=True),
        sparse_tables=True,
        sparse_defer_updates=True,
    )
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None
    )
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va, n_inner=6, corpus_eval=False)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.final_val["loss"])


def test_sample_on_device_sparse_mesh(tiny_dataset, tmp_path):
    """Sparse tables + on-device sampling ON A MESH (VERDICT r3 #3): the
    last host-fed-only configuration now samples on-device and learns."""
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh

    ds = tiny_dataset
    cfg = _cfg(tmp_path, epochs=2).replace(
        data=DataConfig(batch_size=64, sample_on_device=True),
        sparse_tables=True,
    )
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store,
        mesh=make_mesh(jax.devices()[:8]), log_fn=lambda s: None,
    )
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va, n_inner=6, corpus_eval=False)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.final_val["loss"])


def test_sample_on_device_sparse(tiny_dataset, tmp_path):
    """Sparse O(batch) tables + on-device sampling (single device): the
    sampled scan drives make_sparse_train_step and training learns."""
    ds = tiny_dataset
    cfg = _cfg(tmp_path, epochs=2).replace(
        data=DataConfig(batch_size=64, sample_on_device=True),
        sparse_tables=True,
    )
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None
    )
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va, n_inner=6, corpus_eval=False)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.final_val["loss"])


def test_sample_on_device_mesh(tiny_dataset, tmp_path):
    """sample_on_device over a mesh: the GLOBAL batch is drawn on-mesh from
    the replicated pair set (make_sharded_sampled_steps) and training
    learns; works combined with row-sharded feature stores."""
    import dataclasses

    from jodalrob_twotower_tpu.config import MeshConfig
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    cfg = _cfg(tmp_path, epochs=2).replace(
        data=DataConfig(batch_size=64, sample_on_device=True),
        mesh=MeshConfig(store_sharding="rows"),
    )
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store,
        mesh=make_mesh(jax.devices()[:8]), log_fn=lambda s: None,
    )
    result = trainer.train(tr, va, n_inner=5, corpus_eval=False)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert np.isfinite(result.final_val["loss"])


def test_corpus_eval_chunked_matches_unchunked(rng):
    """Chunk-scanned rank counting (10M-corpus path) == one-shot, including
    padding masking (negative positive-scores must not rank padded zeros)."""
    import jax.numpy as jnp

    d = 16
    q = rng.normal(size=(40, d)).astype(np.float32)
    corpus = rng.normal(size=(333, d)).astype(np.float32)  # not a chunk multiple
    # make some positives score negative so zero-padding rows would outrank
    pos = rng.integers(0, 333, size=40)
    ref = corpus_retrieval_eval(jnp.asarray(q), jnp.asarray(corpus), pos, ks=(5, 50))
    chunked = corpus_retrieval_eval(
        jnp.asarray(q), jnp.asarray(corpus), pos, ks=(5, 50), corpus_chunk=128
    )
    assert chunked.corpus_size == 333
    assert chunked.recall == ref.recall
    assert abs(chunked.mrr - ref.mrr) < 1e-9


def test_ledger_written(trained_result):
    tmp, cfg, _, _, result = trained_result
    rows = read_results(cfg.results_csv)
    assert len(rows) == 1
    row = rows[0]
    assert float(row["val_accuracy"]) == pytest.approx(result.final_val["accuracy"], abs=1e-5)
    assert row["recall_at_5"] != ""  # the reference's CSV bug, fixed
    assert row["corpus_recall_at_10"] != ""
    assert int(row["num_params"]) == result.num_params


def test_ledger_appends_conform_to_legacy_header(tmp_path):
    """Appending to a CSV created before a schema change (e.g. round 4's
    z_gap column) must conform to THAT file's header — new columns are
    dropped, never silently shifted into the wrong columns."""
    from jodalrob_twotower_tpu.train.ledger import FIELDS

    legacy_fields = [f for f in FIELDS if f != "z_gap"]
    path = tmp_path / "legacy.csv"
    path.write_text(",".join(legacy_fields) + "\n")
    append_result(
        path,
        run_info={"batch_size": 64, "examples_per_sec": "123"},
        val_metrics={"loss": 1.5, "z_gap": 42.0, "similarity_gap": 0.3},
        train_loss=2.0,
    )
    rows = read_results(path)
    assert len(rows) == 1
    row = rows[0]
    assert row["examples_per_sec"] == "123"  # NOT z_gap's 42.0
    assert float(row["similarity_gap"]) == pytest.approx(0.3)
    assert "z_gap" not in row or row.get("z_gap") in (None, "")
    # a fresh file carries the full current schema including z_gap
    fresh = tmp_path / "fresh.csv"
    append_result(
        fresh, run_info={}, val_metrics={"z_gap": 42.0}, train_loss=1.0
    )
    assert float(read_results(fresh)[0]["z_gap"]) == pytest.approx(42.0)


def test_checkpoints_and_restore(trained_result):
    tmp, cfg, ds, trainer, result = trained_result
    ckpt = CheckpointManager(tmp / "ckpt", cfg.checkpoint)
    names = ckpt.available()
    assert "best" in names and "final" in names and "weights" in names
    assert any(n.startswith("epoch_") for n in names)

    # restore into a fresh state: metrics must match the trained state
    import jax

    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    tr, va = ds.split(0.2, seed=0)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:64])
    fresh, _ = create_train_state(trainer.model, cfg, jax.random.PRNGKey(99), example, 10)
    restored = ckpt.restore("final", fresh)
    m_trained = trainer.validate(result.state, va[:256])
    m_restored = trainer.validate(restored, va[:256])
    assert m_restored["loss"] == pytest.approx(m_trained["loss"], rel=1e-6)
    assert int(restored.step) == int(result.state.step)


def test_resume_continues(trained_result):
    tmp, cfg, ds, _, result = trained_result
    tr, va = ds.split(0.2, seed=0)
    cfg2 = cfg.replace(
        optimizer=cfg.optimizer.__class__(
            **{**cfg.optimizer.__dict__, "num_epochs": 3}
        )
    )
    trainer2 = Trainer(cfg2, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    r2 = trainer2.train(tr, va, checkpoint_dir=tmp / "ckpt", resume=True, corpus_eval=False)
    # resumed at epoch 2, ran exactly one more epoch
    assert [h["epoch"] for h in r2.history] == [2]
    assert int(r2.state.step) > int(result.state.step)


def test_epoch_pruning(trained_result):
    tmp, cfg, _, _, _ = trained_result
    ckpt = CheckpointManager(tmp / "ckpt", cfg.checkpoint)
    epochs = [n for n in ckpt.available() if n.startswith("epoch_")]
    assert len(epochs) <= cfg.checkpoint.keep_n


def test_qualitative_assessment():
    s = qualitative_assessment({"accuracy": 0.5, "similarity_gap": 0.5}, 64)
    assert "excellent" in s
    s = qualitative_assessment({"accuracy": 1 / 64, "similarity_gap": 0.0}, 64)
    assert "random" in s


def test_demonstrate_predictions(rng):
    q = rng.normal(size=(3, 8)).astype(np.float32)
    c = rng.normal(size=(20, 8)).astype(np.float32)
    out = demonstrate_predictions(q, c, k=5, corpus_keys=[f"co_{i}" for i in range(20)])
    assert len(out) == 3 and len(out[0]["top_k"]) == 5
    scores = [e["score"] for e in out[0]["top_k"]]
    assert scores == sorted(scores, reverse=True)
    best = int(np.argmax(q[0] @ c.T))
    assert out[0]["top_k"][0]["candidate"] == f"co_{best}"


def test_parquet_dataset_roundtrip(tiny_dataset, tmp_path):
    ds = tiny_dataset
    d = save_dataset(tmp_path / "data", ds.schema, ds.notice_store, ds.company_store, ds.pairs[:500])
    from jodalrob_twotower_tpu.data.feature_store import FeatureStore
    from jodalrob_twotower_tpu.schema import TwoTowerSchema

    schema = TwoTowerSchema.from_json(d / "schema.json")
    assert schema == ds.schema
    ns = FeatureStore.from_parquet(schema.notice, d / "notice.parquet")
    np.testing.assert_allclose(ns.dense, ds.notice_store.dense, rtol=1e-6)
    np.testing.assert_array_equal(ns.cat_ids, ds.notice_store.cat_ids)
    cs = FeatureStore.from_parquet(schema.company, d / "company.parquet")
    pairs = load_pairs_parquet(d / "pairs.parquet", ns, cs)
    np.testing.assert_array_equal(pairs, ds.pairs[:500])


def test_cli_end_to_end(tmp_path):
    """The CLI driver runs a tiny synthetic training to completion."""
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=4,
            dense_projection_dim=8,
            tower_hidden_dims=(16, 8),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        optimizer=OptimizerConfig(num_epochs=1),
        data=DataConfig(batch_size=64, pair_limit=2000),
        results_csv=str(tmp_path / "results.csv"),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/train.py",
            "--config",
            str(cfg_path),
            "--synthetic",
            "--output-dir",
            str(tmp_path / "out"),
            "--no-corpus-eval",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done:" in proc.stdout
    assert (tmp_path / "results.csv").exists()
    assert (tmp_path / "out" / "final").exists()


def test_cli_sample_on_device(tmp_path):
    """`scripts/train.py --sample-on-device` reaches the on-device-sampling
    trainer path (the bench.py headline config) from the shipped CLI."""
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=4,
            dense_projection_dim=8,
            tower_hidden_dims=(16, 8),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        optimizer=OptimizerConfig(num_epochs=1),
        data=DataConfig(batch_size=64, pair_limit=1000),
        results_csv=str(tmp_path / "results.csv"),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.to_json(cfg_path)
    proc = subprocess.run(
        [
            sys.executable, "scripts/train.py", "--config", str(cfg_path),
            "--synthetic", "--sample-on-device", "--no-corpus-eval",
            "--output-dir", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "done:" in proc.stdout

    # the incompatible-flags guard fails fast
    bad = subprocess.run(
        [
            sys.executable, "scripts/train.py", "--synthetic",
            "--sample-on-device", "--stream",
        ],
        capture_output=True, text=True, timeout=120, env=env, cwd="/root/repo",
    )
    assert bad.returncode != 0
    assert "incompatible" in bad.stderr


def test_indexed_eval_matches_host_eval(tiny_dataset):
    """Device-resident eval (evaluate_indexed: indices-only H2D, stacked
    dispatches) computes the same metrics as the host-assembled path."""
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.data.pipeline import (
        assemble_pair_batch as apb,
        epoch_batches,
    )
    from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state,
        device_store,
    )

    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32",
        ),
        results_csv="",
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    warm = apb(ds.notice_store, ds.company_store, ds.pairs[:64])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 10)
    ev = Evaluator(model, cfg)
    pairs = ds.pairs[:300]  # 4 batches of 64 + dropped remainder

    host = ev.evaluate(
        state,
        (apb(ds.notice_store, ds.company_store, idx)
         for idx in epoch_batches(pairs, 64, shuffle=False)),
    )
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)
    dev = ev.evaluate_indexed(state, pairs, n_store, c_store,
                              batch_size=64, stack=3)
    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_allclose(dev[k], host[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)

    # device corpus encode == host corpus encode, non-multiple chunk
    host_emb = ev.encode_corpus(
        state, ds.company_store.dense, ds.company_store.cat_ids,
        side="company", batch_size=128,
    )
    dev_emb = ev.encode_corpus_device(
        state, c_store, len(ds.company_store), side="company", chunk=100
    )
    np.testing.assert_allclose(
        np.asarray(dev_emb), np.asarray(host_emb), rtol=1e-5, atol=1e-6
    )
    # padded store (row-sharded style): trailing pad rows must not leak
    pad_store = (
        jnp.concatenate([c_store[0],
                         jnp.zeros((7, c_store[0].shape[1]), c_store[0].dtype)]),
        jnp.concatenate([c_store[1],
                         jnp.zeros((7, c_store[1].shape[1]), c_store[1].dtype)]),
    )
    dev_emb2 = ev.encode_corpus_device(
        state, pad_store, len(ds.company_store), side="company", chunk=100
    )
    np.testing.assert_allclose(
        np.asarray(dev_emb2), np.asarray(host_emb), rtol=1e-5, atol=1e-6
    )


def test_indexed_eval_single_compiled_signature(tiny_dataset):
    """A partial final stack must REUSE the one compiled signature via the
    overlapping start (a fresh tail shape would cost a 30-160 s remote
    recompile on the tunneled TPU — CLAUDE.md)."""
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch as apb
    from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state,
        device_store,
    )

    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(16,), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32",
        ),
        results_csv="",
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    warm = apb(ds.notice_store, ds.company_store, ds.pairs[:32])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 10)
    ev = Evaluator(model, cfg)
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)
    # 11 batches of 32, stack 4 -> stacks [0,4,8] + overlapping tail at 7
    out = ev.evaluate_indexed(state, ds.pairs[: 11 * 32], n_store, c_store,
                              batch_size=32, stack=4)
    assert out["num_batches"] == 11.0
    # one gather flavor (plain take, key None) -> one jitted fn -> ONE
    # compiled signature despite the overlapping tail stack
    assert set(ev._indexed_eval) == {None}
    assert ev._indexed_eval[None]._cache_size() == 1
