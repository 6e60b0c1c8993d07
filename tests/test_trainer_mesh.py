"""The production Trainer on a device mesh.

Trainer(mesh=...) must train end-to-end with tables row-sharded and the
batch dim sharded, match the single-device Trainer's trajectory (global
in-batch negatives preserve the loss semantics), checkpoint/resume sharded
state, and work for both the dense and the sparse-table paths.
"""

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
from jodalrob_twotower_tpu.parallel.mesh import make_mesh
from jodalrob_twotower_tpu.train.trainer import Trainer

_CFG = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=8,
        dense_projection_dim=16,
        tower_hidden_dims=(32, 16),
        final_embedding_dim=8,
        dropout_rate=0.0,
        compute_dtype="float32",
        use_batch_norm=False,
    ),
    loss=LossConfig(temperature=0.2, use_fused_logits=False),
    optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=2),
    data=DataConfig(batch_size=64),
    results_csv="",
)


@pytest.fixture(scope="module")
def split_ds(tiny_dataset):
    return tiny_dataset.split(0.2, seed=0)


def _train(ds, tr, va, mesh, cfg=_CFG, **kw):
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store,
                      mesh=mesh, log_fn=lambda s: None)
    return trainer.train(tr, va[:256], corpus_eval=False, **kw)


def test_mesh_trainer_matches_single_device(tiny_dataset, split_ds):
    ds = tiny_dataset
    tr, va = split_ds
    r1 = _train(ds, tr, va, mesh=None)
    r8 = _train(ds, tr, va, mesh=make_mesh(jax.devices()[:8]))
    # identical init seed + identical batch order + global negatives ->
    # the same training trajectory up to reduction order
    for e1, e8 in zip(r1.history, r8.history):
        np.testing.assert_allclose(e1["train_loss"], e8["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(e1["val_loss"], e8["val_loss"], rtol=1e-4)
    np.testing.assert_allclose(
        r1.final_val["accuracy"], r8.final_val["accuracy"], atol=0.02
    )
    assert r8.history[-1]["train_loss"] < r8.history[0]["train_loss"]


def test_mesh_trainer_state_is_sharded(tiny_dataset, split_ds):
    import dataclasses

    from jodalrob_twotower_tpu.config import MeshConfig

    ds = tiny_dataset
    tr, va = split_ds
    mesh = make_mesh(jax.devices()[:8])
    # pin the row-sharded mode: "auto" resolves these tiny vocabs to the
    # replicated+dense-grad regime (tested below)
    cfg = dataclasses.replace(
        _CFG, mesh=MeshConfig(embedding_sharding="gspmd_rows")
    )
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store,
                      mesh=mesh, log_fn=lambda s: None)
    result = trainer.train(tr, va[:256], corpus_eval=False)
    table = result.state.params["notice_tower"]["embeddings"]["table"]
    assert not table.sharding.is_fully_replicated
    shapes = {s.data.shape for s in table.addressable_shards}
    assert shapes == {(table.shape[0] // 8, table.shape[1])}


def test_mesh_trainer_auto_replicates_small_tables(tiny_dataset, split_ds):
    """The default 'auto' mode keeps small flagship-class tables replicated
    (cheaper than per-step row exchange; dense-grad kernel backward)."""
    ds = tiny_dataset
    tr, va = split_ds
    mesh = make_mesh(jax.devices()[:8])
    trainer = Trainer(_CFG, ds.schema, ds.notice_store, ds.company_store,
                      mesh=mesh, log_fn=lambda s: None)
    result = trainer.train(tr, va[:256], corpus_eval=False)
    table = result.state.params["notice_tower"]["embeddings"]["table"]
    assert table.sharding.is_fully_replicated
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]


def test_mesh_trainer_sparse_tables(tiny_dataset, split_ds):
    import dataclasses

    ds = tiny_dataset
    tr, va = split_ds
    cfg = dataclasses.replace(_CFG, sparse_tables=True)
    r = _train(ds, tr, va, mesh=make_mesh(jax.devices()[:8]), cfg=cfg)
    assert r.history[-1]["train_loss"] < r.history[0]["train_loss"]
    table = r.state.notice_table.table
    assert not table.sharding.is_fully_replicated


def test_mesh_trainer_checkpoint_resume(tiny_dataset, split_ds, tmp_path):
    ds = tiny_dataset
    tr, va = split_ds
    mesh = make_mesh(jax.devices()[:8])
    r1 = _train(ds, tr, va, mesh=mesh, checkpoint_dir=tmp_path / "ckpt")
    trainer2 = Trainer(_CFG, ds.schema, ds.notice_store, ds.company_store,
                       mesh=mesh, log_fn=lambda s: None)
    r2 = trainer2.train(tr, va[:256], checkpoint_dir=tmp_path / "ckpt",
                        resume=True, corpus_eval=False)
    # all epochs already done -> resume restores and runs 0 new epochs
    assert int(r2.state.step) == int(r1.state.step)
    np.testing.assert_allclose(
        np.asarray(r1.state.params["notice_tower"]["embeddings"]["table"]),
        np.asarray(r2.state.params["notice_tower"]["embeddings"]["table"]),
        rtol=1e-6,
    )


def test_sharded_corpus_eval_matches_single_device(rng):
    """Mesh rank counting == single-device, bit-for-bit (integer counts)."""
    from jodalrob_twotower_tpu.evaluation.evaluator import (
        corpus_retrieval_eval,
        sharded_corpus_retrieval_eval,
    )

    d = 16
    q = rng.normal(size=(50, d)).astype(np.float32)
    corpus = rng.normal(size=(1003, d)).astype(np.float32)  # pads unevenly
    pos = rng.integers(0, 1003, size=50)
    ref = corpus_retrieval_eval(q, corpus, pos, ks=(5, 50))
    mesh = make_mesh(jax.devices()[:8])
    sh = sharded_corpus_retrieval_eval(q, corpus, pos, mesh, ks=(5, 50))
    assert sh.corpus_size == 1003
    assert sh.recall == ref.recall
    assert abs(sh.mrr - ref.mrr) < 1e-12


def test_mesh_batch_divisibility_guard(tiny_dataset, split_ds):
    import dataclasses

    ds = tiny_dataset
    tr, va = split_ds
    cfg = dataclasses.replace(_CFG, data=DataConfig(batch_size=60))
    with pytest.raises(ValueError, match="divide"):
        _train(ds, tr, va, mesh=make_mesh(jax.devices()[:8]), cfg=cfg)
