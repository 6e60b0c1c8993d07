"""Mid-epoch (preemption-safe) checkpointing and exact resume.

The reference could only resume whole epochs (scripts/train.py:537-589).
Here `CheckpointConfig.save_every_steps` checkpoints the train state every N
steps with a double-buffered atomic-pointer write, and resume fast-forwards
the seeded epoch iterator to the exact batch — so a preempted run's final
weights are bit-identical to an uninterrupted run's."""

import json

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
from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
from jodalrob_twotower_tpu.train.checkpoint import CheckpointManager
from jodalrob_twotower_tpu.train.trainer import Trainer


def _cfg(**ckpt_kw):
    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.1,  # exercises the per-step dropout key fold
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(num_epochs=2),
        data=DataConfig(batch_size=64, test_split=0.2),
        checkpoint=CheckpointConfig(**ckpt_kw),
        results_csv="",
    )


@pytest.fixture()
def dataset():
    return make_synthetic_dataset(
        n_notices=400, n_companies=400, n_pairs=800, n_clusters=8, seed=3
    )


def _split(ds, cfg):
    rng = np.random.default_rng(cfg.data.shuffle_seed)
    perm = rng.permutation(len(ds.pairs))
    n_test = int(round(len(ds.pairs) * cfg.data.test_split))
    return ds.pairs[perm[n_test:]], ds.pairs[perm[:n_test]]


def test_preempted_run_resumes_bit_identical(dataset, tmp_path, monkeypatch):
    cfg = _cfg(save_every_steps=2)
    train_pairs, val_pairs = _split(dataset, cfg)

    # --- uninterrupted baseline ------------------------------------------
    base = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                   log_fn=lambda *_: None)
    base_res = base.train(train_pairs, val_pairs, checkpoint_dir=tmp_path / "base",
                          corpus_eval=False, n_inner=2)

    # --- run that dies right after its 2nd mid-epoch save (step 4) --------
    d = tmp_path / "preempted"
    orig_save = CheckpointManager.save_step
    calls = {"n": 0}

    def dying_save(self, state, epoch, batch_in_epoch):
        orig_save(self, state, epoch, batch_in_epoch)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")

    monkeypatch.setattr(CheckpointManager, "save_step", dying_save)
    t1 = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                 log_fn=lambda *_: None)
    with pytest.raises(KeyboardInterrupt):
        t1.train(train_pairs, val_pairs, checkpoint_dir=d, corpus_eval=False, n_inner=2)
    monkeypatch.setattr(CheckpointManager, "save_step", orig_save)

    meta = json.loads((d / "step.json").read_text())
    assert meta["step"] == 4 and meta["epoch"] == 0
    assert meta["batch"] == 4  # exact batches-consumed count, not derived
    assert (d / meta["dir"]).exists()

    # a preemption DURING an epoch save leaves an orbax tmp dir behind;
    # epoch parsing must skip it instead of crashing resume with ValueError
    (d / "epoch_1.orbax-checkpoint-tmp").mkdir()

    # --- resume completes the run ------------------------------------------
    logs: list[str] = []
    t2 = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                 log_fn=logs.append)
    res = t2.train(train_pairs, val_pairs, checkpoint_dir=d, resume=True,
                   corpus_eval=False, n_inner=2)
    assert any("resumed mid-epoch 0 at step 4" in l for l in logs), logs[:5]

    steps_per_epoch = len(train_pairs) // cfg.data.batch_size
    assert int(res.state.step) == steps_per_epoch * cfg.optimizer.num_epochs

    # the preempted+resumed run saw every batch exactly once, in the same
    # order, from the same restored state -> bit-identical final weights
    for k, v in base_res.final_val.items():
        np.testing.assert_allclose(res.final_val[k], v, rtol=1e-6, err_msg=k)


def test_completed_epoch_outranks_step_checkpoint(dataset, tmp_path):
    cfg = _cfg(save_every_steps=3)
    train_pairs, val_pairs = _split(dataset, cfg)
    d = tmp_path / "run"
    t = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                log_fn=lambda *_: None)
    t.train(train_pairs, val_pairs, checkpoint_dir=d, corpus_eval=False, n_inner=2)
    # the run completed: its last step.json is from the final epoch, which
    # also has an epoch checkpoint -> resume must use the epoch path and
    # train nothing further
    logs: list[str] = []
    t2 = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                 log_fn=logs.append)
    res = t2.train(train_pairs, val_pairs, checkpoint_dir=d, resume=True,
                   corpus_eval=False, n_inner=2)
    assert any("resumed from epoch 1" in l for l in logs)
    steps_per_epoch = len(train_pairs) // cfg.data.batch_size
    assert int(res.state.step) == steps_per_epoch * cfg.optimizer.num_epochs


def test_sparse_mode_preemption_resume(dataset, tmp_path, monkeypatch):
    """The O(batch) sparse-table path must survive preemption the same way:
    its SparseTrainState (tables + rowwise-Adagrad accumulators outside the
    dense param tree) round-trips through the step checkpoint and resume is
    bit-identical to an uninterrupted run."""
    cfg = _cfg(save_every_steps=2).replace(sparse_tables=True)
    train_pairs, val_pairs = _split(dataset, cfg)

    base = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                   log_fn=lambda *_: None)
    base_res = base.train(train_pairs, val_pairs, checkpoint_dir=tmp_path / "base",
                          corpus_eval=False, n_inner=2)

    d = tmp_path / "preempted"
    orig_save = CheckpointManager.save_step
    calls = {"n": 0}

    def dying_save(self, state, epoch, batch_in_epoch):
        orig_save(self, state, epoch, batch_in_epoch)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt("simulated preemption")

    monkeypatch.setattr(CheckpointManager, "save_step", dying_save)
    t1 = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                 log_fn=lambda *_: None)
    with pytest.raises(KeyboardInterrupt):
        t1.train(train_pairs, val_pairs, checkpoint_dir=d, corpus_eval=False, n_inner=2)
    monkeypatch.setattr(CheckpointManager, "save_step", orig_save)

    logs: list[str] = []
    t2 = Trainer(cfg, dataset.schema, dataset.notice_store, dataset.company_store,
                 log_fn=logs.append)
    res = t2.train(train_pairs, val_pairs, checkpoint_dir=d, resume=True,
                   corpus_eval=False, n_inner=2)
    assert any("resumed mid-epoch" in l for l in logs), logs[:5]
    for k, v in base_res.final_val.items():
        np.testing.assert_allclose(res.final_val[k], v, rtol=1e-6, err_msg=k)


def _leaves_bitwise_equal(a, b):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_cross_topology_restore_dense(dataset, tmp_path):
    """Elasticity (VERDICT r2 #6): an orbax checkpoint written on a mesh-8
    run restores bit-identically onto a single device and vice versa —
    orbax stores GLOBAL arrays, targets re-impose their own shardings."""
    import jax

    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_train import (
        make_sharded_indexed_train,
    )
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    cfg = _cfg().replace(
        optimizer=OptimizerConfig(num_epochs=1, learning_rate=3e-3)
    )
    train_pairs, val_pairs = _split(dataset, cfg)
    mesh = make_mesh(jax.devices()[:8])

    # --- mesh-8 train -> single-device restore -----------------------------
    t8 = Trainer(cfg, dataset.schema, dataset.notice_store,
                 dataset.company_store, mesh=mesh, log_fn=lambda *_: None)
    r8 = t8.train(train_pairs, val_pairs, checkpoint_dir=tmp_path / "m8",
                  corpus_eval=False)

    t1 = Trainer(cfg, dataset.schema, dataset.notice_store,
                 dataset.company_store, log_fn=lambda *_: None)
    example = assemble_pair_batch(
        dataset.notice_store, dataset.company_store, train_pairs[:64]
    )
    import jax.random

    target1, _ = create_train_state(
        t1.model, cfg, jax.random.PRNGKey(cfg.seed), example, 10
    )
    restored1 = CheckpointManager(tmp_path / "m8", cfg.checkpoint).restore(
        "final", target1
    )
    _leaves_bitwise_equal(restored1.params, r8.state.params)
    # eval on the restore topology agrees with the mesh run's numbers
    val1 = t1.validate(restored1, val_pairs)
    for k, v in r8.final_val.items():
        np.testing.assert_allclose(val1[k], v, rtol=1e-5, err_msg=k)

    # --- single-device train -> mesh-8 restore -----------------------------
    td = Trainer(cfg, dataset.schema, dataset.notice_store,
                 dataset.company_store, log_fn=lambda *_: None)
    rd = td.train(train_pairs, val_pairs, checkpoint_dir=tmp_path / "m1",
                  corpus_eval=False)
    target8, _, _, _, _, _ = make_sharded_indexed_train(
        t8.model, cfg, mesh, example, 10
    )
    restored8 = CheckpointManager(tmp_path / "m1", cfg.checkpoint).restore(
        "final", target8
    )
    _leaves_bitwise_equal(restored8.params, rd.state.params)
    # the restored state carries the mesh-8 target's shardings
    table = restored8.params["notice_tower"]["embeddings"]["table"]
    assert len(table.sharding.device_set) == 8
    val8 = t8.validate(restored8, val_pairs)
    for k, v in rd.final_val.items():
        np.testing.assert_allclose(val8[k], v, rtol=1e-5, err_msg=k)


def test_cross_topology_restore_sparse(dataset, tmp_path):
    """Same elasticity story for the sparse state: row-sharded SparseTables
    + rowwise-Adagrad accumulators restore across topologies bitwise."""
    import jax

    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.train.sparse_tables import (
        create_sparse_train_state,
    )

    cfg = _cfg().replace(
        sparse_tables=True,
        optimizer=OptimizerConfig(num_epochs=1, learning_rate=3e-3),
    )
    train_pairs, val_pairs = _split(dataset, cfg)
    mesh = make_mesh(jax.devices()[:8])

    t8 = Trainer(cfg, dataset.schema, dataset.notice_store,
                 dataset.company_store, mesh=mesh, log_fn=lambda *_: None)
    r8 = t8.train(train_pairs, val_pairs, checkpoint_dir=tmp_path / "m8",
                  corpus_eval=False, n_inner=2)

    t1 = Trainer(cfg, dataset.schema, dataset.notice_store,
                 dataset.company_store, log_fn=lambda *_: None)
    example = assemble_pair_batch(
        dataset.notice_store, dataset.company_store, train_pairs[:64]
    )
    target1, _ = create_sparse_train_state(
        t1.model, cfg, jax.random.PRNGKey(cfg.seed), example, 10
    )
    restored1 = CheckpointManager(tmp_path / "m8", cfg.checkpoint).restore(
        "final", target1
    )
    _leaves_bitwise_equal(restored1.notice_table, r8.state.notice_table)
    _leaves_bitwise_equal(restored1.company_table, r8.state.company_table)
    _leaves_bitwise_equal(restored1.dense_params, r8.state.dense_params)
    val1 = t1.validate(restored1, val_pairs)
    for k, v in r8.final_val.items():
        np.testing.assert_allclose(val1[k], v, rtol=1e-5, err_msg=k)
