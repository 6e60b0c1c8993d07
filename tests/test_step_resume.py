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
