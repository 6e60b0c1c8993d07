"""Sparse-table training step vs the standard dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
from jodalrob_twotower_tpu.models.embedding import absolute_rows, table_layout
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.schema import tiny_synthetic_schema
from jodalrob_twotower_tpu.train.sparse_tables import (
    SparseTable,
    create_sparse_train_state,
    make_sparse_train_step,
    merged_params,
    sparse_rowwise_adagrad_update,
)
from jodalrob_twotower_tpu.train.train_step import (
    create_train_state,
    device_store,
    make_eval_step,
    make_indexed_train_step,
)

_CFG = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=8,
        dense_projection_dim=16,
        tower_hidden_dims=(32, 16),
        final_embedding_dim=8,
        dropout_rate=0.0,
        use_batch_norm=False,
        compute_dtype="float32",
        embedding_grad="scatter",
    ),
    loss=LossConfig(temperature=0.2),
    optimizer=OptimizerConfig(learning_rate=1e-3, warmup_ratio=0.0),
)


def test_absolute_rows():
    rows = absolute_rows((50, 200), jnp.asarray([[0, 0], [49, 199], [100, 500]], jnp.int32))
    offsets, _ = table_layout((50, 200))
    np.testing.assert_array_equal(
        np.asarray(rows), [[0, 128], [49, 128 + 199], [49, 128 + 199]]
    )  # clamped then offset


def test_sparse_adagrad_update_exact_unique():
    st = SparseTable(table=jnp.ones((64, 4)), accumulator=jnp.full((64, 1), 0.1))
    rows = jnp.asarray([3, 10], jnp.int32)
    g = jnp.asarray([[1.0, 1, 1, 1], [2, 0, 0, 0]])
    out = sparse_rowwise_adagrad_update(st, rows, g, lr=0.5, eps=0.0)
    # acc[3] = 0.1 + mean(1) = 1.1; step = 0.5*1/sqrt(1.1)
    np.testing.assert_allclose(float(out.accumulator[3, 0]), 1.1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.table[3]), 1.0 - 0.5 / np.sqrt(1.1), rtol=1e-6
    )
    np.testing.assert_allclose(float(out.accumulator[10, 0]), 0.1 + 1.0, rtol=1e-6)
    # untouched rows unchanged
    np.testing.assert_array_equal(np.asarray(out.table[0]), np.ones(4))
    np.testing.assert_allclose(float(out.accumulator[0, 0]), 0.1)


def test_segment_sum_duplicates():
    from jodalrob_twotower_tpu.train.sparse_tables import segment_sum_duplicates

    rows = jnp.asarray([5, 3, 5, 5, 9, 3], jnp.int32)
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    urows, gsum = segment_sum_duplicates(rows, g, sentinel=64)
    urows, gsum = np.asarray(urows), np.asarray(gsum)
    got = {int(r): gsum[i].tolist() for i, r in enumerate(urows) if r != 64}
    assert got == {
        3: [2 + 10, 3 + 11],
        5: [0 + 4 + 6, 1 + 5 + 7],
        9: [8.0, 9.0],
    }
    # padding slots: sentinel row, zero grads
    pad = urows == 64
    assert pad.sum() == 3 and np.all(gsum[pad] == 0)


def test_segment_sum_duplicates_cumsum_branch(monkeypatch):
    """The deferred-window-scale prefix-sum implementation computes the
    same per-unique-row sums as the segment-sum scatter (to f32 rounding)."""
    import jodalrob_twotower_tpu.train.sparse_tables as st
    from jodalrob_twotower_tpu.train.sparse_tables import segment_sum_duplicates

    rng = np.random.default_rng(1)
    rows = jnp.asarray(rng.integers(0, 64, size=512), jnp.int32)
    g = jnp.asarray(rng.normal(size=(512, 8)), jnp.float32)
    u_ref, g_ref = segment_sum_duplicates(rows, g, sentinel=256)
    monkeypatch.setattr(st, "_DEDUP_CUMSUM_MIN_ROWS", 1)
    u_cs, g_cs = segment_sum_duplicates(rows, g, sentinel=256)
    np.testing.assert_array_equal(np.asarray(u_ref), np.asarray(u_cs))
    valid = np.asarray(u_ref) < 256
    np.testing.assert_allclose(
        np.asarray(g_cs)[valid], np.asarray(g_ref)[valid], rtol=2e-4, atol=1e-5
    )
    # against the dense scatter-add ground truth
    dense = np.zeros((64, 8), np.float32)
    np.add.at(dense, np.asarray(rows), np.asarray(g))
    np.testing.assert_allclose(
        np.asarray(g_cs)[valid], dense[np.asarray(u_cs)[valid]], rtol=2e-4, atol=1e-5
    )
    # documented contract: unused padding slots carry zero grads in BOTH
    # branches (the cumsum form must mask its cs-difference garbage)
    assert np.all(np.asarray(g_cs)[~valid] == 0.0)
    assert np.all(np.asarray(g_ref)[~valid] == 0.0)


def test_sparse_adagrad_update_exact_with_duplicates():
    """dedup=True on a duplicate-heavy batch == the dense rowwise-Adagrad
    applied to the summed gradient (the dense path's autodiff semantics,
    reference anchor: nn.Embedding backward, cat_embed.py:156-178)."""
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, 16, size=48), jnp.int32)  # heavy dups
    g = jnp.asarray(rng.normal(size=(48, 4)), jnp.float32)
    st = SparseTable(
        table=jnp.asarray(rng.normal(size=(64, 4)), jnp.float32),
        accumulator=jnp.full((64, 1), 0.1, jnp.float32),
    )
    out = sparse_rowwise_adagrad_update(st, rows, g, lr=0.5, eps=1e-10)

    # dense reference: scatter-summed gradient, acc += mean(G^2), one step
    G = np.zeros((64, 4), np.float32)
    np.add.at(G, np.asarray(rows), np.asarray(g))
    acc = 0.1 + (G**2).mean(axis=1, keepdims=True)
    table = np.asarray(st.table) - 0.5 * G / np.sqrt(acc + 1e-10)
    np.testing.assert_allclose(np.asarray(out.accumulator), acc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.table), table, rtol=1e-5, atol=1e-7)


def test_sparse_step_matches_dense_step_with_duplicates(tiny_dataset):
    """Full-step equality on a batch WITH duplicate ids (vocab 50 across a
    64-row batch guarantees collisions; repeated store rows add more)."""
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    pairs = np.stack(
        [np.arange(64) % 40, 64 + (np.arange(64) % 48)], axis=1
    )  # repeated rows on both sides
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, pairs)
    idx = jnp.asarray(pairs, jnp.int32)
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)
    # sanity: the batch really has duplicate absolute rows
    abs_rows = np.asarray(
        absolute_rows(ds.schema.notice.vocab_sizes, batch.notice.cat_ids)
    ).reshape(-1)
    assert len(np.unique(abs_rows)) < len(abs_rows)

    ref_state, ref_tx = create_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    ref_step = make_indexed_train_step(model, _CFG, ref_tx, donate=False)
    ref2, ref_metrics = ref_step(ref_state, idx, n_store, c_store)

    sp_state, sp_tx = create_sparse_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    sp_step = make_sparse_train_step(model, _CFG, sp_tx, 100, donate=False)
    sp2, sp_metrics = sp_step(sp_state, idx, n_store, c_store)

    np.testing.assert_allclose(
        float(sp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6
    )
    for side, tower in (
        ("notice_table", "notice_tower"),
        ("company_table", "company_tower"),
    ):
        np.testing.assert_allclose(
            np.asarray(getattr(sp2, side).table),
            np.asarray(ref2.params[tower]["embeddings"]["table"]),
            rtol=1e-5,
            atol=1e-7,
        )


@pytest.fixture(scope="module")
def unique_id_dataset():
    """Dataset whose categorical ids are all-distinct per feature within any
    64-row batch (vocab >= rows, ids = row index) so the per-occurrence
    sparse update is EXACTLY the dense rowwise update."""
    schema = tiny_synthetic_schema(n_categorical=3, vocab_size=512, n_numeric=6)
    ds = make_synthetic_dataset(
        schema, n_notices=512, n_companies=512, n_pairs=2048, n_clusters=16, seed=3
    )
    for store in (ds.notice_store, ds.company_store):
        store.cat_ids[:] = np.arange(512)[:, None]  # id == row, unique per batch
    return ds


def test_sparse_step_matches_dense_step(unique_id_dataset):
    ds = unique_id_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    # batch of distinct notice AND company rows -> duplicate-free ids
    pairs = np.stack([np.arange(64), np.arange(64, 128)], axis=1)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, pairs)
    idx = jnp.asarray(pairs, jnp.int32)
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)

    # dense reference: same init (same rng), rowwise adagrad on tables
    ref_state, ref_tx = create_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    ref_step = make_indexed_train_step(model, _CFG, ref_tx, donate=False)
    ref2, ref_metrics = ref_step(ref_state, idx, n_store, c_store)

    sp_state, sp_tx = create_sparse_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    sp_step = make_sparse_train_step(model, _CFG, sp_tx, 100, donate=False)
    sp2, sp_metrics = sp_step(sp_state, idx, n_store, c_store)

    np.testing.assert_allclose(
        float(sp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-6
    )
    # tables after one step identical (duplicate-free -> exact semantics)
    np.testing.assert_allclose(
        np.asarray(sp2.notice_table.table),
        np.asarray(ref2.params["notice_tower"]["embeddings"]["table"]),
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(sp2.company_table.table),
        np.asarray(ref2.params["company_tower"]["embeddings"]["table"]),
        rtol=1e-5,
        atol=1e-7,
    )
    # dense params identical too (same adamw + schedule)
    for a, b in zip(
        jax.tree.leaves(sp2.dense_params),
        jax.tree.leaves(
            {
                k: {kk: vv for kk, vv in v.items() if kk != "embeddings"}
                for k, v in ref2.params.items()
            }
        ),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_deferred_window_of_one_matches_per_step(unique_id_dataset):
    """make_deferred_sparse_steps(n_inner=1) == the per-step sparse path."""
    from jodalrob_twotower_tpu.train.sparse_tables import make_deferred_sparse_steps

    ds = unique_id_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    pairs = np.stack([np.arange(64), np.arange(64, 128)], axis=1)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, pairs)
    idx = jnp.asarray(pairs, jnp.int32)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)

    s1, tx1 = create_sparse_train_state(model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100)
    step1 = make_sparse_train_step(model, _CFG, tx1, 100, donate=False)
    s1, m1 = step1(s1, idx, n_store, c_store)

    s2, tx2 = create_sparse_train_state(model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100)
    deferred = make_deferred_sparse_steps(model, _CFG, tx2, 100, 1, donate=False)
    s2, m2 = deferred(s2, idx[None], n_store, c_store)

    np.testing.assert_allclose(float(m2["loss"][0]), float(m1["loss"]), rtol=1e-6)
    for side in ("notice_table", "company_table"):
        np.testing.assert_allclose(
            np.asarray(getattr(s2, side).table), np.asarray(getattr(s1, side).table),
            rtol=1e-6, atol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(getattr(s2, side).accumulator),
            np.asarray(getattr(s1, side).accumulator), rtol=1e-6,
        )


def test_sampled_deferred_matches_hostfed_deferred(tiny_dataset):
    """make_sampled_deferred_sparse_steps: the window's step-folded draws,
    replayed host-side through the host-fed deferred scan, give identical
    losses and tables — and the same key replays bitwise."""
    from jodalrob_twotower_tpu.train.sparse_tables import (
        make_deferred_sparse_steps,
        make_sampled_deferred_sparse_steps,
    )

    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    b, w = 64, 3
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    pairs_dev = jnp.asarray(ds.pairs.astype(np.int32))
    key = jax.random.PRNGKey(13)

    s1, tx1 = create_sparse_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    sampled = make_sampled_deferred_sparse_steps(
        model, _CFG, tx1, 100, w, b, donate=False
    )
    s1_out, m1 = sampled(s1, key, pairs_dev, n_store, c_store)
    assert int(s1_out.step) == w

    # replay the draws host-side through the host-fed deferred window
    s2, tx2 = create_sparse_train_state(
        model, _CFG, jax.random.PRNGKey(_CFG.seed), batch, 100
    )
    idx = np.stack([
        np.asarray(ds.pairs.astype(np.int32))[
            np.asarray(jax.random.randint(
                jax.random.fold_in(key, i), (b,), 0, len(ds.pairs)))
        ]
        for i in range(w)
    ])
    hostfed = make_deferred_sparse_steps(model, _CFG, tx2, 100, w, donate=False)
    s2_out, m2 = hostfed(s2, jnp.asarray(idx), n_store, c_store)

    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(m2["loss"]), rtol=1e-6
    )
    for side in ("notice_table", "company_table"):
        np.testing.assert_allclose(
            np.asarray(getattr(s1_out, side).table),
            np.asarray(getattr(s2_out, side).table),
            rtol=1e-6, atol=1e-7,
        )
    # determinism
    _, m3 = sampled(s1, key, pairs_dev, n_store, c_store)
    np.testing.assert_array_equal(np.asarray(m1["loss"]), np.asarray(m3["loss"]))


def test_sharded_sampled_deferred_runs(tiny_dataset):
    """Mesh variant: make_sharded_sampled_sparse(defer_updates=True)
    runs on the 8-device mesh, advances, and stays finite."""
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_sparse import (
        make_sharded_sampled_sparse,
        make_sharded_sparse_train,
    )

    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    b, w = 64, 2
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    mesh = make_mesh(jax.devices()[:8])
    state, _, _, put_store = make_sharded_sparse_train(model, _CFG, mesh, batch, 100)
    steps, put_pairs = make_sharded_sampled_sparse(
        model, _CFG, mesh, state, w, b, 100, defer_updates=True
    )
    n_store = put_store(device_store(ds.notice_store))
    c_store = put_store(device_store(ds.company_store))
    state, m = steps(
        state, jax.random.PRNGKey(3), put_pairs(ds.pairs.astype(np.int32)),
        n_store, c_store,
    )
    assert int(state.step) == w
    assert np.all(np.isfinite(np.asarray(m["loss"])))


def test_deferred_updates_learn(tiny_dataset):
    """Windowed (stale-within-window) table updates still learn the planted
    clusters; tables actually change once per window."""
    import dataclasses

    from jodalrob_twotower_tpu.train.sparse_tables import make_deferred_sparse_steps

    ds = tiny_dataset
    cfg = dataclasses.replace(
        _CFG, optimizer=OptimizerConfig(learning_rate=3e-3, warmup_ratio=0.0)
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    b, n_inner = 64, 4
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:b])
    state, tx = create_sparse_train_state(model, cfg, jax.random.PRNGKey(0), batch, 400)
    steps = make_deferred_sparse_steps(model, cfg, tx, 400, n_inner, donate=False)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    rng = np.random.default_rng(0)
    init_table = np.asarray(state.notice_table.table).copy()
    losses = []
    for d in range(20):
        idx = ds.pairs[rng.integers(0, len(ds.pairs), size=(n_inner, b))].astype(np.int32)
        state, m = steps(state, jnp.asarray(idx), n_store, c_store)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert int(state.step) == 20 * n_inner
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) - 0.3
    assert np.any(np.asarray(state.notice_table.table) != init_table)


def test_sparse_training_learns_and_merges(tiny_dataset):
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    tr, va = ds.split(0.2, seed=0)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:64])
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)
    state, tx = create_sparse_train_state(model, _CFG, jax.random.PRNGKey(0), batch, 200)
    step = make_sparse_train_step(model, _CFG, tx, 200, donate=False)
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(100):
        idx = jnp.asarray(tr[rng.integers(0, len(tr), 64)], jnp.int32)
        state, m = step(state, idx, n_store, c_store)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.8

    # merged params drive the standard eval path
    from jodalrob_twotower_tpu.train.train_step import TrainState

    eval_state = TrainState(
        step=state.step,
        params=merged_params(state),
        batch_stats=state.batch_stats,
        opt_state=None,
        rng=state.rng,
    )
    eval_step = make_eval_step(model, _CFG)
    val_batch = assemble_pair_batch(ds.notice_store, ds.company_store, va[:64])
    metrics = eval_step(eval_state, val_batch)
    assert float(metrics["accuracy"]) > 3.0 / 64


def test_trainer_sparse_deferred_end_to_end(tiny_dataset, tmp_path):
    """Trainer with sparse_defer_updates=True (one table update per scan
    window) still learns the planted clusters."""
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    cfg = _CFG.replace(
        sparse_tables=True,
        sparse_defer_updates=True,
        results_csv=str(tmp_path / "results.csv"),
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=3),
    )
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va[:256], corpus_eval=False, n_inner=4)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert result.final_val["accuracy"] > 3.0 / 64
    # tables actually moved (deferred updates were applied)
    init = np.zeros_like(np.asarray(result.state.notice_table.table))
    assert np.any(np.asarray(result.state.notice_table.table) != init)


def test_sparse_state_checkpoint_roundtrip(tiny_dataset, tmp_path):
    """SparseTrainState is a pytree: orbax save/restore preserves it."""
    import orbax.checkpoint as ocp

    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:32])
    state, tx = create_sparse_train_state(model, _CFG, jax.random.PRNGKey(0), batch, 10)
    step = make_sparse_train_step(model, _CFG, tx, 10, donate=False)
    n_store = device_store(ds.notice_store)
    c_store = device_store(ds.company_store)
    state, _ = step(state, jnp.asarray(ds.pairs[:32], jnp.int32), n_store, c_store)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp_path / "sparse").absolute(), state)
    ckptr.wait_until_finished()
    fresh, _ = create_sparse_train_state(model, _CFG, jax.random.PRNGKey(9), batch, 10)
    restored = ckptr.restore((tmp_path / "sparse").absolute(), fresh)
    np.testing.assert_array_equal(
        np.asarray(restored.notice_table.table), np.asarray(state.notice_table.table)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.notice_table.accumulator),
        np.asarray(state.notice_table.accumulator),
    )
    assert int(restored.step) == 1


def test_trainer_sparse_tables_end_to_end(tiny_dataset, tmp_path):
    """The production Trainer drives the sparse path via the config flag."""
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    cfg = _CFG.replace(
        sparse_tables=True,
        results_csv=str(tmp_path / "results.csv"),
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=3),
    )
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    tr, va = ds.split(0.2, seed=0)
    result = trainer.train(tr, va[:256], checkpoint_dir=tmp_path / "ckpt", corpus_eval=True)
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert result.final_val["accuracy"] > 3.0 / 64
    assert result.corpus is not None and result.corpus.recall[100] > 0.3
    # checkpoints written, incl weights-only export with merged tables
    assert (tmp_path / "ckpt" / "final").exists()
    assert (tmp_path / "ckpt" / "weights").exists()
    # resume restores the sparse state structure
    cfg2 = cfg.replace(optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=4))
    trainer2 = Trainer(cfg2, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    r2 = trainer2.train(tr, va[:256], checkpoint_dir=tmp_path / "ckpt", resume=True, corpus_eval=False)
    assert [h["epoch"] for h in r2.history] == [3]
