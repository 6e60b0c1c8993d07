"""Row-sharded feature stores (parallel/sharded_store.py): the explicit
all-gather-ids -> psum_scatter-rows exchange must be exactly a gather, and
training with store_sharding="rows" must equal the replicated-store mode —
the reference's features-too-large-for-memory capability
(unified_bid_data_loader.py:408-456) at TPU scale (VERDICT r2 #2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.parallel.mesh import make_mesh
from jodalrob_twotower_tpu.parallel.sharded_store import (
    make_store_gather,
    pad_rows_to,
    put_row_sharded_store,
)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(jax.devices()[:8])


def test_pad_rows_to():
    m = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    p = pad_rows_to(m, 8)
    assert p.shape == (16, 3)
    np.testing.assert_array_equal(p[:10], m)
    assert np.all(p[10:] == 0)
    assert pad_rows_to(m, 5) is m  # already a multiple: no copy


@pytest.mark.parametrize("dtype", [np.float32, np.int32])
def test_store_gather_exact(mesh8, rng, dtype):
    """The exchange == plain jnp.take, for float (dense) and int (cat id)
    matrices, including rows owned by every shard."""
    n, d, b = 64, 8, 32
    if dtype == np.float32:
        mat = rng.normal(size=(n, d)).astype(dtype)
    else:
        mat = rng.integers(0, 1000, size=(n, d)).astype(dtype)
    rows = rng.integers(0, n, size=(b,)).astype(np.int32)
    gather = make_store_gather(mesh8)
    sharded = put_row_sharded_store((mat,), mesh8)[0]
    got = jax.jit(gather)(sharded, jnp.asarray(rows))
    np.testing.assert_array_equal(np.asarray(got), mat[rows])


def test_store_gather_rejects_ragged(mesh8, rng):
    gather = make_store_gather(mesh8)
    mat = jnp.zeros((60, 8))  # 60 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        gather(mat, jnp.zeros((32,), jnp.int32))


def _cfg(**mesh_kwargs):
    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.5),
        optimizer=OptimizerConfig(learning_rate=1e-2),
        data=DataConfig(batch_size=64),
        mesh=MeshConfig(**mesh_kwargs),
        results_csv="",
    )


def test_sharded_indexed_train_rows_equals_replicated(tiny_dataset, mesh8):
    """One sharded indexed train step with store_sharding='rows' produces
    the same loss and updated params as the replicated-store mode (and the
    store really is padded + row-sharded on the mesh)."""
    from jodalrob_twotower_tpu.parallel.sharded_train import (
        make_sharded_indexed_train,
    )

    ds = tiny_dataset
    idx = ds.pairs[:64].astype(np.int32)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, idx)

    results = {}
    for mode in ("replicated", "rows"):
        cfg = _cfg(store_sharding=mode)
        model = TwoTowerModel(ds.schema, cfg.model)
        state, tx, scan_steps, single_step, put_idx, put_store = (
            make_sharded_indexed_train(model, cfg, mesh8, example, 10)
        )
        n_store = put_store((ds.notice_store.dense, ds.notice_store.cat_ids))
        c_store = put_store((ds.company_store.dense, ds.company_store.cat_ids))
        if mode == "rows":
            # padded to the axis multiple and actually sharded by rows
            assert n_store[0].shape[0] % 8 == 0
            assert not n_store[0].sharding.is_fully_replicated
        else:
            assert n_store[0].sharding.is_fully_replicated
        state, metrics = single_step(state, put_idx(idx), n_store, c_store)
        results[mode] = (
            float(metrics["loss"]),
            jax.device_get(state.params),
        )

    l_rep, p_rep = results["replicated"]
    l_rows, p_rows = results["rows"]
    assert l_rows == pytest.approx(l_rep, rel=1e-6)
    for a, b in zip(jax.tree.leaves(p_rep), jax.tree.leaves(p_rows)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_sharded_sparse_train_rows_equals_replicated(tiny_dataset, mesh8):
    """Sparse O(batch) path under store_sharding='rows' == replicated."""
    from jodalrob_twotower_tpu.parallel.sharded_sparse import (
        make_sharded_sparse_train,
    )

    ds = tiny_dataset
    idx = ds.pairs[:64].astype(np.int32)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, idx)

    losses = {}
    for mode in ("replicated", "rows"):
        cfg = dataclasses.replace(_cfg(store_sharding=mode), sparse_tables=True)
        model = TwoTowerModel(ds.schema, cfg.model)
        state, step, put_batch, put_store = make_sharded_sparse_train(
            model, cfg, mesh8, example, 10, with_metrics=True
        )
        n_store = put_store((ds.notice_store.dense, ds.notice_store.cat_ids))
        c_store = put_store((ds.company_store.dense, ds.company_store.cat_ids))
        state, metrics = step(state, put_batch(idx), n_store, c_store)
        losses[mode] = float(metrics["loss"])

    assert losses["rows"] == pytest.approx(losses["replicated"], rel=1e-6)


def test_device_eval_rows_store_matches_host(tiny_dataset):
    """Device-resident eval over ROW-SHARDED stores (VERDICT r3 #4): the
    explicit-exchange eval path and corpus encoding from the sharded store
    equal the host-assembled paths — the 363x eval win now holds on the
    very runs whose stores were too big to replicate."""
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    cfg = dataclasses.replace(
        _cfg(store_sharding="rows"),
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=1),
    )
    b = cfg.data.batch_size
    va = va[: (len(va) // b) * b]  # same batch set on both paths
    mesh = make_mesh(jax.devices()[:8])
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store,
        mesh=mesh, log_fn=lambda s: None,
    )
    result = trainer.train(tr, va, corpus_eval=False)
    state = result.state

    assert trainer._eval_store_gather is not None  # rows mode -> exchange
    dev = trainer.validate(state, va)
    corpus_dev = trainer.corpus_eval(state, va)
    # force the host-assembled path and compare
    trainer._dev_stores = None
    host = trainer.validate(state, va)
    corpus_host = trainer.corpus_eval(state, va)

    for k in ("loss", "accuracy", "mrr", "similarity_gap", "z_gap"):
        np.testing.assert_allclose(dev[k], host[k], rtol=1e-4, atol=1e-6)
    assert corpus_dev.recall == corpus_host.recall
    np.testing.assert_allclose(corpus_dev.mrr, corpus_host.mrr, rtol=1e-5)


def test_prepare_device_eval_mesh_rows(tiny_dataset):
    """Standalone eval entry (no prior train): prepare_device_eval places
    row-sharded stores and validate() runs the exchange path."""
    from jodalrob_twotower_tpu.train.train_step import create_train_state
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    cfg = _cfg(store_sharding="rows")
    b = cfg.data.batch_size
    va = va[: (len(va) // b) * b]
    mesh = make_mesh(jax.devices()[:8])
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store,
        mesh=mesh, log_fn=lambda s: None,
    )
    trainer.prepare_device_eval()
    assert not trainer._dev_stores[0][0].sharding.is_fully_replicated
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:b])
    state, _ = create_train_state(
        trainer.model, cfg, jax.random.PRNGKey(0), example, 10
    )
    from jodalrob_twotower_tpu.parallel.mesh import replicated

    state = jax.device_put(
        state, jax.tree.map(lambda _: replicated(mesh), state)
    )
    dev = trainer.validate(state, va)
    trainer._dev_stores = None
    host = trainer.validate(state, va)
    np.testing.assert_allclose(dev["loss"], host["loss"], rtol=1e-4)
    np.testing.assert_allclose(dev["accuracy"], host["accuracy"], atol=1e-6)


def test_device_encode_rows_chunk_not_multiple(tiny_dataset):
    """encode_corpus_device over a rows-sharded store rounds a chunk that
    does not divide the mesh axis DOWN to a multiple instead of tripping
    the exchange's divisibility error (review pass 2, finding 5)."""
    import jax.numpy as jnp

    from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        make_tower_batch_gather,
        put_row_sharded_store,
    )
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    ds = tiny_dataset
    cfg = _cfg(store_sharding="rows")
    mesh = make_mesh(jax.devices()[:8])
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:32])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), example, 10)
    from jodalrob_twotower_tpu.parallel.mesh import replicated

    state = jax.device_put(state, jax.tree.map(lambda _: replicated(mesh), state))
    gather = make_tower_batch_gather(mesh)
    assert gather.batch_multiple == 8
    store = put_row_sharded_store(
        (np.asarray(ds.company_store.dense), np.asarray(ds.company_store.cat_ids)),
        mesh,
    )
    ev = Evaluator(model, cfg)
    n = len(ds.company_store)
    # chunk=100 does not divide 8 -> rounds to 96; result must equal the
    # host-side whole-store encode
    emb = ev.encode_corpus_device(
        state, store, n, side="company", chunk=100, store_gather=gather
    )
    ref = ev.encode_corpus(
        state, ds.company_store.dense, ds.company_store.cat_ids, side="company"
    )
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    # batch_size not a multiple of the axis: loud error from evaluate_indexed
    with pytest.raises(ValueError, match="multiple"):
        ev.evaluate_indexed(
            state, ds.pairs[:300], store, store, batch_size=30,
            store_gather=gather,
        )


def test_trainer_rejects_compressed_plus_forced_onehot(tiny_dataset):
    """grad_compression + embedding_lookup='onehot' is a documented dead
    end (the compressed shard_map installs no mesh lookup_fn): loud error
    up front instead of a misleading failure at trace time."""
    import dataclasses as dc

    from jodalrob_twotower_tpu.config import MeshConfig, ModelConfig
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    cfg = _cfg()
    cfg = cfg.replace(
        model=dc.replace(cfg.model, embedding_lookup="onehot"),
        mesh=MeshConfig(grad_compression="int16"),
    )
    tr, va = ds.split(0.2, seed=0)
    trainer = Trainer(
        cfg, ds.schema, ds.notice_store, ds.company_store,
        mesh=make_mesh(jax.devices()[:8]), log_fn=lambda s: None,
    )
    with pytest.raises(ValueError, match="embedding_lookup"):
        trainer.train(tr, va[:256], corpus_eval=False)


def test_trainer_mesh_rows_mode(tiny_dataset, tmp_path):
    """Full Trainer epoch loop over the mesh with row-sharded stores: runs,
    learns, and matches the replicated-mode loss trajectory closely."""
    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    hist = {}
    for mode in ("replicated", "rows"):
        cfg = dataclasses.replace(
            _cfg(store_sharding=mode),
            optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=1),
        )
        mesh = make_mesh(jax.devices()[:8])
        trainer = Trainer(
            cfg, ds.schema, ds.notice_store, ds.company_store,
            mesh=mesh, log_fn=lambda s: None,
        )
        result = trainer.train(tr, va, corpus_eval=False)
        hist[mode] = result.history[-1]["train_loss"]
    assert hist["rows"] == pytest.approx(hist["replicated"], rel=1e-4)


def test_indexed_eval_sharded_batch_uses_xla_loss(tiny_dataset, mesh8, monkeypatch):
    """With a rows-sharded store the eval batch comes out of the cross-shard
    exchange SHARDED on the data axis; the single-device fused Pallas
    CE/stats kernels cannot receive partitioned operands under GSPMD
    (ADVICE r4, medium). make_indexed_eval_steps must therefore build its
    eval core on the XLA materialized path even when use_fused_logits is
    forced True — asserted by poisoning the fused entry points."""
    import jodalrob_twotower_tpu.ops.fused_logits as fl
    from jodalrob_twotower_tpu.evaluation.evaluator import Evaluator
    from jodalrob_twotower_tpu.parallel.mesh import put_replicated, replicated
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        make_tower_batch_gather,
        put_row_sharded_store,
    )
    from jodalrob_twotower_tpu.train.train_step import create_train_state

    ds = tiny_dataset
    cfg = dataclasses.replace(
        _cfg(store_sharding="rows"),
        loss=LossConfig(temperature=0.5, use_fused_logits=True),
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), example, 10)
    state = jax.device_put(state, jax.tree.map(lambda _: replicated(mesh8), state))

    def _boom(*a, **k):
        raise AssertionError("fused Pallas kernel reached with a mesh-sharded eval batch")

    monkeypatch.setattr(fl, "fused_bidirectional_ce", _boom)
    monkeypatch.setattr(fl, "fused_in_batch_metrics", _boom)

    gather = make_tower_batch_gather(mesh8)
    n_store = put_row_sharded_store(
        (np.asarray(ds.notice_store.dense), np.asarray(ds.notice_store.cat_ids)), mesh8
    )
    c_store = put_row_sharded_store(
        (np.asarray(ds.company_store.dense), np.asarray(ds.company_store.cat_ids)), mesh8
    )
    ev = Evaluator(model, cfg)
    out = ev.evaluate_indexed(
        state, ds.pairs[:256], n_store, c_store, batch_size=64,
        put_idx=lambda x: put_replicated(x, mesh8),
        store_gather=gather,
    )
    assert np.isfinite(out["loss"])
    assert "accuracy" in out and "z_gap" in out
