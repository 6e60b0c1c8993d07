"""Compressed gradient all-reduce with error feedback
(parallel/compressed_grads.py; paper anchor PAPERS.md arxiv 2407.04272)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch, epoch_batches
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.parallel.compressed_grads import (
    compressed_psum_leaf,
    make_dp_compressed_train_step,
)
from jodalrob_twotower_tpu.parallel.mesh import make_mesh
from jodalrob_twotower_tpu.train.optimizer import build_optimizer


def _mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _sync(gs, errs, method):
    """Run one compressed sync across 8 shards; gs/errs [8, ...]."""
    mesh = _mesh8()

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P("data")), check_vma=False,
    )
    def run(g, e):
        total, new_e = compressed_psum_leaf(g[0], e[0], "data", method)
        return total, new_e[None]

    return run(jnp.asarray(gs), jnp.asarray(errs))


@pytest.mark.parametrize("method", ["none", "int16", "bf16"])
def test_compressed_psum_close_to_exact(rng, method):
    gs = rng.normal(size=(8, 64)).astype(np.float32)
    errs = np.zeros_like(gs)
    total, new_e = _sync(gs, errs, method)
    exact = gs.sum(axis=0)
    tol = {"none": 1e-6, "int16": 8 * np.abs(gs).max() / 127 / 2 + 1e-6,
           "bf16": 0.05}[method]
    np.testing.assert_allclose(np.asarray(total), exact, atol=tol)
    if method == "none":
        assert np.all(np.asarray(new_e) == 0)
    elif method == "int16":
        # residuals carry exactly what the wire dropped: sum(residuals) +
        # synced total reconstructs the exact sum (int16 reduction is exact
        # given the quantization, so only per-worker rounding remains)
        np.testing.assert_allclose(
            np.asarray(new_e).sum(axis=0) + np.asarray(total), exact, atol=1e-5
        )


def test_int16_error_feedback_is_unbiased(rng):
    """A gradient far below the quantization granularity must NOT be lost:
    with error feedback the T-step total of synced grads approaches T x the
    exact sum (the residual carries what each step dropped)."""
    # one large component sets the scale; the small ones sit below half a
    # quantization step and would round to zero forever without feedback
    g = np.full((8, 64), 1e-4, np.float32)
    g[:, 0] = 1.0  # scale = 1/127 => granularity 7.9e-3 >> 1e-4
    errs = np.zeros_like(g)
    T = 200
    acc = np.zeros(64, np.float32)
    for _ in range(T):
        total, errs = _sync(g, errs, "int16")
        acc += np.asarray(total)
    exact_total = T * g.sum(axis=0)
    # small components: recovered to within one quantization step per worker
    np.testing.assert_allclose(acc[1:], exact_total[1:], rtol=0.02,
                               atol=8 * (1.0 / 127))
    np.testing.assert_allclose(acc[0], exact_total[0], rtol=1e-3)

    # control: WITHOUT feedback the small components are lost entirely
    lost = np.zeros(64, np.float32)
    for _ in range(T):
        total, _ = _sync(g, np.zeros_like(g), "int16")
        lost += np.asarray(total)
    assert abs(lost[1]) < 1e-6  # rounded to zero every step


@pytest.mark.parametrize("method", ["int16", "bf16"])
def test_dp_compressed_training_learns(tiny_dataset, method):
    """The shard_mapped DP step with compressed sync trains to within a few
    percent of the uncompressed control on the planted-cluster data."""
    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(learning_rate=3e-3),
        data=DataConfig(batch_size=128),
        results_csv="",
    )
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])
    tx = build_optimizer(cfg.optimizer, 100)

    finals = {}
    for m in (method, "none"):
        state, err, step, put_batch = make_dp_compressed_train_step(
            model, cfg, tx, mesh, example, 100, method=m
        )
        losses = []
        for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=1)):
            batch = put_batch(
                assemble_pair_batch(ds.notice_store, ds.company_store, idx)
            )
            state, err, metrics = step(state, err, batch)
            losses.append(float(metrics["loss"]))
            if i >= 19:
                break
        finals[m] = losses

    assert finals[method][-1] < finals[method][0]  # it learns
    # compressed endpoint within a few percent of the exact-sync control
    assert finals[method][-1] == pytest.approx(finals["none"][-1], rel=0.05)


def test_dp_compressed_rejects_bad_method(tiny_dataset):
    ds = tiny_dataset
    cfg = TrainConfig(results_csv="")
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(
        ds.notice_store, ds.company_store, ds.pairs[:64]
    )
    with pytest.raises(ValueError, match="method"):
        make_dp_compressed_train_step(
            model, cfg, build_optimizer(cfg.optimizer, 10),
            make_mesh(jax.devices()[:8]), example, 10, method="int4",
        )


def test_int16_rejects_too_many_workers(tiny_dataset):
    """int16 psum exactness holds only to 256 workers; beyond it the sum
    would wrap silently — the builder must refuse."""
    import types

    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch

    ds = tiny_dataset
    cfg = TrainConfig(results_csv="")
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel

    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store,
                                  ds.pairs[:512])
    fake_mesh = types.SimpleNamespace(shape={"data": 512})
    with pytest.raises(ValueError, match="256 workers"):
        make_dp_compressed_train_step(
            model, cfg, build_optimizer(cfg.optimizer, 10),
            fake_mesh, example, 10, method="int16",
        )


def _small_cfg(**mesh_kw):
    from jodalrob_twotower_tpu.config import MeshConfig

    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2, use_fused_logits=False),
        optimizer=OptimizerConfig(learning_rate=3e-3),
        data=DataConfig(batch_size=128),
        mesh=MeshConfig(**mesh_kw),
        results_csv="",
    )


def _stores(ds, put):
    n = put((np.asarray(ds.notice_store.dense), np.asarray(ds.notice_store.cat_ids)))
    c = put((np.asarray(ds.company_store.dense), np.asarray(ds.company_store.cat_ids)))
    return n, c


def test_dp_compressed_indexed_matches_full_batch(tiny_dataset):
    """The indexed production step (device stores + [B, 2] indices —
    parallel/compressed_grads.make_dp_compressed_indexed_train) runs the
    SAME math as the full-batch compressed step: per-step losses match."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )

    ds = tiny_dataset
    cfg = _small_cfg()
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])
    tx = build_optimizer(cfg.optimizer, 100)

    state_f, err_f, step_f, put_batch = make_dp_compressed_train_step(
        model, cfg, tx, mesh, example, 100, method="int16"
    )
    cdp = make_dp_compressed_indexed_train(
        model, cfg, mesh, example, 100, method="int16"
    )
    n_store, c_store = _stores(ds, cdp.put_store)
    state_i, err_i = cdp.state, cdp.err_state

    losses_f, losses_i = [], []
    for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=3)):
        batch = put_batch(
            assemble_pair_batch(ds.notice_store, ds.company_store, idx)
        )
        state_f, err_f, m_f = step_f(state_f, err_f, batch)
        state_i, err_i, m_i = cdp.single_step(
            state_i, err_i, cdp.put_idx(idx.astype(np.int32)), n_store, c_store
        )
        losses_f.append(float(m_f["loss"]))
        losses_i.append(float(m_i["loss"]))
        if i >= 4:
            break
    np.testing.assert_allclose(losses_i, losses_f, rtol=1e-5)
    # the single step also surfaces the per-shard in-batch metric set
    for key in ("accuracy", "mrr", "similarity_gap", "z_gap"):
        assert key in m_i and np.isfinite(float(m_i[key]))


def test_dp_compressed_scan_matches_singles(tiny_dataset):
    """One n_inner=2 scanned dispatch == two single dispatches."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )

    ds = tiny_dataset
    cfg = _small_cfg()
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])

    idx0 = tr[:128].astype(np.int32)
    idx1 = tr[128:256].astype(np.int32)

    a = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100, method="int16")
    n_store, c_store = _stores(ds, a.put_store)
    st, er = a.state, a.err_state
    st, er, m0 = a.single_step(st, er, a.put_idx(idx0), n_store, c_store)
    st, er, m1 = a.single_step(st, er, a.put_idx(idx1), n_store, c_store)

    b = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100, method="int16")
    n_store2, c_store2 = _stores(ds, b.put_store)
    stack = b.put_idx(np.stack([idx0, idx1]))
    st2, er2, m = b.scan_steps(b.state, b.err_state, stack, n_store2, c_store2)

    np.testing.assert_allclose(
        np.asarray(m["loss"]),
        [float(m0["loss"]), float(m1["loss"])],
        rtol=1e-5,
    )
    for l1, l2 in zip(jax.tree.leaves(st.params), jax.tree.leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_dp_compressed_sampled_steps(tiny_dataset):
    """On-device sampling in compressed mode: one key per dispatch, each
    shard draws its local batch; steps advance and losses are finite."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )
    from jodalrob_twotower_tpu.parallel.mesh import replicated

    ds = tiny_dataset
    cfg = _small_cfg()
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])

    cdp = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100, method="int16")
    n_store, c_store = _stores(ds, cdp.put_store)
    pairs_dev = jax.device_put(tr.astype(np.int32), replicated(mesh))
    steps = cdp.make_sampled(3)
    key = jax.random.PRNGKey(7)
    st, er, m = steps(cdp.state, cdp.err_state, key, pairs_dev, n_store, c_store)
    assert int(st.step) == 3
    losses = np.asarray(m["loss"])
    assert losses.shape == (3,) and np.all(np.isfinite(losses))
    # replayable: same key + fresh state -> identical draws and losses
    cdp2 = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100, method="int16")
    n2, c2 = _stores(ds, cdp2.put_store)
    _, _, m2 = cdp2.make_sampled(3)(cdp2.state, cdp2.err_state, key, pairs_dev, n2, c2)
    np.testing.assert_allclose(losses, np.asarray(m2["loss"]), rtol=1e-6)


def test_trainer_grad_compression_e2e(tiny_dataset):
    """MeshConfig.grad_compression drives the Trainer end-to-end: trains,
    learns, validates; sampled mode works; bad combos rejected."""
    import dataclasses as dc

    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    mesh = make_mesh(jax.devices()[:8])

    cfg = _small_cfg(grad_compression="int16")
    cfg = cfg.replace(optimizer=dc.replace(cfg.optimizer, num_epochs=2))
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store,
                      mesh=mesh, log_fn=lambda s: None)
    r = trainer.train(tr, va[:256], corpus_eval=False)
    assert r.history[-1]["train_loss"] < r.history[0]["train_loss"]
    assert np.isfinite(r.final_val["loss"])

    # sampled-on-device x compression
    cfg_s = cfg.replace(data=dc.replace(cfg.data, sample_on_device=True))
    trainer_s = Trainer(cfg_s, ds.schema, ds.notice_store, ds.company_store,
                        mesh=mesh, log_fn=lambda s: None)
    r_s = trainer_s.train(tr, va[:256], corpus_eval=False)
    assert r_s.history[-1]["train_loss"] < r_s.history[0]["train_loss"]

    # rejected combinations (sparse_tables itself now COMPOSES — see
    # test_trainer_compressed_sparse_e2e; only windowed deferral doesn't)
    cfg_sp = cfg.replace(sparse_tables=True, sparse_defer_updates=True)
    with pytest.raises(ValueError, match="defer"):
        Trainer(cfg_sp, ds.schema, ds.notice_store, ds.company_store,
                mesh=mesh, log_fn=lambda s: None).train(
            tr, va[:256], corpus_eval=False)
    cfg_rows = cfg.replace(mesh=dc.replace(cfg.mesh, store_sharding="rows"))
    with pytest.raises(ValueError, match="replicated"):
        Trainer(cfg_rows, ds.schema, ds.notice_store, ds.company_store,
                mesh=mesh, log_fn=lambda s: None).train(
            tr, va[:256], corpus_eval=False)


def test_grad_compression_config_validation():
    from jodalrob_twotower_tpu.config import MeshConfig

    assert MeshConfig().grad_compression == "none"
    MeshConfig(grad_compression="bf16")
    with pytest.raises(ValueError, match="grad_compression"):
        MeshConfig(grad_compression="fp8")


def test_dp_compressed_with_batchnorm_and_dropout(tiny_dataset):
    """BN running stats pmean across shards + per-shard dropout keys: the
    step runs, learns, and batch_stats stay replicated-consistent."""
    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.2, use_batch_norm=True, compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(learning_rate=3e-3),
        data=DataConfig(batch_size=128),
        results_csv="",
    )
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])
    tx = build_optimizer(cfg.optimizer, 100)
    state, err, step, put_batch = make_dp_compressed_train_step(
        model, cfg, tx, mesh, example, 100, method="int16"
    )
    losses = []
    for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=2)):
        batch = put_batch(
            assemble_pair_batch(ds.notice_store, ds.company_store, idx)
        )
        state, err, metrics = step(state, err, batch)
        losses.append(float(metrics["loss"]))
        if i >= 11:
            break
    assert losses[-1] < losses[0]
    assert all(np.isfinite(l) for l in losses)
    # batch_stats came back replicated (out_specs P()) and finite
    for leaf in jax.tree.leaves(state.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))


# ---------------------------------------------------------------------------
# round 5: global negatives under compression + sparse-table composition
# ---------------------------------------------------------------------------


def _nobn_cfg(**mesh_kw):
    """Exact-equality config: no BN (per-shard vs global batch statistics
    differ by construction), no dropout, f32."""
    from jodalrob_twotower_tpu.config import MeshConfig

    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, use_batch_norm=False, compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2, use_fused_logits=False),
        optimizer=OptimizerConfig(learning_rate=3e-3),
        data=DataConfig(batch_size=128),
        mesh=MeshConfig(**mesh_kw),
        results_csv="",
    )


def test_compressed_global_negatives_matches_gspmd(tiny_dataset):
    """compressed_negatives='global' with method='none' must equal the
    uncompressed GSPMD mesh step (global in-batch negatives) — same loss
    trajectory and same updated params. This is the measured basis for
    de-siloing compression from the flagship loss (VERDICT r4 §3b): the
    manual fused CE's all-gather reproduces the GSPMD candidate set
    exactly, so quantization is the ONLY thing int16/bf16 change."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )
    from jodalrob_twotower_tpu.parallel.sharded_train import (
        make_sharded_indexed_train,
    )

    ds = tiny_dataset
    cfg = _nobn_cfg(grad_compression="none", compressed_negatives="global")
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])

    cdp = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100,
                                           method="none")
    n_store, c_store = _stores(ds, cdp.put_store)
    st_c, er_c = cdp.state, cdp.err_state

    st_g, _tx, _scan, single_g, put_idx_g, put_store_g = (
        make_sharded_indexed_train(model, cfg, mesh, example, 100)
    )
    n_g = put_store_g((np.asarray(ds.notice_store.dense),
                       np.asarray(ds.notice_store.cat_ids)))
    c_g = put_store_g((np.asarray(ds.company_store.dense),
                       np.asarray(ds.company_store.cat_ids)))

    for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=5)):
        idx = idx.astype(np.int32)
        st_c, er_c, m_c = cdp.single_step(
            st_c, er_c, cdp.put_idx(idx), n_store, c_store
        )
        st_g, m_g = single_g(st_g, put_idx_g(idx), n_g, c_g)
        assert float(m_c["loss"]) == pytest.approx(float(m_g["loss"]), rel=1e-5)
        if i >= 2:
            break
    for a, b in zip(jax.tree.leaves(st_c.params), jax.tree.leaves(st_g.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


def test_compressed_global_negatives_int16_learns(tiny_dataset):
    """Global negatives + real int16 compression: trains to within a few
    percent of the exact-sync global control."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )

    ds = tiny_dataset
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)

    finals = {}
    for method in ("int16", "none"):
        cfg = _nobn_cfg(grad_compression=method if method != "none" else "none",
                        compressed_negatives="global")
        model = TwoTowerModel(ds.schema, cfg.model)
        example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])
        cdp = make_dp_compressed_indexed_train(model, cfg, mesh, example, 100,
                                               method=method)
        n_store, c_store = _stores(ds, cdp.put_store)
        st, er = cdp.state, cdp.err_state
        losses = []
        for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=1)):
            st, er, m = cdp.single_step(
                st, er, cdp.put_idx(idx.astype(np.int32)), n_store, c_store
            )
            losses.append(float(m["loss"]))
            if i >= 14:
                break
        finals[method] = losses
    assert finals["int16"][-1] < finals["int16"][0]
    assert finals["int16"][-1] == pytest.approx(finals["none"][-1], rel=0.05)


def test_compressed_sparse_matches_gspmd_sparse(tiny_dataset):
    """Compressed x sparse composition (VERDICT r4 §3a): with method='none'
    and global negatives, the compressed sparse step must equal the
    uncompressed GSPMD sharded sparse step — losses, dense params AND
    tables (the id/grad exchange stays exact by construction)."""
    import dataclasses as dc

    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_sparse_train,
    )
    from jodalrob_twotower_tpu.parallel.sharded_sparse import (
        make_sharded_sparse_train,
    )

    ds = tiny_dataset
    cfg = _nobn_cfg(grad_compression="none", compressed_negatives="global")
    cfg = cfg.replace(sparse_tables=True)
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])

    cdp = make_dp_compressed_sparse_train(model, cfg, mesh, example, 100,
                                          method="none")
    n_store, c_store = _stores(ds, cdp.put_store)
    st_c, er_c = cdp.state, cdp.err_state

    st_g, single_g, put_idx_g, put_store_g = make_sharded_sparse_train(
        model, cfg, mesh, example, 100, with_metrics=True
    )
    n_g = put_store_g((np.asarray(ds.notice_store.dense),
                       np.asarray(ds.notice_store.cat_ids)))
    c_g = put_store_g((np.asarray(ds.company_store.dense),
                       np.asarray(ds.company_store.cat_ids)))

    for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=7)):
        idx = idx.astype(np.int32)
        st_c, er_c, m_c = cdp.single_step(
            st_c, er_c, cdp.put_idx(idx), n_store, c_store
        )
        st_g, m_g = single_g(st_g, put_idx_g(idx), n_g, c_g)
        assert float(m_c["loss"]) == pytest.approx(float(m_g["loss"]), rel=1e-5)
        if i >= 2:
            break
    for a, b in zip(jax.tree.leaves(st_c.dense_params),
                    jax.tree.leaves(st_g.dense_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    for tbl_c, tbl_g in ((st_c.notice_table, st_g.notice_table),
                         (st_c.company_table, st_g.company_table)):
        np.testing.assert_allclose(np.asarray(tbl_c.table),
                                   np.asarray(tbl_g.table), rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(tbl_c.accumulator),
                                   np.asarray(tbl_g.accumulator), rtol=2e-4,
                                   atol=1e-6)


def test_compressed_sparse_int16_learns_and_scans(tiny_dataset):
    """Sparse x int16: local negatives (the DCN default) learns; the
    scanned and sampled dispatch forms advance the step counter."""
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_sparse_train,
    )
    from jodalrob_twotower_tpu.parallel.mesh import replicated

    ds = tiny_dataset
    cfg = _nobn_cfg(grad_compression="int16")
    cfg = cfg.replace(sparse_tables=True)
    mesh = make_mesh(jax.devices()[:8])
    tr, _ = ds.split(0.2, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])

    cdp = make_dp_compressed_sparse_train(model, cfg, mesh, example, 100,
                                          method="int16")
    n_store, c_store = _stores(ds, cdp.put_store)
    # tables really are row-sharded over the mesh
    assert not cdp.state.notice_table.table.sharding.is_fully_replicated
    st, er = cdp.state, cdp.err_state
    losses = []
    for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=2)):
        st, er, m = cdp.single_step(
            st, er, cdp.put_idx(idx.astype(np.int32)), n_store, c_store
        )
        losses.append(float(m["loss"]))
        if i >= 11:
            break
    assert losses[-1] < losses[0]

    # scan form: 2 inner steps per dispatch
    stack = cdp.put_idx(np.stack([tr[:128], tr[128:256]]).astype(np.int32))
    st, er, m = cdp.scan_steps(st, er, stack, n_store, c_store)
    assert np.asarray(m["loss"]).shape == (2,)
    # sampled form: key-fed global draws
    pairs_dev = jax.device_put(tr.astype(np.int32), replicated(mesh))
    st, er, m = cdp.make_sampled(3)(st, er, jax.random.PRNGKey(0), pairs_dev,
                                    n_store, c_store)
    assert np.asarray(m["loss"]).shape == (3,)
    assert np.all(np.isfinite(np.asarray(m["loss"])))


def test_trainer_compressed_sparse_e2e(tiny_dataset):
    """Trainer drives sparse x compression end-to-end (the guard removed in
    round 5 — VERDICT r4 §3a): trains, learns, eval works via merged
    params."""
    import dataclasses as dc

    from jodalrob_twotower_tpu.train.trainer import Trainer

    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    mesh = make_mesh(jax.devices()[:8])
    cfg = _nobn_cfg(grad_compression="int16")
    cfg = cfg.replace(
        sparse_tables=True,
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=2),
    )
    trainer = Trainer(cfg, ds.schema, ds.notice_store, ds.company_store,
                      mesh=mesh, log_fn=lambda s: None)
    r = trainer.train(tr, va[:256], corpus_eval=False)
    assert r.history[-1]["train_loss"] < r.history[0]["train_loss"]
    assert np.isfinite(r.final_val["loss"])

    # sampled-on-device x sparse x compression (key-fed dispatches)
    cfg_s = cfg.replace(data=dc.replace(cfg.data, sample_on_device=True))
    trainer_s = Trainer(cfg_s, ds.schema, ds.notice_store, ds.company_store,
                        mesh=mesh, log_fn=lambda s: None)
    r_s = trainer_s.train(tr, va[:256], corpus_eval=False)
    assert np.isfinite(r_s.history[-1]["train_loss"])
    assert r_s.history[-1]["train_loss"] < r_s.history[0]["train_loss"]


def test_compressed_negatives_config_validation():
    from jodalrob_twotower_tpu.config import MeshConfig

    assert MeshConfig().compressed_negatives == "local"
    MeshConfig(compressed_negatives="global")
    with pytest.raises(ValueError, match="compressed_negatives"):
        MeshConfig(compressed_negatives="batch")


def test_compressed_global_rejects_cosine(tiny_dataset):
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        resolve_compressed_loss,
    )

    cfg = _nobn_cfg(compressed_negatives="global")
    import dataclasses as dc

    cfg = cfg.replace(loss=dc.replace(cfg.loss, loss_type="cosine_embedding"))
    with pytest.raises(ValueError, match="cosine"):
        resolve_compressed_loss(cfg, "data")
