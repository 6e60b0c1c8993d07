"""Explicit shard_map embedding exchange vs the single-device gather."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from jodalrob_twotower_tpu.config import (
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
from jodalrob_twotower_tpu.models import build_model
from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS, make_mesh
from jodalrob_twotower_tpu.parallel.sharded_embedding import make_sharded_lookup
from jodalrob_twotower_tpu.parallel.sharded_train import make_sharded_train
from jodalrob_twotower_tpu.train.train_step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices(), MeshConfig())


def test_lookup_matches_take(mesh, rng):
    r, d, b, k = 1024, 16, 64, 4
    table = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, r, size=(b, k)).astype(np.int32))
    lookup = make_sharded_lookup(mesh)
    out = jax.jit(lookup)(
        jax.device_put(table, NamedSharding(mesh, P(DATA_AXIS, None))),
        jax.device_put(rows, NamedSharding(mesh, P(DATA_AXIS, None))),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(table, rows, axis=0)), rtol=1e-6
    )


def test_lookup_gradient_is_scatter_add(mesh, rng):
    r, d = 256, 8
    table = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    rows = jnp.asarray([[3, 3], [250, 0], [3, 9], [100, 100]], jnp.int32)
    rows = jnp.tile(rows, (2, 1))  # batch 8 = mesh size
    lookup = make_sharded_lookup(mesh)

    def loss_sharded(t):
        return jnp.sum(lookup(t, rows) * 2.0)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, rows, axis=0) * 2.0)

    g_s = jax.jit(jax.grad(loss_sharded))(
        jax.device_put(table, NamedSharding(mesh, P(DATA_AXIS, None)))
    )
    g_r = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r), rtol=1e-6)
    # duplicate id 3 appears 3x per half, tiled 2x -> grad row is 6 * 2.0
    np.testing.assert_allclose(np.asarray(g_s)[3], np.full(d, 12.0))


def test_lookup_shape_validation(mesh):
    lookup = make_sharded_lookup(mesh)
    with pytest.raises(ValueError, match="divide"):
        lookup(jnp.zeros((100, 8)), jnp.zeros((8, 2), jnp.int32))  # 100 % 8 != 0
    with pytest.raises(ValueError, match="divide"):
        lookup(jnp.zeros((128, 8)), jnp.zeros((3, 2), jnp.int32))  # batch 3


def test_sharded_dense_grad_lookup_matches_take_grad(mesh, rng):
    """ShardedDenseGradLookup: forward == take, backward == the exact
    scatter-add table gradient (the dense-vocab kernel per shard + psum)."""
    from jodalrob_twotower_tpu.models.embedding import tile_feature_map
    from jodalrob_twotower_tpu.parallel.sharded_embedding import (
        ShardedDenseGradLookup,
    )

    vocabs = (100, 250)
    tf = tuple(tile_feature_map(vocabs).tolist())
    r, d, b = 384, 8, 32  # two features padded to 128 + 256 rows
    table = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    rows = jnp.asarray(
        np.stack(
            [rng.integers(0, 100, size=b), 128 + rng.integers(0, 250, size=b)],
            axis=1,
        ).astype(np.int32)
    )
    lookup = ShardedDenseGradLookup(mesh, interpret=True)

    def loss_sharded(t):
        return jnp.sum(lookup(t, rows, total_rows=r, tile_feature=tf) ** 2)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, rows, axis=0) ** 2)

    out = lookup(table, rows, total_rows=r, tile_feature=tf)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(table, rows, axis=0)), rtol=1e-6
    )
    g_s = jax.jit(jax.grad(loss_sharded))(table)
    g_r = jax.grad(loss_ref)(table)
    # the kernel contracts in bf16 (~1e-2 relative — ops/embedding_grad.py)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r), rtol=1e-2, atol=1e-4)
    # untouched rows must be exactly zero in both
    touched = np.zeros(r, bool)
    touched[np.asarray(rows).reshape(-1)] = True
    assert np.all(np.asarray(g_s)[~touched] == 0)
    # rows above max_rows fall back to the plain gather
    small = ShardedDenseGradLookup(mesh, interpret=True, max_rows=8)
    np.testing.assert_allclose(
        np.asarray(small(table, rows, total_rows=r, tile_feature=tf)),
        np.asarray(out),
    )


def test_sharded_onehot_forward_matches_take(mesh, rng):
    """ShardedDenseGradLookup with the one-hot FORWARD (lookup_mode=
    'onehot' — the mesh form of the round-4 headline win): forward ==
    take of the bf16 table exactly, grads == the dense-grad backward."""
    from jodalrob_twotower_tpu.models.embedding import tile_feature_map
    from jodalrob_twotower_tpu.parallel.sharded_embedding import (
        ShardedDenseGradLookup,
    )

    vocabs = (100, 250)
    tf = tuple(tile_feature_map(vocabs).tolist())
    r, d, b = 384, 8, 32
    table = jnp.asarray(rng.normal(size=(r, d)).astype(np.float32))
    rows = jnp.asarray(
        np.stack(
            [rng.integers(0, 100, size=b), 128 + rng.integers(0, 250, size=b)],
            axis=1,
        ).astype(np.int32)
    )
    lookup = ShardedDenseGradLookup(mesh, interpret=True, lookup_mode="onehot")
    assert lookup.onehot_forward
    out = lookup(table, rows, total_rows=r, tile_feature=tf)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out, np.float32),
        np.asarray(jnp.take(table.astype(jnp.bfloat16), rows, axis=0), np.float32),
    )

    def loss_onehot(t):
        return jnp.sum(
            lookup(t, rows, total_rows=r, tile_feature=tf).astype(jnp.float32) ** 2
        )

    def loss_ref(t):
        return jnp.sum(
            jnp.take(t.astype(jnp.bfloat16), rows, axis=0).astype(jnp.float32) ** 2
        )

    g_o = jax.jit(jax.grad(loss_onehot))(table)
    g_r = jax.grad(loss_ref)(table)
    assert g_o.dtype == table.dtype
    np.testing.assert_allclose(np.asarray(g_o), np.asarray(g_r), rtol=1e-2, atol=1e-4)
    # "gather" keeps the take forward (f32 passthrough)
    plain = ShardedDenseGradLookup(mesh, interpret=True, lookup_mode="gather")
    assert not plain.onehot_forward
    assert plain(table, rows, total_rows=r, tile_feature=tf).dtype == jnp.float32

    # batch NOT divisible by the mesh axis (eval/corpus-encode chunks):
    # falls back to the take forward instead of a shard_map crash
    odd = rows[:5]
    out_odd = lookup(table, odd, total_rows=r, tile_feature=tf)
    assert out_odd.dtype == jnp.float32  # take path, not the bf16 kernel
    np.testing.assert_allclose(
        np.asarray(out_odd), np.asarray(jnp.take(table, odd, axis=0)), rtol=1e-6
    )

    # FORCED dense BACKWARD (embedding_grad='dense') + table beyond the
    # envelope: the backward keeps the kernel but the forward must stay
    # the gather (its cost grows with rows x batch). Simulate the TPU
    # auto-forward resolution on the CPU mesh.
    forced = ShardedDenseGradLookup(
        mesh, interpret=True, max_rows=8, forced=True, lookup_mode="auto"
    )
    forced.onehot_forward = True  # what 'auto' resolves to on TPU
    out_forced = forced(table, rows, total_rows=r, tile_feature=tf)
    assert out_forced.dtype == jnp.float32  # take forward above max_rows
    np.testing.assert_allclose(
        np.asarray(out_forced), np.asarray(jnp.take(table, rows, axis=0)),
        rtol=1e-6,
    )
    # FORCED 'onehot' with an impossible config: loud, never silent
    loud = ShardedDenseGradLookup(
        mesh, interpret=True, max_rows=8, forced=True, lookup_mode="onehot"
    )
    with pytest.raises(ValueError, match="envelope"):
        loud(table, rows, total_rows=r, tile_feature=tf)


def test_replicated_dense_grad_train_step_matches_scatter(tiny_dataset, mesh):
    """Sharded train step with embedding_sharding='replicated' (dense-grad
    kernel backward via shard_map) == the single-device scatter step."""
    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            use_batch_norm=False,
            compute_dtype="float32",
            embedding_grad="dense",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        mesh=MeshConfig(embedding_sharding="replicated"),
    )
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])

    model_dg = build_model(ds.schema, cfg, mesh)
    from jodalrob_twotower_tpu.parallel.sharded_embedding import (
        ShardedDenseGradLookup,
    )

    assert isinstance(model_dg.lookup_fn, ShardedDenseGradLookup)
    state_dg, step_dg, shard_batch = make_sharded_train(model_dg, cfg, mesh, batch, 100)
    table = state_dg.params["notice_tower"]["embeddings"]["table"]
    assert table.sharding.is_fully_replicated
    s1, m1 = step_dg(state_dg, shard_batch(batch))

    import dataclasses

    ref_cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, embedding_grad="scatter"),
        mesh=MeshConfig(),
    )
    model_ref = build_model(ds.schema, ref_cfg, None)
    state_ref, tx = create_train_state(
        model_ref, ref_cfg, jax.random.PRNGKey(cfg.seed), batch, 100
    )
    step_ref = make_train_step(model_ref, ref_cfg, tx, donate=False)
    s2, m2 = step_ref(state_ref, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # the table update came through the kernel path: compare post-step tables
    np.testing.assert_allclose(
        np.asarray(s1.params["notice_tower"]["embeddings"]["table"]),
        np.asarray(s2.params["notice_tower"]["embeddings"]["table"]),
        rtol=2e-3,
        atol=2e-5,
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_shard_map_train_step_matches_gspmd(tiny_dataset, mesh):
    """Full train step with the explicit exchange == GSPMD auto-sharded step."""
    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            use_batch_norm=False,
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        mesh=MeshConfig(embedding_sharding="shard_map"),
    )
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])

    model_sm = build_model(ds.schema, cfg, mesh)
    assert model_sm.lookup_fn is not None
    state_sm, step_sm, shard_batch = make_sharded_train(model_sm, cfg, mesh, batch, 100)
    s1, m1 = step_sm(state_sm, shard_batch(batch))

    model_ref = build_model(ds.schema, cfg.replace(mesh=MeshConfig()), None)
    state_ref, tx = create_train_state(model_ref, cfg, jax.random.PRNGKey(cfg.seed), batch, 100)
    step_ref = make_train_step(model_ref, cfg, tx, donate=False)
    s2, m2 = step_ref(state_ref, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
