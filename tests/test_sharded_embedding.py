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
