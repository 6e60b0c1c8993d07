"""Tower / two-tower forward behavior: shapes, normalization, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import ModelConfig
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.models.tower import Tower
from jodalrob_twotower_tpu.schema import (
    CategoricalSpec,
    NumericSpec,
    SideSchema,
    TextSpec,
    TwoTowerSchema,
    tiny_synthetic_schema,
)

_CFG = ModelConfig(
    categorical_embedding_dim=8,
    dense_projection_dim=16,
    tower_hidden_dims=(32, 16),
    final_embedding_dim=8,
    dropout_rate=0.1,
    compute_dtype="float32",
)


def _batch(schema_side, b=4, seed=0):
    rng = np.random.default_rng(seed)
    return TowerBatch(
        dense=rng.normal(size=(b, schema_side.dense_dim)).astype(np.float32),
        cat_ids=rng.integers(
            0, 10, size=(b, schema_side.num_categorical)
        ).astype(np.int32),
    )


@pytest.fixture(scope="module")
def schema():
    return tiny_synthetic_schema(n_categorical=4, vocab_size=50, n_numeric=8)


def test_tower_forward_shape_and_l2_norm(schema):
    tower = Tower(schema.notice, _CFG)
    batch = _batch(schema.notice)
    variables = tower.init(jax.random.PRNGKey(0), batch, train=False)
    out = tower.apply(variables, batch, train=False)
    assert out.shape == (4, _CFG.final_embedding_dim)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), np.ones(4), rtol=1e-5
    )  # L2-normalized (reference: base_tower.py:145)


def test_tower_with_text_features():
    side = SideSchema(
        table="n",
        pk=("id",),
        numeric=(NumericSpec("a"), NumericSpec("b")),
        categorical=(CategoricalSpec("c", 20),),
        text=(TextSpec("t", embed_dim=24),),
    )
    tower = Tower(side, _CFG)
    batch = _batch(side, b=3)
    assert batch.dense.shape == (3, 2 + 24)
    variables = tower.init(jax.random.PRNGKey(0), batch, train=False)
    out = tower.apply(variables, batch, train=False)
    assert out.shape == (3, 8)
    # a learned projection per text block exists
    assert "proj_t" in variables["params"]
    assert "proj_numeric" in variables["params"]


def test_tower_no_dense_features():
    side = SideSchema(table="c", pk=("id",), categorical=(CategoricalSpec("c", 20),) * 1)
    tower = Tower(side, _CFG)
    batch = TowerBatch(
        dense=np.zeros((2, 0), np.float32), cat_ids=np.array([[1], [2]], np.int32)
    )
    variables = tower.init(jax.random.PRNGKey(0), batch, train=False)
    assert tower.apply(variables, batch, train=False).shape == (2, 8)


def test_two_tower_similarity_and_encoders(schema):
    model = TwoTowerModel(schema, _CFG)
    batch = PairBatch(notice=_batch(schema.notice), company=_batch(schema.company, seed=1))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    n, c = model.apply(variables, batch, train=False)
    assert n.shape == c.shape == (4, _CFG.final_embedding_dim)
    n2, c2, sim = model.apply(
        variables, batch, temperature=0.5, method=model.similarity
    )
    np.testing.assert_allclose(np.asarray(n), np.asarray(n2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sim), np.asarray(n) @ np.asarray(c).T / 0.5, rtol=1e-5, atol=1e-5
    )
    # single-side encoders match the paired forward (two_tower_model.py:102-108)
    n3 = model.apply(variables, batch.notice, method=model.encode_notice)
    np.testing.assert_allclose(np.asarray(n3), np.asarray(n), rtol=1e-6)
    # cosine similarity of unit vectors is bounded
    assert np.all(np.abs(np.asarray(sim) * 0.5) <= 1.0 + 1e-5)


def test_out_of_range_ids_clamp_not_crash(schema):
    """Reference parity: ids beyond vocab clamp to the last row
    (cat_embed.py:115-117)."""
    tower = Tower(schema.notice, _CFG)
    batch = _batch(schema.notice)
    variables = tower.init(jax.random.PRNGKey(0), batch, train=False)
    huge = TowerBatch(
        dense=batch.dense,
        cat_ids=np.full_like(batch.cat_ids, 10_000),
    )
    clamped = TowerBatch(
        dense=batch.dense,
        cat_ids=np.full_like(batch.cat_ids, 49),  # vocab_size - 1
    )
    out_huge = tower.apply(variables, huge, train=False)
    out_clamped = tower.apply(variables, clamped, train=False)
    np.testing.assert_allclose(np.asarray(out_huge), np.asarray(out_clamped), rtol=1e-6)
    neg = TowerBatch(dense=batch.dense, cat_ids=np.full_like(batch.cat_ids, -5))
    zero = TowerBatch(dense=batch.dense, cat_ids=np.zeros_like(batch.cat_ids))
    np.testing.assert_allclose(
        np.asarray(tower.apply(variables, neg, train=False)),
        np.asarray(tower.apply(variables, zero, train=False)),
        rtol=1e-6,
    )


def test_dropout_train_vs_eval(schema):
    tower = Tower(schema.notice, _CFG)
    batch = _batch(schema.notice, b=16)
    variables = tower.init(jax.random.PRNGKey(0), batch, train=False)
    eval1 = tower.apply(variables, batch, train=False)
    eval2 = tower.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))  # eval deterministic
    t1 = tower.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"],
    )[0]
    t2 = tower.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )[0]
    assert not np.allclose(np.asarray(t1), np.asarray(t2))  # dropout active
