"""Embedding lookup: unified-table layout, XLA path, Pallas path (interpret),
gradients, and the optimizer built on top of it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection, table_layout
from jodalrob_twotower_tpu.ops.embedding_lookup import (
    embedding_lookup_pallas,
    embedding_lookup_xla,
)
from jodalrob_twotower_tpu.train.optimizer import rowwise_adagrad


def test_table_layout_offsets():
    # every feature block starts 128-aligned (dense-grad kernel invariant)
    offsets, total = table_layout((100, 50, 25), row_alignment=128)
    np.testing.assert_array_equal(offsets, [0, 128, 256])
    assert total == 384
    _, total_one = table_layout((1,), row_alignment=128)
    assert total_one == 128
    offsets2, total2 = table_layout((1000, 200), row_alignment=128)
    np.testing.assert_array_equal(offsets2, [0, 1024])
    assert total2 == 1024 + 256

    from jodalrob_twotower_tpu.models.embedding import tile_feature_map

    np.testing.assert_array_equal(tile_feature_map((100, 50, 25)), [0, 1, 2])
    np.testing.assert_array_equal(
        tile_feature_map((1000, 200)), [0] * 8 + [1] * 2
    )


def test_xla_lookup_gathers_rows(rng):
    table = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    rows = jnp.asarray([[0, 5], [63, 1]], jnp.int32)
    out = embedding_lookup_xla(table, rows)
    assert out.shape == (2, 2, 16)
    np.testing.assert_array_equal(np.asarray(out[1, 0]), np.asarray(table[63]))


def test_pallas_lookup_matches_xla_interpret(rng):
    """Pallas gather (interpret mode on CPU) must bit-match the XLA gather."""
    table = jnp.asarray(rng.normal(size=(512, 128)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 512, size=(300,)).astype(np.int32))
    out_p = embedding_lookup_pallas(table, rows, interpret=True)
    out_x = embedding_lookup_xla(table, rows)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_embedding_collection_forward_and_grads(rng):
    vocabs = (50, 30)
    emb = EmbeddingCollection(vocab_sizes=vocabs, embed_dim=4)
    ids = jnp.asarray([[0, 29], [49, 0]], jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(variables, ids)
    assert out.shape == (2, 8)
    table = variables["params"]["table"]
    # feature 1 rows live at the 128-aligned offset in the unified table
    np.testing.assert_array_equal(np.asarray(out[0, 4:]), np.asarray(table[128 + 29]))
    np.testing.assert_array_equal(np.asarray(out[1, :4]), np.asarray(table[49]))

    # ids past each feature's vocab clamp inside that feature's range
    big = jnp.asarray([[500, 500]], jnp.int32)
    out_big = emb.apply(variables, big)
    np.testing.assert_array_equal(np.asarray(out_big[0, :4]), np.asarray(table[49]))
    np.testing.assert_array_equal(np.asarray(out_big[0, 4:]), np.asarray(table[128 + 29]))

    # gradient is a scatter-add into exactly the touched rows
    def loss(params):
        return jnp.sum(emb.apply({"params": params}, ids) ** 2)

    g = jax.grad(loss)(variables["params"])["table"]
    touched = {0, 49, 128 + 29, 128 + 0}
    nz_rows = set(np.flatnonzero(np.any(np.asarray(g) != 0, axis=1)).tolist())
    assert nz_rows == touched


def test_duplicate_ids_accumulate_grads():
    emb = EmbeddingCollection(vocab_sizes=(10,), embed_dim=2)
    ids_dup = jnp.asarray([[3], [3]], jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), ids_dup)

    def loss(params, ids):
        return jnp.sum(emb.apply({"params": params}, ids))

    g_dup = np.asarray(jax.grad(loss)(variables["params"], ids_dup)["table"])
    np.testing.assert_allclose(g_dup[3], [2.0, 2.0])  # two hits accumulate


def test_rowwise_adagrad_update():
    params = {"t": jnp.ones((4, 3))}
    tx = rowwise_adagrad(0.5, init_accumulator=0.0, eps=0.0)
    state = tx.init(params)
    grads = {"t": jnp.asarray([[1.0, 1, 1], [2, 2, 2], [0, 0, 0], [3, 0, 0]])}
    updates, state = tx.update(grads, state)
    # accumulator = mean(g^2) per row; update = -lr * g / sqrt(acc)
    np.testing.assert_allclose(np.asarray(state.accumulator["t"][:, 0]), [1.0, 4.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(updates["t"][0]), [-0.5] * 3)
    np.testing.assert_allclose(np.asarray(updates["t"][1]), [-0.5] * 3)
    np.testing.assert_allclose(
        np.asarray(updates["t"][3]), [-0.5 * 3 / np.sqrt(3), 0, 0], rtol=1e-6
    )
    # zero-grad row: 0/sqrt(0+0) -> nan guarded only by eps; with eps=0 the
    # row is 0 * inf = nan in IEEE, so use eps>0 in practice:
    tx2 = rowwise_adagrad(0.5, init_accumulator=0.0, eps=1e-10)
    u2, _ = tx2.update(grads, tx2.init(params))
    assert np.all(np.isfinite(np.asarray(u2["t"])))
