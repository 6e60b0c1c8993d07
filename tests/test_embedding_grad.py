"""Dense-vocab embedding gradient kernel vs the XLA scatter-add."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.models.embedding import table_layout, tile_feature_map
from jodalrob_twotower_tpu.ops.embedding_grad import (
    dense_table_grad,
    make_dense_grad_lookup,
)


def _scatter_ref(rows, g, total_rows):
    d = g.shape[-1]
    return (
        jnp.zeros((total_rows, d), jnp.float32)
        .at[rows.reshape(-1)]
        .add(g.reshape(-1, d).astype(jnp.float32))
    )


@pytest.mark.parametrize("b,k,d", [(256, 4, 32), (100, 3, 16)])
def test_dense_grad_matches_scatter(rng, b, k, d):
    vocabs = tuple(rng.integers(5, 300, size=k).tolist())
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    ids = np.stack(
        [rng.integers(0, v, size=b) for v in vocabs], axis=1
    ).astype(np.int32)
    rows = jnp.asarray(ids + offsets[None, :])
    g = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))
    out = dense_table_grad(rows, g, total_rows=total_rows, tile_feature=tf, interpret=True)
    ref = _scatter_ref(rows, g, total_rows)
    # bf16 operand rounding: ~1e-2 relative on accumulated sums
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=5e-2)
    # rows outside every feature's used range stay zero (padding rows)
    used = np.zeros(total_rows, bool)
    for off, v in zip(offsets, vocabs):
        used[off : off + v] = True
    assert np.all(np.asarray(out)[~used] == 0)


def test_dense_grad_duplicates_accumulate():
    vocabs = (10,)
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    rows = jnp.asarray([[3], [3], [3]], jnp.int32)
    g = jnp.ones((3, 1, 8), jnp.float32)
    out = dense_table_grad(rows, g, total_rows=total_rows, tile_feature=tf, interpret=True)
    np.testing.assert_allclose(np.asarray(out)[3], np.full(8, 3.0))
    assert float(jnp.sum(out)) == pytest.approx(24.0)


def test_dense_grad_lookup_custom_vjp(rng):
    vocabs = (50, 200)
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    table = jnp.asarray(rng.normal(size=(total_rows, 16)).astype(np.float32))
    ids = np.stack(
        [rng.integers(0, v, size=64) for v in vocabs], axis=1
    ).astype(np.int32)
    rows = jnp.asarray(ids + offsets[None, :])
    lookup = make_dense_grad_lookup(total_rows, tf, interpret=True)

    # forward identical to take
    np.testing.assert_array_equal(
        np.asarray(lookup(table, rows)), np.asarray(jnp.take(table, rows, axis=0))
    )

    # gradient identical to the scatter transpose of take
    def loss_dense(t):
        return jnp.sum(lookup(t, rows) ** 2)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, rows, axis=0) ** 2)

    g_dense = jax.grad(loss_dense)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_ref), rtol=5e-3, atol=5e-3)


def test_grad_mode_plumbing(tiny_dataset):
    """grad_mode='dense' must give the same training grads as 'scatter'
    (interpret-mode CPU check via the module path)."""
    import flax.linen as nn

    from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection

    vocabs = (30, 40)
    ids = jnp.asarray([[0, 39], [29, 0], [5, 5], [29, 39]], jnp.int32)

    emb_s = EmbeddingCollection(vocab_sizes=vocabs, embed_dim=8, grad_mode="scatter")
    variables = emb_s.init(jax.random.PRNGKey(0), ids)

    def loss_scatter(p):
        return jnp.sum(emb_s.apply({"params": p}, ids) ** 2)

    g_scatter = jax.grad(loss_scatter)(variables["params"])["table"]

    # dense path in interpret mode (monkeypatch the lookup factory's default)
    import jodalrob_twotower_tpu.ops.embedding_grad as eg

    orig = eg.make_dense_grad_lookup

    def patched(total_rows, tf, *, interpret=False):
        return orig(total_rows, tf, interpret=True)

    eg.make_dense_grad_lookup = patched
    try:
        emb_d = EmbeddingCollection(vocab_sizes=vocabs, embed_dim=8, grad_mode="dense")

        def loss_dense(p):
            return jnp.sum(emb_d.apply({"params": p}, ids) ** 2)

        g_dense = jax.grad(loss_dense)(variables["params"])["table"]
    finally:
        eg.make_dense_grad_lookup = orig
    np.testing.assert_allclose(
        np.asarray(g_dense), np.asarray(g_scatter), rtol=5e-3, atol=5e-3
    )


@pytest.mark.parametrize("b,k,d", [(256, 4, 32), (100, 3, 16)])
def test_transposed_grad_matches_standard(rng, b, k, d):
    """dense_table_grad_t returns dT^T (the MXU-N-major layout); its
    transpose must equal the standard kernel bit-for-bit (same bf16
    contraction, different output orientation)."""
    from jodalrob_twotower_tpu.ops.embedding_grad import dense_table_grad_t

    vocabs = tuple(rng.integers(5, 300, size=k).tolist())
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    ids = np.stack(
        [rng.integers(0, v, size=b) for v in vocabs], axis=1
    ).astype(np.int32)
    rows = jnp.asarray(ids + offsets[None, :])
    g = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))
    std = dense_table_grad(rows, g, total_rows=total_rows, tile_feature=tf, interpret=True)
    tr = dense_table_grad_t(rows, g, total_rows=total_rows, tile_feature=tf, interpret=True)
    assert tr.shape == (d, total_rows)
    np.testing.assert_array_equal(np.asarray(tr).T, np.asarray(std))
    ref = _scatter_ref(rows, g, total_rows)
    np.testing.assert_allclose(np.asarray(tr).T, np.asarray(ref), rtol=2e-2, atol=5e-2)
