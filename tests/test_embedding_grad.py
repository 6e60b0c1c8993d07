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
def test_onehot_lookup_matches_gather(rng, b, k, d):
    """The one-hot MXU forward lookup (VERDICT r3 #2) == jnp.take of the
    bf16 table, bit-exact (one-hot matmul contributes the row's bf16 value
    once; every other tile adds true zeros)."""
    from jodalrob_twotower_tpu.ops.embedding_grad import dense_table_lookup_t

    vocabs = tuple(rng.integers(5, 300, size=k).tolist())
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    ids = np.stack([rng.integers(0, v, size=b) for v in vocabs], axis=1)
    rows = jnp.asarray(ids + offsets[None, :], jnp.int32)
    table = jnp.asarray(rng.normal(size=(total_rows, d)).astype(np.float32))

    emb_t = dense_table_lookup_t(
        table, rows, total_rows=total_rows, tile_feature=tf, interpret=True
    )
    assert emb_t.shape == (k, d, b) and emb_t.dtype == jnp.bfloat16
    ref = jnp.take(table.astype(jnp.bfloat16), rows, axis=0)  # [B, K, D]
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(emb_t, (2, 0, 1)), np.float32),
        np.asarray(ref, np.float32),
    )


def test_onehot_lookup_custom_vjp(rng):
    """make_onehot_lookup: forward == gather, backward == the dense-grad
    kernel (f32 grads for an f32 table despite the bf16 activation)."""
    from jodalrob_twotower_tpu.ops.embedding_grad import make_onehot_lookup

    b, k, d = 128, 3, 32
    vocabs = (100, 150, 60)
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    ids = np.stack([rng.integers(0, v, size=b) for v in vocabs], axis=1)
    rows = jnp.asarray(ids + offsets[None, :], jnp.int32)
    table = jnp.asarray(rng.normal(size=(total_rows, d)).astype(np.float32))

    lookup = make_onehot_lookup(total_rows, tf, interpret=True)

    def loss_k(t):
        return jnp.sum(jnp.sin(lookup(t, rows).astype(jnp.float32)))

    def loss_r(t):
        return jnp.sum(
            jnp.sin(jnp.take(t.astype(jnp.bfloat16), rows, axis=0).astype(jnp.float32))
        )

    np.testing.assert_allclose(float(loss_k(table)), float(loss_r(table)), rtol=1e-6)
    g_k = jax.grad(loss_k)(table)
    g_r = jax.grad(loss_r)(table)
    assert g_k.dtype == table.dtype
    err = np.linalg.norm(np.asarray(g_k - g_r)) / np.linalg.norm(np.asarray(g_r))
    assert err < 5e-3  # bf16 grad-kernel contraction, documented tolerance


def test_onehot_lookup_mode_plumbing():
    """ModelConfig.embedding_lookup='onehot' FORCES the kernel (interpret
    on CPU — the bf16 output proves the kernel path actually ran, not the
    silent gather fallback the first cut had) and matches the bf16 gather
    bit-exactly; oversized tables are rejected loudly."""
    from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection

    vocabs = (30, 40)
    ids = jnp.asarray([[0, 39], [29, 0], [5, 5], [29, 39]], jnp.int32)
    emb_g = EmbeddingCollection(vocab_sizes=vocabs, embed_dim=8)
    variables = emb_g.init(jax.random.PRNGKey(0), ids)
    out_g = emb_g.apply(variables, ids)
    assert out_g.dtype == jnp.float32  # gather passes the f32 table through
    emb_o = EmbeddingCollection(
        vocab_sizes=vocabs, embed_dim=8, lookup_mode="onehot"
    )
    out_o = emb_o.apply(variables, ids)
    assert out_o.dtype == jnp.bfloat16  # the kernel ran
    np.testing.assert_array_equal(
        np.asarray(out_o, np.float32),
        np.asarray(out_g.astype(jnp.bfloat16), np.float32),
    )
    # forced + table beyond the dense envelope: loud error, never a
    # silent fallback
    emb_big = EmbeddingCollection(
        vocab_sizes=(70_000,), embed_dim=8, lookup_mode="onehot"
    )
    big_ids = jnp.zeros((4, 1), jnp.int32)
    with pytest.raises(ValueError, match="envelope"):
        emb_big.init(jax.random.PRNGKey(0), big_ids)
    from jodalrob_twotower_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="embedding_lookup"):
        ModelConfig(embedding_lookup="magic")


def test_resolve_lookup_mode_dtype_gate():
    """'auto' demotes to 'gather' for explicitly-f32 configs (the kernel
    emits bf16 activations — free only under bf16 compute); bf16 keeps
    auto; forced 'onehot' passes through."""
    from jodalrob_twotower_tpu.config import ModelConfig
    from jodalrob_twotower_tpu.models.embedding import resolve_lookup_mode

    assert resolve_lookup_mode(ModelConfig()) == "auto"
    assert (
        resolve_lookup_mode(ModelConfig(compute_dtype="float32")) == "gather"
    )
    assert (
        resolve_lookup_mode(
            ModelConfig(compute_dtype="float32", embedding_lookup="onehot")
        )
        == "onehot"
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

def test_forced_onehot_rejects_scatter_grad():
    """embedding_grad='scatter' + embedding_lookup='onehot' is a
    contradiction (the one-hot forward's backward IS the dense matmul):
    reject loudly instead of silently overriding the scatter request
    (ADVICE r4 low #2b)."""
    from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection

    emb = EmbeddingCollection(
        vocab_sizes=(30,), embed_dim=8, lookup_mode="onehot", grad_mode="scatter"
    )
    with pytest.raises(ValueError, match="scatter"):
        emb.init(jax.random.PRNGKey(0), jnp.zeros((4, 1), jnp.int32))


def test_forced_onehot_rejects_shard_map_sharding(tiny_dataset):
    """build_model: forced 'onehot' with embedding_sharding='shard_map'
    (whose all-to-all lookup_fn wins the dispatch and never consults the
    forced mode) raises instead of silently gathering (ADVICE r4 low #2a)."""
    import dataclasses

    from jodalrob_twotower_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh

    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(embedding_lookup="onehot"),
        mesh=MeshConfig(embedding_sharding="shard_map"),
    )
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="one-hot"):
        build_model(ds.schema, cfg, mesh=mesh)


@pytest.mark.parametrize("b,k,d", [(256, 4, 32), (100, 3, 16)])
def test_bmajor_grad_matches_transposed(rng, b, k, d):
    """dense_table_grad_bmajor (VERDICT r4 #5b): the relayout-free B-major
    input form is bit-identical to dense_table_grad_t — same one-hot, same
    bf16 rounding of g, only the contraction orientation differs."""
    from jodalrob_twotower_tpu.ops.embedding_grad import (
        dense_table_grad_bmajor,
        dense_table_grad_t,
    )

    vocabs = tuple(rng.integers(50, 200, size=k).tolist())
    offsets, total_rows = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    ids = np.stack(
        [rng.integers(0, v, size=b) for v in vocabs], axis=1
    ).astype(np.int32)
    rows = jnp.asarray(ids + offsets[None, :])
    g = jnp.asarray(rng.normal(size=(b, k, d)).astype(np.float32))

    ref = dense_table_grad_t(
        rows, g, total_rows=total_rows, tile_feature=tf, interpret=True
    )
    got = dense_table_grad_bmajor(
        rows, g, total_rows=total_rows, tile_feature=tf, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_forced_onehot_rejects_gspmd_rows(tiny_dataset):
    """Forced 'onehot' + embedding_sharding='gspmd_rows' on a multi-device
    mesh: loud static rejection in build_model (VERDICT r4 #6 — previously
    only the runtime device-count check fired, and only on real TPU)."""
    from jodalrob_twotower_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from jodalrob_twotower_tpu.models import build_model
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh

    ds = tiny_dataset
    cfg = TrainConfig(
        model=ModelConfig(embedding_lookup="onehot"),
        mesh=MeshConfig(embedding_sharding="gspmd_rows"),
    )
    mesh = make_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="gspmd_rows"):
        build_model(ds.schema, cfg, mesh=mesh)
