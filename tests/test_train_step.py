"""End-to-end learning on the planted-cluster synthetic dataset.

The capstone of the reference capability (scripts/train.py's loop): the
jitted train step must drive the loss down and the in-batch metrics far
above the random baselines, with gradients reaching every parameter.
"""

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
from jodalrob_twotower_tpu.data.pipeline import (
    assemble_pair_batch,
    epoch_batches,
    train_batches,
)
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.metrics import random_baselines
from jodalrob_twotower_tpu.train.train_step import (
    create_train_state,
    make_encode_fn,
    make_eval_step,
    make_train_step,
)

_CFG = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=8,
        dense_projection_dim=32,
        tower_hidden_dims=(64, 32),
        final_embedding_dim=16,
        dropout_rate=0.0,
        compute_dtype="float32",
    ),
    loss=LossConfig(temperature=0.1),
    optimizer=OptimizerConfig(learning_rate=3e-3, warmup_ratio=0.05),
)


@pytest.fixture(scope="module")
def trained(tiny_dataset):
    """Train 150 steps on the tiny dataset; return everything for asserts."""
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    train_pairs, test_pairs = ds.split(0.2, seed=0)
    example = assemble_pair_batch(ds.notice_store, ds.company_store, train_pairs[:64])
    state, tx = create_train_state(model, _CFG, jax.random.PRNGKey(0), example, 200)
    train_step = make_train_step(model, _CFG, tx, donate=False)

    first_loss = None
    losses = []
    for epoch in range(4):
        for batch in train_batches(
            ds.notice_store, ds.company_store, train_pairs, 64,
            seed=epoch, prefetch=2,
        ):
            state, metrics = train_step(state, batch)
            losses.append(float(metrics["loss"]))
            if first_loss is None:
                first_loss = losses[0]
    return model, state, ds, test_pairs, losses


def test_loss_decreases(trained):
    _, _, _, _, losses = trained
    start = np.mean(losses[:5])
    end = np.mean(losses[-5:])
    assert end < start * 0.7, f"loss did not fall: {start:.3f} -> {end:.3f}"


def test_learns_above_random_baseline(trained):
    model, state, ds, test_pairs, _ = trained
    eval_step = make_eval_step(model, _CFG)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, test_pairs[:64])
    m = {k: float(v) for k, v in eval_step(state, batch).items()}
    rb = random_baselines(64)
    # planted clusters are easy: require well above random on held-out pairs
    assert m["accuracy"] > 3 * rb["accuracy"], m
    assert m["recall@5"] > 2 * rb["recall@5"], m
    assert m["mrr"] > 2 * rb["mrr"], m
    assert m["similarity_gap"] > 0.1, m


def test_eval_metrics_present_under_fused_loss(trained):
    """With use_fused_logits the loss path returns no similarity matrix;
    the eval step must still produce the full ranking-metric surface (via
    fused_in_batch_metrics) — it previously reported loss only, making a
    trained model look 'no better than random' in every epoch log."""
    model, state, ds, test_pairs, _ = trained
    fused_cfg = _CFG.replace(loss=LossConfig(temperature=0.1, use_fused_logits=True))
    eval_step = make_eval_step(model, fused_cfg)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, test_pairs[:64])
    m = {k: float(v) for k, v in eval_step(state, batch).items()}
    plain = {k: float(v) for k, v in make_eval_step(model, _CFG)(state, batch).items()}
    for key in ("accuracy", "recall@5", "recall@10", "mrr", "auc", "similarity_gap"):
        assert key in m, sorted(m)
        np.testing.assert_allclose(m[key], plain[key], rtol=1e-4, atol=1e-5)


def test_gradients_reach_every_param(tiny_dataset):
    """Reference tower_test asserted per-parameter gradient flow
    (src/towers/test/tower_test.py:53-122)."""
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])
    state, tx = create_train_state(model, _CFG, jax.random.PRNGKey(0), batch, 10)
    train_step = make_train_step(model, _CFG, tx, donate=False)
    new_state, _ = train_step(state, batch)

    changed = jax.tree_util.tree_map_with_path(
        lambda path, a, b: (jax.tree_util.keystr(path), bool(np.any(np.asarray(a) != np.asarray(b)))),
        state.params,
        new_state.params,
    )
    for name, did_change in jax.tree_util.tree_leaves(
        changed, is_leaf=lambda x: isinstance(x, tuple)
    ):
        assert did_change, f"parameter {name} received no update"


def test_step_counter_and_determinism(tiny_dataset):
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:32])
    state, tx = create_train_state(model, _CFG, jax.random.PRNGKey(0), batch, 10)
    train_step = make_train_step(model, _CFG, tx, donate=False)
    s1, m1 = train_step(state, batch)
    s1b, m1b = train_step(state, batch)  # same inputs -> identical result
    assert int(s1.step) == 1
    assert float(m1["loss"]) == float(m1b["loss"])


def test_scanned_steps_match_single_steps(tiny_dataset):
    """lax.scan multi-step dispatch == the same N indexed single steps."""
    from jodalrob_twotower_tpu.train.train_step import (
        device_store,
        make_indexed_train_step,
        make_scanned_train_steps,
    )

    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:32])
    state, tx = create_train_state(model, _CFG, jax.random.PRNGKey(0), warm, 10)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    idx = ds.pairs[:96].astype(np.int32).reshape(3, 32, 2)
    single = make_indexed_train_step(model, _CFG, tx, donate=False)
    s1 = state
    singles = []
    for i in range(3):
        s1, m = single(s1, jnp.asarray(idx[i]), n_store, c_store)
        singles.append(float(m["loss"]))
    scanned = make_scanned_train_steps(model, _CFG, tx, 3, donate=False)
    s3, m3 = scanned(state, jnp.asarray(idx), n_store, c_store)
    np.testing.assert_allclose(np.asarray(m3["loss"]), singles, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_sampled_steps_learn_and_are_deterministic(tiny_dataset):
    """On-device batch sampling (bench headline path): deterministic per key,
    drives the loss down on planted clusters."""
    from jodalrob_twotower_tpu.train.train_step import (
        device_store,
        make_sampled_train_steps,
    )

    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])
    state, tx = create_train_state(model, _CFG, jax.random.PRNGKey(0), warm, 200)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    pairs_dev = jnp.asarray(ds.pairs.astype(np.int32))
    steps = make_sampled_train_steps(model, _CFG, tx, 8, 64, donate=False)
    key = jax.random.PRNGKey(7)
    s_a, m_a = steps(state, key, pairs_dev, n_store, c_store)
    s_b, m_b = steps(state, key, pairs_dev, n_store, c_store)
    np.testing.assert_array_equal(np.asarray(m_a["loss"]), np.asarray(m_b["loss"]))
    # run 10 dispatches (80 steps) and require clear learning
    s = state
    losses = []
    for d in range(10):
        s, m = steps(s, jax.random.fold_in(key, d), pairs_dev, n_store, c_store)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert int(s.step) == 80
    assert np.mean(losses[-8:]) < np.mean(losses[:8]) - 0.5


def test_encode_fn_matches_forward(tiny_dataset):
    ds = tiny_dataset
    model = TwoTowerModel(ds.schema, _CFG.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:16])
    state, _ = create_train_state(model, _CFG, jax.random.PRNGKey(0), batch, 10)
    eval_step = make_eval_step(model, _CFG)
    encode_n = make_encode_fn(model, "notice")
    encode_c = make_encode_fn(model, "company")
    n = np.asarray(encode_n(state, batch.notice))
    c = np.asarray(encode_c(state, batch.company))
    assert n.shape == c.shape == (16, _CFG.model.final_embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, rtol=1e-5)
    sim = n @ c.T / _CFG.loss.temperature
    m = eval_step(state, batch)
    # loss from the encoders' similarity agrees with the eval step's loss
    logp = jax.nn.log_softmax(jnp.asarray(sim), axis=-1)
    ce_rows = -jnp.mean(jnp.diagonal(logp))
    logp_t = jax.nn.log_softmax(jnp.asarray(sim).T, axis=-1)
    ce_cols = -jnp.mean(jnp.diagonal(logp_t))
    np.testing.assert_allclose(
        float(m["loss"]), float(0.5 * (ce_rows + ce_cols)), rtol=1e-5
    )


def test_pipeline_shapes_and_coverage(tiny_dataset):
    ds = tiny_dataset
    batches = list(epoch_batches(ds.pairs[:1000], 128, shuffle=True, seed=0))
    assert len(batches) == 7  # 1000 // 128, remainder dropped
    assert all(b.shape == (128, 2) for b in batches)
    # without drop_remainder every pair appears exactly once
    all_rows = np.concatenate(
        list(epoch_batches(ds.pairs[:1000], 128, shuffle=True, seed=0, drop_remainder=False))
    )
    assert all_rows.shape == (1000, 2)
    assert set(map(tuple, all_rows)) == set(map(tuple, ds.pairs[:1000]))


def test_rbg_dropout_trains_and_is_deterministic(tiny_dataset):
    """dropout_rng_impl="rbg" draws masks from XLA's RngBitGenerator (the
    fast TPU hardware generator). Contract: the step runs, dropout actually
    drops (train loss differs from the no-dropout forward), and the run is
    replayable (same state+batch -> bit-identical result)."""
    import dataclasses

    ds = tiny_dataset
    cfg = _CFG.replace(
        model=dataclasses.replace(_CFG.model, dropout_rate=0.3, dropout_rng_impl="rbg")
    )
    model = TwoTowerModel(ds.schema, cfg.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, 100)
    step = make_train_step(model, cfg, tx, donate=False)

    s1, m1 = step(state, batch)
    s1b, m1b = step(state, batch)  # replay: identical
    assert float(m1["loss"]) == float(m1b["loss"])
    assert np.isfinite(float(m1["loss"]))

    # two consecutive steps use different fold_in(step) keys -> masks differ;
    # loss at step 2 computed from updated params must also be finite
    s2, m2 = step(s1, batch)
    assert np.isfinite(float(m2["loss"]))

    # rbg masks differ from threefry masks for the same key/config
    cfg_tf = _CFG.replace(
        model=dataclasses.replace(_CFG.model, dropout_rate=0.3, dropout_rng_impl="threefry")
    )
    model_tf = TwoTowerModel(ds.schema, cfg_tf.model)
    step_tf = make_train_step(model_tf, cfg_tf, tx, donate=False)
    _, m_tf = step_tf(state, batch)
    assert float(m_tf["loss"]) != float(m1["loss"])


def test_dropout_key_handles_four_word_keys():
    """dropout_key must wrap rbg-native (4-word) keys as-is, not blindly
    duplicate to 8 words (crash found in review: a session with
    jax_default_prng_impl=rbg makes fold_in yield 4-word keys)."""
    import dataclasses
    from jodalrob_twotower_tpu.train.train_step import dropout_key

    cfg = dataclasses.replace(_CFG.model, dropout_rng_impl="rbg")
    two = jax.random.PRNGKey(0)  # default threefry: 2 words
    k2 = dropout_key(cfg, two)
    four = jax.random.key_data(jax.random.key(0, impl="rbg"))  # 4 words
    k4 = dropout_key(cfg, four)
    for k in (k2, k4):
        assert jnp.issubdtype(k.dtype, jax.dtypes.prng_key)
        # usable: draws bits without error
        jax.random.bernoulli(k, 0.5, (8,))
    with pytest.raises(ValueError, match="key data"):
        dropout_key(cfg, jnp.zeros(3, jnp.uint32))


def test_config_validation_rejects_typos():
    import dataclasses
    from jodalrob_twotower_tpu.config import DataConfig, ModelConfig

    with pytest.raises(ValueError, match="dropout_rng_impl"):
        ModelConfig(dropout_rng_impl="RBG")
    with pytest.raises(ValueError, match="compute_dtype"):
        ModelConfig(compute_dtype="bf16")
    with pytest.raises(ValueError, match="embedding_grad"):
        ModelConfig(embedding_grad="onehot")
    with pytest.raises(ValueError, match="device_store_dtype"):
        DataConfig(device_store_dtype="bf16")
