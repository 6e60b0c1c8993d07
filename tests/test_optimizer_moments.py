"""bf16 AdamW moment storage (VERDICT r4 #5a): the accepted half (mu) has
convergence parity; the rejected half (nu) is demonstrated to freeze —
the measured-step deltas live in BENCHMARKS.md."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch, epoch_batches
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.train.train_step import (
    create_train_state,
    make_train_step,
)


def _cfg(moment_dtype: str) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.2),
        optimizer=OptimizerConfig(
            learning_rate=3e-3, adam_moment_dtype=moment_dtype
        ),
        data=DataConfig(batch_size=128),
        results_csv="",
    )


def test_bf16_mu_convergence_parity(tiny_dataset):
    """adam_moment_dtype='bfloat16' trains to within a few percent of the
    f32 control on the planted-cluster data (same init, same batches) —
    the acceptance condition for shipping the knob."""
    ds = tiny_dataset
    tr, _ = ds.split(0.2, seed=0)
    finals = {}
    for md in ("bfloat16", "float32"):
        cfg = _cfg(md)
        model = TwoTowerModel(ds.schema, cfg.model)
        batch0 = assemble_pair_batch(ds.notice_store, ds.company_store, tr[:128])
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch0, 200)
        if md == "bfloat16":
            # the knob actually reaches optax: mu leaves stored bf16, nu f32
            inner = state.opt_state.inner_states["dense"].inner_state
            mus = jax.tree.leaves(inner[0].mu)
            nus = jax.tree.leaves(inner[0].nu)
            assert all(m.dtype == jnp.bfloat16 for m in mus)
            assert all(n.dtype == jnp.float32 for n in nus)
        step = make_train_step(model, cfg, tx, donate=False)
        losses = []
        for i, idx in enumerate(epoch_batches(tr, 128, shuffle=True, seed=1)):
            batch = assemble_pair_batch(ds.notice_store, ds.company_store, idx)
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            if i >= 19:
                break
        finals[md] = losses
    assert finals["bfloat16"][-1] < finals["bfloat16"][0]  # learns
    assert finals["bfloat16"][-1] == pytest.approx(
        finals["float32"][-1], rel=0.05
    )


def test_bf16_nu_would_freeze():
    """Why nu stays f32 (the documented reject): b2=0.999 makes each EMA
    increment ~1e-3 of the accumulator's own scale — below bf16's ~2^-8
    mantissa granularity, so a bf16 nu stops moving while the f32 nu keeps
    integrating. This is the numeric demonstration behind the
    adam_moment_dtype docstring (config.py)."""
    b2 = 0.999
    g2 = 1.0  # square-gradient with nu already near steady state
    nu_f32 = np.float32(0.9)
    nu_bf16 = jnp.bfloat16(0.9)
    for _ in range(50):
        nu_f32 = np.float32(b2 * nu_f32 + (1 - b2) * g2)
        nu_bf16 = jnp.bfloat16(b2 * float(nu_bf16) + (1 - b2) * g2)
    # f32 integrates toward 1.0; bf16 rounds each step back to its start
    assert float(nu_f32) > 0.9045
    assert float(nu_bf16) == pytest.approx(0.9, abs=2e-3)


def test_adam_moment_dtype_validation():
    with pytest.raises(ValueError, match="adam_moment_dtype"):
        OptimizerConfig(adam_moment_dtype="fp16")
    # JSON round-trip carries the knob
    cfg = _cfg("bfloat16")
    assert TrainConfig.from_dict(cfg.to_dict()) == cfg
