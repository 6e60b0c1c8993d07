"""Mesh-sharded fused CE: equality with the single-device fused kernel.

Round-1 banned the fused Pallas loss under any mesh; the shard_map wrapper
(ops/fused_logits.make_sharded_fused_ce) lifts that. These tests prove, on
the virtual CPU mesh, that the sharded loss AND its gradients match the
single-device fused path (kernel envelope, interpret mode) and the exact
XLA path (fallback envelope) — global in-batch negatives at any mesh size
(reference semantics anchor: two_tower_train_task.py:114-134).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from jodalrob_twotower_tpu.ops.fused_logits import (
    fused_bidirectional_ce,
    make_sharded_fused_ce,
    _sharded_supported,
)
from jodalrob_twotower_tpu.train.loss import bidirectional_ce_loss


def _unit_rows(rng, b, d):
    x = rng.normal(size=(b, d)).astype(np.float32)
    return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))


@pytest.fixture(scope="module")
def embs():
    rng = np.random.default_rng(7)
    return _unit_rows(rng, 256, 128), _unit_rows(rng, 256, 128)


def test_sharded_supported_envelope():
    assert _sharded_supported(128, 256, 128)  # 2 shards of a 256 batch
    assert _sharded_supported(1024, 8192, 128)  # 8 shards of the headline B
    assert not _sharded_supported(1024, 16384, 128)  # beyond _MAX_B
    assert not _sharded_supported(128, 256, 64)  # D not lane-aligned


@pytest.mark.parametrize("eps", [0.0, 0.1])
@pytest.mark.parametrize("bound", ["norm", None])
def test_kernel_path_matches_single_device_fused(embs, eps, bound):
    """2 shards -> 128-row shards: the real kernels run (interpret mode)."""
    n, c = embs
    tau = 0.3
    max_abs = (1.0 / tau) if bound == "norm" else None
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    f = make_sharded_fused_ce(
        mesh, "data", temperature=tau, label_smoothing=eps,
        max_abs_logit=max_abs, interpret=True,
    )

    def ref_fn(a, b):
        return fused_bidirectional_ce(a, b, tau, eps, True, max_abs)

    ref = ref_fn(n, c)
    out = jax.jit(f)(n, c)
    assert float(jnp.abs(ref - out)) < 1e-5

    g_ref = jax.grad(ref_fn, argnums=(0, 1))(n, c)
    g_sh = jax.grad(f, argnums=(0, 1))(n, c)
    for gr, gs in zip(g_ref, g_sh):
        scale = float(jnp.max(jnp.abs(gr)))
        assert float(jnp.max(jnp.abs(gr - gs))) < 1e-6 + 1e-4 * scale


@pytest.mark.parametrize("eps", [0.0, 0.1])
def test_fallback_path_matches_xla_exactly(eps):
    """8 shards of a 64 batch -> 8-row shards: XLA fallback, same collective
    merge math; must match the plain XLA loss to float tolerance."""
    rng = np.random.default_rng(3)
    n, c = _unit_rows(rng, 64, 128), _unit_rows(rng, 64, 128)
    tau = 0.5
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    f = make_sharded_fused_ce(
        mesh, "data", temperature=tau, label_smoothing=eps,
        max_abs_logit=1.0 / tau,
    )

    def ref_fn(a, b):
        return bidirectional_ce_loss(
            a, b, temperature=tau, label_smoothing=eps
        )[0]

    assert float(jnp.abs(ref_fn(n, c) - jax.jit(f)(n, c))) < 1e-5
    g_ref = jax.grad(ref_fn, argnums=(0, 1))(n, c)
    g_sh = jax.grad(f, argnums=(0, 1))(n, c)
    for gr, gs in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gs), atol=1e-6)


def test_sharded_train_step_fused_matches_single_device(tiny_dataset):
    """End-to-end: one sharded fused train step == one single-device fused
    step (loss exactly; grads are pre-optimizer, so compare the loss and the
    second step's loss, which sees the updated params)."""
    from jodalrob_twotower_tpu.config import LossConfig, TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_train import make_sharded_train
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    ds = tiny_dataset
    cfg = TrainConfig(loss=LossConfig(use_fused_logits=True))
    model = TwoTowerModel(ds.schema, cfg.model)
    batch = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:64])

    state1, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(cfg.seed), batch, 10
    )
    step1 = make_train_step(model, cfg, tx)
    state1, m1 = step1(state1, batch)

    mesh = make_mesh(jax.devices()[:8], cfg.mesh)
    state8, step8, shard_batch = make_sharded_train(
        model, cfg, mesh, batch, total_steps=10
    )
    state8, m8 = step8(state8, shard_batch(batch))
    assert float(jnp.abs(m1["loss"] - m8["loss"])) < 1e-6

    # step 2 sees the optimizer-updated params: a loose check that the
    # gradient flow matched too (adam amplifies ~1e-8 grad noise near
    # zero-gradient params, so exact param equality is not expected)
    state1, m1b = step1(state1, batch)
    state8, m8b = step8(state8, shard_batch(batch))
    assert float(jnp.abs(m1b["loss"] - m8b["loss"])) < 5e-3
