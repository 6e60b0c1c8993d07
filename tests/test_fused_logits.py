"""Fused logits kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jodalrob_twotower_tpu.ops.fused_logits import (
    _loss_from_stats,
    _stats_xla,
    fused_bidirectional_ce,
    fused_in_batch_metrics,
    fused_stats,
)
from jodalrob_twotower_tpu.train.loss import bidirectional_ce_loss
from jodalrob_twotower_tpu.train.metrics import in_batch_metrics

B, D = 256, 128


def _embs(rng, b=B, d=D):
    n = rng.normal(size=(b, d)).astype(np.float32)
    c = rng.normal(size=(b, d)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return jnp.asarray(n), jnp.asarray(c)


@pytest.mark.parametrize("tau", [1.0, 0.1])
def test_stats_match_xla(rng, tau):
    n, c = _embs(rng)
    ref = _stats_xla(n / tau, c)
    out = fused_stats(n, c, temperature=tau, interpret=True)
    for name in ref._fields:
        if name == "rank":
            # bf16 kernel inputs can flip near-tied comparisons vs the f32
            # reference, shifting integer ranks by a few positions (how
            # many depends on XLA:CPU's reduction order, which varies with
            # process history — hence a small but not tiny budget)
            np.testing.assert_allclose(
                np.asarray(out.rank), np.asarray(ref.rank), atol=5, err_msg=name
            )
            continue
        # error budgets are absolute and scale with the logit range 1/tau:
        # sums over B near-zero-mean similarities cancel (~sqrt(B) bf16
        # ulps), and diag entries are raw logits up to +-1/tau
        atol = (0.05 if name in ("row_sum", "col_sum") else 0.01) / tau
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            rtol=5e-4,
            atol=atol,
            err_msg=name,
        )


@pytest.mark.parametrize("eps", [0.0, 0.1])
@pytest.mark.parametrize("tau", [1.0, 0.07])
def test_fused_loss_matches_reference(rng, eps, tau):
    n, c = _embs(rng)
    ref, _ = bidirectional_ce_loss(n, c, temperature=tau, label_smoothing=eps)
    out = fused_bidirectional_ce(n, c, tau, eps, True)
    # bf16 kernel inputs: loss matches the f32 reference to ~1e-4 relative
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-4)


@pytest.mark.parametrize("eps", [0.0, 0.1])
def test_fused_gradients_match(rng, eps):
    n, c = _embs(rng)
    tau = 0.2

    ref_grad = jax.grad(
        lambda a, b: bidirectional_ce_loss(a, b, temperature=tau, label_smoothing=eps)[0],
        argnums=(0, 1),
    )(n, c)
    fused_grad = jax.grad(
        lambda a, b: fused_bidirectional_ce(a, b, tau, eps, True), argnums=(0, 1)
    )(n, c)
    for g_ref, g_out, name in zip(ref_grad, fused_grad, ("dn", "dc")):
        # kernel contracts the softmax residual in bf16 (fused_logits.py
        # module docstring) -> ~2e-4 relative vs the exact-f32 reference
        np.testing.assert_allclose(
            np.asarray(g_out), np.asarray(g_ref), rtol=2e-3, atol=5e-5, err_msg=name
        )


def test_fused_metrics_match(rng):
    n, c = _embs(rng)
    sim = jnp.dot(n, c.T) / 0.5
    ref = in_batch_metrics(sim)
    out = fused_in_batch_metrics(n, c, temperature=0.5, interpret=True)
    assert set(out) == set(ref)
    for k in ref:
        if k == "z_gap":
            # a ratio with an ill-conditioned denominator on random data
            # (|neg_sim| ~ 0): assert internal consistency with the fused
            # path's OWN gap/neg instead of cross-impl equality
            expect = float(out["similarity_gap"]) / (
                abs(float(out["negative_similarity"])) + 1e-8
            )
            np.testing.assert_allclose(float(out[k]), expect, rtol=1e-5)
            continue
        # bf16 kernel inputs can flip near-tied rank comparisons vs the
        # f32 reference; each flip moves a rank-derived metric (accuracy /
        # mrr / auc / recall@k) by up to 1/B, so budget a few flips
        np.testing.assert_allclose(
            float(out[k]), float(ref[k]), rtol=5e-3, atol=3.0 / B, err_msg=k
        )


def test_unsupported_shapes_fall_back(rng):
    # B not divisible by the block, D not 128-aligned -> XLA path, same result
    n, c = _embs(rng, b=100, d=64)
    ref, _ = bidirectional_ce_loss(n, c, temperature=0.3)
    out = fused_bidirectional_ce(n, c, 0.3, 0.0, False)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    g = jax.grad(lambda a, b: fused_bidirectional_ce(a, b, 0.3, 0.0, False))(n, c)
    g_ref = jax.grad(lambda a, b: bidirectional_ce_loss(a, b, temperature=0.3)[0])(n, c)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_loss_from_stats_numerics(rng):
    """Degenerate similarity (all equal) -> loss = log B exactly."""
    n = jnp.ones((128, 128), jnp.float32) / jnp.sqrt(128.0)
    c = jnp.ones((128, 128), jnp.float32) / jnp.sqrt(128.0)
    out = fused_bidirectional_ce(n, c, 1.0, 0.0, True)
    np.testing.assert_allclose(float(out), np.log(128.0), rtol=1e-5)


@pytest.mark.parametrize("tau", [1.0, 0.1])
def test_lean_nomax_kernel_matches_shifted(rng, tau):
    """With unit-norm inputs |logits| <= 1/tau, so the unshifted lean
    forward (max_abs_logit static bound) must agree with the max-shifted
    kernel and the XLA reference; grads route through the same bwd."""
    n, c = _embs(rng)
    shifted = fused_bidirectional_ce(n, c, tau, 0.0, True)
    nomax = fused_bidirectional_ce(n, c, tau, 0.0, True, 1.0 / tau)
    ref = bidirectional_ce_loss(
        jnp.asarray(n), jnp.asarray(c), temperature=tau, use_fused=False
    )[0]
    assert float(nomax) == pytest.approx(float(shifted), rel=1e-5)
    assert float(nomax) == pytest.approx(float(ref), rel=2e-3)  # bf16 dot

    g_s = jax.grad(lambda a, b: fused_bidirectional_ce(a, b, tau, 0.0, True))(n, c)
    g_n = jax.grad(
        lambda a, b: fused_bidirectional_ce(a, b, tau, 0.0, True, 1.0 / tau)
    )(n, c)
    np.testing.assert_allclose(np.asarray(g_n), np.asarray(g_s), rtol=1e-4, atol=1e-6)


def test_lean_nomax_falls_back_when_bound_too_large(rng):
    """A tiny temperature (bound beyond the f32 exp margin) must use the
    max-shifted kernel and stay finite."""
    n, c = _embs(rng)
    out = fused_bidirectional_ce(n, c, 0.01, 0.0, True, 1.0 / 0.01)
    assert np.isfinite(float(out))
    ref = fused_bidirectional_ce(n, c, 0.01, 0.0, True)
    assert float(out) == pytest.approx(float(ref), rel=1e-5)


def test_fused_api_falls_back_off_tpu_at_kernel_shapes(rng):
    """use_fused_logits=True must be runnable on the CPU dev/test backend
    even at kernel-eligible shapes (B % 128 == 0, D % 128 == 0): without
    interpret mode the kernels cannot lower off-TPU, so the API silently
    takes the XLA path (ops/fused_logits._kernel_ok)."""
    import jax

    from jodalrob_twotower_tpu.ops.fused_logits import (
        fused_bidirectional_ce,
        fused_in_batch_metrics,
    )

    n = rng.normal(size=(128, 128)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    c = rng.normal(size=(128, 128)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    n, c = jnp.asarray(n), jnp.asarray(c)

    ref, _ = bidirectional_ce_loss(n, c, temperature=0.3)
    out = fused_bidirectional_ce(n, c, 0.3, 0.0, False, 1 / 0.3)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)
    g_ref = jax.grad(
        lambda a, b: bidirectional_ce_loss(a, b, temperature=0.3)[0], argnums=(0, 1)
    )(n, c)
    g = jax.grad(
        lambda a, b: fused_bidirectional_ce(a, b, 0.3, 0.0, False, 1 / 0.3),
        argnums=(0, 1),
    )(n, c)
    for a, b in zip(g_ref, g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    m = fused_in_batch_metrics(n, c, temperature=0.3)
    assert 0.0 <= float(m["accuracy"]) <= 1.0


class TestBlockedKernels:
    """Col-blocked lean kernels (B beyond the VMEM-resident cap): the 2-D
    grid with online row/col merges and the two-pass backward must match
    the XLA loss. Envelopes are shrunk so the blocked path triggers at
    CPU-testable shapes (the module-level jits re-trace per shape)."""

    @pytest.fixture(autouse=True)
    def small_envelope(self, monkeypatch):
        import jodalrob_twotower_tpu.ops.fused_logits as fl

        monkeypatch.setattr(fl, "_MAX_B", 256)
        monkeypatch.setattr(fl, "_BN_BLOCKED", 256)
        self.fl = fl

    def _unit(self, rng, b, d):
        x = rng.normal(size=(b, d)).astype(np.float32)
        return jnp.asarray(x / np.linalg.norm(x, axis=1, keepdims=True))

    @pytest.mark.parametrize("bound", ["norm", None])
    def test_blocked_matches_xla(self, rng, bound):
        fl = self.fl
        tau = 0.3
        n, c = self._unit(rng, 1024, 128), self._unit(rng, 1024, 128)
        assert fl._blocked_supported(1024, 1024, 128)
        max_abs = (1.0 / tau) if bound == "norm" else None

        def f(a, b):
            return fl.fused_bidirectional_ce(a, b, tau, 0.0, True, max_abs)

        ref, _ = bidirectional_ce_loss(n, c, temperature=tau)
        assert abs(float(f(n, c)) - float(ref)) < 1e-4
        g_ref = jax.grad(
            lambda a, b: bidirectional_ce_loss(a, b, temperature=tau)[0],
            argnums=(0, 1),
        )(n, c)
        g = jax.grad(f, argnums=(0, 1))(n, c)
        for a, b in zip(g_ref, g):
            scale = float(jnp.max(jnp.abs(a)))
            assert float(jnp.max(jnp.abs(a - b))) < 1e-6 + 5e-3 * scale

    def test_sharded_blocked_matches_xla(self, rng):
        from jax.sharding import Mesh

        fl = self.fl
        tau = 0.5
        n, c = self._unit(rng, 1024, 128), self._unit(rng, 1024, 128)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        f = fl.make_sharded_fused_ce(
            mesh, "data", temperature=tau, max_abs_logit=1.0 / tau,
            interpret=True,
        )
        ref, _ = bidirectional_ce_loss(n, c, temperature=tau)
        assert abs(float(jax.jit(f)(n, c)) - float(ref)) < 1e-4
        g_ref = jax.grad(
            lambda a, b: bidirectional_ce_loss(a, b, temperature=tau)[0],
            argnums=(0, 1),
        )(n, c)
        g = jax.grad(f, argnums=(0, 1))(n, c)
        for a, b in zip(g_ref, g):
            scale = float(jnp.max(jnp.abs(a)))
            assert float(jnp.max(jnp.abs(a - b))) < 1e-6 + 5e-3 * scale

    @pytest.mark.parametrize("tau", [1.0, 0.3])
    def test_blocked_stats_match_xla(self, rng, tau):
        """The col-blocked FULL stats kernel (2-D grid, online row+col
        merges, precomputed-diag rank) matches the XLA reference on every
        field — this is the smoothing/metrics surface beyond the resident
        cap (VERDICT r2 #1)."""
        fl = self.fl
        n, c = self._unit(rng, 1024, 128), self._unit(rng, 1024, 128)
        ref = fl._stats_xla(jnp.asarray(n) / tau, jnp.asarray(c))
        out = fl.fused_stats(n, c, temperature=tau, interpret=True)
        for name in ref._fields:
            if name == "rank":
                # bf16 near-tie flips vs the f32 reference (see the resident
                # test's budget rationale) — the expected flip count scales
                # with B, so 1024 rows gets 4x the 256-row budget
                np.testing.assert_allclose(
                    np.asarray(out.rank), np.asarray(ref.rank), atol=20,
                    err_msg=name,
                )
                continue
            atol = (0.1 if name in ("row_sum", "col_sum") else 0.01) / tau
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)),
                np.asarray(getattr(ref, name)),
                rtol=5e-4, atol=atol, err_msg=name,
            )

    def test_blocked_smoothing_loss_and_grads(self, rng):
        """label_smoothing > 0 beyond the resident cap: forward via the
        blocked stats kernel, backward via the blocked two-pass kernels
        (whose ∂L/∂S tile carries the eps term) — both must match the XLA
        loss (reference semantics two_tower_train_task.py:131)."""
        fl = self.fl
        tau, eps = 0.3, 0.1
        n, c = self._unit(rng, 1024, 128), self._unit(rng, 1024, 128)

        def f(a, b):
            return fl.fused_bidirectional_ce(a, b, tau, eps, True)

        ref, _ = bidirectional_ce_loss(
            n, c, temperature=tau, label_smoothing=eps
        )
        assert abs(float(f(n, c)) - float(ref)) < 1e-4
        g_ref = jax.grad(
            lambda a, b: bidirectional_ce_loss(
                a, b, temperature=tau, label_smoothing=eps
            )[0],
            argnums=(0, 1),
        )(n, c)
        g = jax.grad(f, argnums=(0, 1))(n, c)
        for a, b in zip(g_ref, g):
            scale = float(jnp.max(jnp.abs(a)))
            assert float(jnp.max(jnp.abs(a - b))) < 1e-6 + 5e-3 * scale

    def test_blocked_fused_metrics(self, rng):
        """fused_in_batch_metrics beyond the resident cap routes through the
        blocked stats kernel and matches the materializing reference."""
        from jodalrob_twotower_tpu.train.metrics import in_batch_metrics

        fl = self.fl
        n, c = self._unit(rng, 512, 128), self._unit(rng, 512, 128)
        sim = jnp.dot(jnp.asarray(n), jnp.asarray(c).T) / 0.5
        ref = in_batch_metrics(sim)
        out = fl.fused_in_batch_metrics(n, c, temperature=0.5, interpret=True)
        assert set(out) == set(ref)
        for k in ref:
            if k == "z_gap":  # see test_fused_metrics_match
                expect = float(out["similarity_gap"]) / (
                    abs(float(out["negative_similarity"])) + 1e-8
                )
                np.testing.assert_allclose(float(out[k]), expect, rtol=1e-5)
                continue
            np.testing.assert_allclose(
                float(out[k]), float(ref[k]), rtol=5e-3, atol=3.0 / 512,
                err_msg=k,
            )

    def test_sharded_blocked_smoothing_matches_xla(self, rng):
        """Mesh-sharded fused CE with label smoothing at a global batch
        beyond the resident cap: blocked stats forward + blocked backward
        under shard_map must match the single-device XLA loss."""
        from jax.sharding import Mesh

        fl = self.fl
        tau, eps = 0.5, 0.1
        n, c = self._unit(rng, 1024, 128), self._unit(rng, 1024, 128)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        f = fl.make_sharded_fused_ce(
            mesh, "data", temperature=tau, label_smoothing=eps, interpret=True,
        )
        ref, _ = bidirectional_ce_loss(
            n, c, temperature=tau, label_smoothing=eps
        )
        assert abs(float(jax.jit(f)(n, c)) - float(ref)) < 1e-4
        g_ref = jax.grad(
            lambda a, b: bidirectional_ce_loss(
                a, b, temperature=tau, label_smoothing=eps
            )[0],
            argnums=(0, 1),
        )(n, c)
        g = jax.grad(f, argnums=(0, 1))(n, c)
        for a, b in zip(g_ref, g):
            scale = float(jnp.max(jnp.abs(a)))
            assert float(jnp.max(jnp.abs(a - b))) < 1e-6 + 5e-3 * scale

    def test_blocked_envelope(self):
        fl = self.fl
        assert not fl._blocked_supported(256, 256, 128)   # resident regime
        assert fl._blocked_supported(512, 512, 128)
        assert not fl._blocked_supported(512, 512, 64)    # lanes
        assert not fl._blocked_supported(512, 1 << 18, 128)  # beyond cap
