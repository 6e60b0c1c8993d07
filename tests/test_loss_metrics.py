"""Loss and metric correctness against hand-computed numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from jodalrob_twotower_tpu.train.loss import (
    bidirectional_ce_loss,
    compute_loss,
    cosine_embedding_loss,
)
from jodalrob_twotower_tpu.train.metrics import (
    diagonal_ranks,
    in_batch_metrics,
    random_baselines,
)


def _np_ce(logits, smoothing=0.0):
    """Row-wise CE with diagonal labels (+uniform label smoothing)."""
    b = logits.shape[0]
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    diag = np.diagonal(logp)
    if smoothing:
        off = smoothing / b
        loss = -(1 - smoothing) * diag - off * logp.sum(axis=1)
    else:
        loss = -diag
    return loss.mean()


def _unit_rows(rng, b, d):
    x = rng.normal(size=(b, d))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("tau", [1.0, 0.07])
def test_bidirectional_ce_matches_numpy(smoothing, tau, rng):
    n = _unit_rows(rng, 16, 8)
    c = _unit_rows(rng, 16, 8)
    loss, sim = bidirectional_ce_loss(
        jnp.asarray(n), jnp.asarray(c), temperature=tau, label_smoothing=smoothing
    )
    s = (n @ c.T) / tau
    expected = 0.5 * (_np_ce(s, smoothing) + _np_ce(s.T, smoothing))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sim), s, rtol=1e-5, atol=1e-6)


def test_perfect_alignment_minimizes_ce(rng):
    """Identical towers with low temperature -> near-zero loss."""
    e = _unit_rows(rng, 32, 16)
    loss, _ = bidirectional_ce_loss(jnp.asarray(e), jnp.asarray(e), temperature=0.01)
    assert float(loss) < 1e-3
    # vs mismatched pairs
    loss_bad, _ = bidirectional_ce_loss(
        jnp.asarray(e), jnp.asarray(np.roll(e, 1, axis=0)), temperature=0.01
    )
    assert float(loss_bad) > float(loss) + 1.0


def test_cosine_embedding_loss(rng):
    n = _unit_rows(rng, 8, 4)
    c = _unit_rows(rng, 8, 4)
    loss, sim = cosine_embedding_loss(jnp.asarray(n), jnp.asarray(c), margin=0.1)
    pos = np.sum(n * c, axis=1)
    neg = np.sum(n * np.roll(c, -1, axis=0), axis=1)
    expected = np.mean(1 - pos) + np.mean(np.maximum(neg - 0.1, 0))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    # aligned embeddings give zero positive term
    loss_same, _ = cosine_embedding_loss(jnp.asarray(n), jnp.asarray(n), margin=2.0)
    np.testing.assert_allclose(float(loss_same), 0.0, atol=1e-6)


def test_compute_loss_dispatch(rng):
    n = jnp.asarray(_unit_rows(rng, 4, 4))
    c = jnp.asarray(_unit_rows(rng, 4, 4))
    l1, _ = compute_loss("cross_entropy", n, c)
    l2, _ = compute_loss("cosine_embedding", n, c)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    with pytest.raises(ValueError, match="loss_type"):
        compute_loss("nope", n, c)


def test_diagonal_ranks_exact():
    sim = jnp.asarray(
        [
            [0.9, 0.1, 0.2],  # diag best -> rank 0
            [0.8, 0.5, 0.7],  # diag third... 0.5 < 0.8,0.7 -> rank 2
            [0.1, 0.0, 0.3],  # diag best -> rank 0
        ]
    )
    np.testing.assert_array_equal(np.asarray(diagonal_ranks(sim)), [0, 2, 0])


def test_in_batch_metrics_against_numpy(rng):
    sim_np = rng.normal(size=(64, 64)).astype(np.float32)
    m = {k: float(v) for k, v in in_batch_metrics(jnp.asarray(sim_np), (5, 10)).items()}

    ranks = np.array(
        [(sim_np[i] > sim_np[i, i]).sum() for i in range(64)]
    )
    assert m["accuracy"] == pytest.approx((ranks == 0).mean())
    assert m["mrr"] == pytest.approx((1.0 / (ranks + 1)).mean(), rel=1e-5)
    assert m["auc"] == pytest.approx((1.0 - ranks / 63).mean(), rel=1e-5)
    assert m["recall@5"] == pytest.approx((ranks < 5).mean())
    assert m["recall@10"] == pytest.approx((ranks < 10).mean())
    diag = np.diagonal(sim_np)
    off = (sim_np.sum(axis=1) - diag) / 63
    assert m["positive_similarity"] == pytest.approx(diag.mean(), rel=1e-5)
    assert m["negative_similarity"] == pytest.approx(off.mean(), rel=1e-4, abs=1e-5)
    assert m["similarity_gap"] == pytest.approx(
        diag.mean() - off.mean(), rel=1e-4, abs=1e-5
    )
    # Z-gap (reference scripts/train.py:347-351):
    # sim_gap / max(|neg_sim| + 1e-8, 1e-8)
    gap = diag.mean() - off.mean()
    assert m["z_gap"] == pytest.approx(
        gap / (abs(off.mean()) + 1e-8), rel=1e-4, abs=1e-5
    )


def test_resolve_use_fused():
    """use_fused_logits='auto' (the default) resolves True only on a TPU
    backend with the CE loss; bools pass through; junk rejected."""
    import jax

    from jodalrob_twotower_tpu.config import LossConfig, TrainConfig
    from jodalrob_twotower_tpu.train.loss import resolve_use_fused

    on_tpu = jax.default_backend() == "tpu"
    assert LossConfig().use_fused_logits == "auto"
    assert resolve_use_fused(LossConfig()) is on_tpu
    assert resolve_use_fused(LossConfig(use_fused_logits=True)) is True
    assert resolve_use_fused(LossConfig(use_fused_logits=False)) is False
    # auto never enables it for the non-CE loss
    assert (
        resolve_use_fused(LossConfig(loss_type="cosine_embedding")) is False
    )
    with pytest.raises(ValueError, match="use_fused_logits"):
        LossConfig(use_fused_logits="yes")
    # JSON round-trip preserves the sentinel
    cfg = TrainConfig.from_dict(TrainConfig().to_dict())
    assert cfg.loss.use_fused_logits == "auto"


def test_random_baselines():
    rb = random_baselines(256, (5, 10))
    assert rb["accuracy"] == pytest.approx(1 / 256)
    assert rb["recall@5"] == pytest.approx(5 / 256)
    assert rb["recall@10"] == pytest.approx(10 / 256)
    assert 0 < rb["mrr"] < 1
