"""On-TPU kernel self-test: diff every Pallas kernel against its XLA
reference ON THE REAL CHIP.

The hermetic pytest suite runs the kernels only in Pallas interpret mode on
CPU (tests/conftest.py pins jax to cpu); Mosaic lowering, VMEM budgeting,
and bf16 MXU numerics are only exercised on hardware. This script is the
fast regression check for that gap — run it after touching anything under
ops/ (CLAUDE.md verify probes: "compare against the XLA path on TPU, not
just interpret").

Prints one JSON line per check and exits nonzero on any failure:
  {"check": "...", "pass": true, "max_rel_err": ..., ...}

Tolerances are bf16-aware: the kernels take bf16 inputs with f32
accumulation (ops/fused_logits.py docstring), so forward stats match XLA's
bf16-effective matmuls tightly while backward contractions carry ~2e-4
relative error vs exact-f32 math.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

FAILED = False


def emit(check: str, ok: bool, **fields) -> None:
    global FAILED
    FAILED |= not ok
    print(json.dumps({"check": check, "pass": bool(ok), **fields}), flush=True)


def rel_err(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-6)
    return float(np.max(np.abs(a - b) / denom))


def _embeddings(b: int, d: int, key) -> tuple[jax.Array, jax.Array]:
    """L2-normalized tower-output-like embeddings (the kernels' real input
    distribution — raw normals would inflate logsumexp ranges)."""
    kn, kc = jax.random.split(key)
    n = jax.random.normal(kn, (b, d), jnp.float32)
    c = jax.random.normal(kc, (b, d), jnp.float32)
    n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    return n, c


def check_fused_stats(b: int = 8192, d: int = 128) -> None:
    from jodalrob_twotower_tpu.ops.fused_logits import fused_stats

    n, c = _embeddings(b, d, jax.random.PRNGKey(0))
    tau = 0.3
    got = jax.device_get(fused_stats(n, c, temperature=tau))
    want = jax.device_get(fused_stats(n, c, temperature=tau, force_xla=True))
    errs = {f: rel_err(getattr(got, f), getattr(want, f))
            for f in ("row_lse", "row_sum", "diag", "col_lse", "col_sum")}
    rank_mismatch = int(np.sum(got.rank != want.rank))
    # per-field gates: sums over B near-zero-mean bf16 similarities cancel
    # (error grows ~sqrt(B) in ulps — 2e-2 covers B=65536); the lse/diag
    # surface stays tight. Ranks can differ where two scores tie at bf16
    # precision; allow a whisker.
    gate = {"row_sum": 2e-2, "col_sum": 2e-2}
    ok = all(e < gate.get(f, 5e-3) for f, e in errs.items()) and (
        rank_mismatch <= b * 0.001
    )
    tag = f"_b{b}" if b != 8192 else ""
    emit(f"fused_stats_vs_xla{tag}", ok,
         errs={f: round(e, 6) for f, e in errs.items()},
         rank_mismatches=rank_mismatch, b=b, d=d)


def check_blocked_large(b: int = 32768, d: int = 128) -> None:
    """Beyond-XLA batch: at B=32768 the materializing reference cannot run
    ([B, B] f32 blobs; BENCHMARKS.md fused_ce_paths), so cross-check the two
    INDEPENDENT blocked kernels against each other (stats vs lean forward)
    and assert the smoothing loss + grads stay finite."""
    from jodalrob_twotower_tpu.ops.fused_logits import (
        _fused_lean_blocked_call,
        fused_bidirectional_ce,
        fused_stats,
    )

    n, c = _embeddings(b, d, jax.random.PRNGKey(4))
    tau = 0.3
    stats = fused_stats(n, c, temperature=tau)
    row_lean, col_lean = _fused_lean_blocked_call(n / tau, c)
    err = max(rel_err(jax.device_get(stats.row_lse), jax.device_get(row_lean)),
              rel_err(jax.device_get(stats.col_lse), jax.device_get(col_lean)))
    emit(f"blocked_stats_vs_lean_b{b}", bool(err < 1e-5), max_rel_err=err, b=b)

    loss, (gn, gc) = jax.value_and_grad(
        lambda a, bb: fused_bidirectional_ce(a, bb, tau, 0.1), argnums=(0, 1)
    )(n, c)
    finite = bool(np.isfinite(float(loss))) and bool(
        jnp.all(jnp.isfinite(gn)) & jnp.all(jnp.isfinite(gc))
    )
    # sanity: smoothing CE at B with near-random towers ~ log(B) +- a bit
    sane = abs(float(loss) - np.log(b)) < 2.0
    emit(f"blocked_smoothing_finite_b{b}", finite and sane,
         loss=round(float(loss), 4), b=b)


def check_fused_ce_grads(b: int = 8192, d: int = 128, eps: float = 0.0) -> None:
    from jodalrob_twotower_tpu.ops.fused_logits import fused_bidirectional_ce
    from jodalrob_twotower_tpu.train.loss import bidirectional_ce_loss

    n, c = _embeddings(b, d, jax.random.PRNGKey(1))
    tau = 0.3

    def fused(n, c):
        return fused_bidirectional_ce(n, c, tau, eps)

    def xla(n, c):
        return bidirectional_ce_loss(n, c, temperature=tau, label_smoothing=eps)[0]

    (lf, (gn_f, gc_f)) = jax.value_and_grad(fused, argnums=(0, 1))(n, c)
    (lx, (gn_x, gc_x)) = jax.value_and_grad(xla, argnums=(0, 1))(n, c)
    loss_err = rel_err(jax.device_get(lf), jax.device_get(lx))
    g_err = max(rel_err(jax.device_get(gn_f), jax.device_get(gn_x)),
                rel_err(jax.device_get(gc_f), jax.device_get(gc_x)))
    # grads: bf16 residual contraction => ~2e-4 typical, 5e-2 max elementwise
    # on near-zero entries; compare on norms too
    gn_norm = float(jnp.linalg.norm(gn_f - gn_x) / jnp.linalg.norm(gn_x))
    ok = loss_err < 1e-3 and gn_norm < 1e-2
    tag = f"_b{b}" if b != 8192 else ""
    emit(f"fused_ce_grads_vs_xla_eps{eps}{tag}", ok, loss_rel_err=loss_err,
         grad_norm_rel_err=gn_norm, grad_max_rel_err=g_err, b=b, d=d)

    if eps == 0.0:
        # the unshifted lean forward (max_abs_logit bound — the production
        # path for unit-norm towers) must agree with the shifted kernel ON
        # HARDWARE, not just in interpret mode
        l_nomax = float(fused_bidirectional_ce(n, c, tau, 0.0, False, 1.0 / tau))
        err = rel_err(np.asarray(l_nomax), jax.device_get(lf))
        emit(f"fused_ce_lean_nomax_vs_shifted{tag}", bool(err < 1e-5),
             loss_rel_err=float(err), b=b, d=d)


def check_manual_fused_ce(b: int = 8192, d: int = 128) -> None:
    """make_manual_fused_ce (the per-shard custom_vjp form the compressed-DP
    steps call INSIDE their shard_map, round 5) on hardware: loss + grads
    from within a 1-device-mesh shard_map must match the single-device
    fused CE (same kernels, degenerate collectives)."""
    from jax.sharding import PartitionSpec as P

    from jodalrob_twotower_tpu.ops.fused_logits import (
        fused_bidirectional_ce,
        make_manual_fused_ce,
    )
    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS, make_mesh

    n, c = _embeddings(b, d, jax.random.PRNGKey(9))
    tau = 0.3
    mesh = make_mesh(jax.devices()[:1])
    manual = make_manual_fused_ce(DATA_AXIS, temperature=tau,
                                  max_abs_logit=1.0 / tau)

    def core(nl, cl):
        return jax.value_and_grad(manual, argnums=(0, 1))(nl, cl)

    sm = jax.jit(jax.shard_map(
        core, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), (P(DATA_AXIS), P(DATA_AXIS))), check_vma=False,
    ))
    lm, (gn_m, gc_m) = sm(n, c)

    def single(nn, cc):
        return fused_bidirectional_ce(nn, cc, tau, 0.0, False, 1.0 / tau)

    ls, (gn_s, gc_s) = jax.value_and_grad(single, argnums=(0, 1))(n, c)
    loss_err = rel_err(jax.device_get(lm), jax.device_get(ls))
    gn_norm = float(jnp.linalg.norm(gn_m - gn_s) / jnp.linalg.norm(gn_s))
    gc_norm = float(jnp.linalg.norm(gc_m - gc_s) / jnp.linalg.norm(gc_s))
    ok = loss_err < 1e-4 and gn_norm < 1e-2 and gc_norm < 1e-2
    emit("manual_fused_ce_vs_single_device", ok, loss_rel_err=loss_err,
         gn_norm_rel_err=gn_norm, gc_norm_rel_err=gc_norm, b=b, d=d)


def check_dense_table_grad(b: int = 8192, k: int = 32) -> None:
    from jodalrob_twotower_tpu.models.embedding import table_layout, tile_feature_map
    from jodalrob_twotower_tpu.ops.embedding_grad import dense_table_grad

    vocabs = tuple([1000] * k)
    offsets, total = table_layout(vocabs)
    key = jax.random.PRNGKey(2)
    ids = jax.random.randint(key, (b, k), 0, 1000) + jnp.asarray(offsets)[None, :]
    g = jax.random.normal(jax.random.fold_in(key, 1), (b, k, 32), jnp.float32)
    got = dense_table_grad(ids, g, total_rows=total,
                           tile_feature=tuple(tile_feature_map(vocabs).tolist()))
    # XLA scatter reference
    flat_ids = ids.reshape(-1)
    want = jnp.zeros((total, 32), jnp.float32).at[flat_ids].add(g.reshape(-1, 32))
    err = float(jnp.linalg.norm(got - want) / jnp.maximum(jnp.linalg.norm(want), 1e-9))
    ok = err < 2e-2  # bf16 one-hot matmul vs f32 scatter
    emit("dense_table_grad_vs_scatter", ok, norm_rel_err=err, b=b, k=k, rows=int(total))

    # transposed-output (MXU-N-major) kernel: must match the standard one
    # bit-for-bit on hardware (same bf16 contraction, flipped orientation)
    from jodalrob_twotower_tpu.ops.embedding_grad import dense_table_grad_t

    got_t = dense_table_grad_t(ids, g, total_rows=total,
                               tile_feature=tuple(tile_feature_map(vocabs).tolist())).T
    exact = bool(jnp.all(got_t == got))
    emit("dense_table_grad_t_bitexact_vs_standard", exact, b=b, k=k, rows=int(total))

    # NOTE: the B-major-input kernel experiment (dense_table_grad_bmajor,
    # VERDICT r4 #5b) is deliberately NOT selftested on hardware: it is
    # VMEM-infeasible at this shape (lane-padding 4x — see the measured
    # reject in ops/embedding_grad.py / BENCHMARKS.md); its bit-exactness
    # vs the t-kernel is covered in interpret mode by
    # tests/test_embedding_grad.py.


def check_onehot_lookup(b: int = 8192, k: int = 32) -> None:
    """One-hot MXU forward lookup (VERDICT r3 #2) vs the row-DMA gather:
    must be BIT-exact on hardware (one-hot matmul contributes each row's
    bf16 value exactly once; other tiles add true zeros)."""
    from jodalrob_twotower_tpu.models.embedding import table_layout, tile_feature_map
    from jodalrob_twotower_tpu.ops.embedding_grad import dense_table_lookup_t

    vocabs = tuple([1000] * k)
    offsets, total = table_layout(vocabs)
    key = jax.random.PRNGKey(5)
    ids = jax.random.randint(key, (b, k), 0, 1000) + jnp.asarray(offsets)[None, :]
    table = jax.random.normal(jax.random.fold_in(key, 1), (total, 32), jnp.float32)
    got = dense_table_lookup_t(
        table, ids, total_rows=total,
        tile_feature=tuple(tile_feature_map(vocabs).tolist()),
    )  # [K, D, B]
    want = jnp.take(table.astype(jnp.bfloat16), ids, axis=0)  # [B, K, D]
    exact = bool(jnp.all(jnp.transpose(got, (2, 0, 1)) == want))
    emit("onehot_lookup_bitexact_vs_gather", exact, b=b, k=k, rows=int(total))


def check_pallas_gather(n_rows: int = 100_000, d: int = 128, b: int = 8192) -> None:
    from jodalrob_twotower_tpu.ops.embedding_lookup import (
        _pallas_gather_flat,
        embedding_lookup_xla,
    )

    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (n_rows, d), jnp.float32)
    rows = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, n_rows)
    got = jax.device_get(_pallas_gather_flat(table, rows))
    want = jax.device_get(jnp.take(table, rows, axis=0))
    ok = bool(np.array_equal(got, want))
    emit("pallas_gather_vs_take", ok, exact=ok, rows=b)


def check_sampled_step_determinism() -> None:
    """Two identical sampled dispatches from copied states agree bitwise."""
    from jodalrob_twotower_tpu.config import LossConfig, ModelConfig, OptimizerConfig, TrainConfig
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.train.train_step import (
        create_train_state,
        device_store,
        make_sampled_train_steps,
    )

    cfg = TrainConfig(model=ModelConfig(), loss=LossConfig(use_fused_logits=True),
                      optimizer=OptimizerConfig())
    ds = make_synthetic_dataset(n_notices=5000, n_companies=5000, n_pairs=20000, seed=0)
    model = TwoTowerModel(ds.schema, cfg.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:1024])
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 100)
    steps = make_sampled_train_steps(model, cfg, tx, 4, 1024, donate=False)
    n_store, c_store = device_store(ds.notice_store), device_store(ds.company_store)
    pairs = jax.device_put(ds.pairs.astype(np.int32))
    _, m1 = steps(state, jax.random.PRNGKey(7), pairs, n_store, c_store)
    _, m2 = steps(state, jax.random.PRNGKey(7), pairs, n_store, c_store)
    l1, l2 = jax.device_get(m1["loss"]), jax.device_get(m2["loss"])
    ok = bool(np.array_equal(l1, l2)) and bool(np.all(np.isfinite(l1)))
    emit("sampled_step_deterministic", ok, losses=[round(float(x), 6) for x in l1])


def main() -> None:
    print(f"devices: {jax.devices()}", file=sys.stderr)
    check_fused_stats()
    check_fused_stats(b=16384)       # col-blocked STATS kernel (B > VMEM cap)
    check_fused_ce_grads(eps=0.0)    # lean kernel path
    check_fused_ce_grads(eps=0.1)    # full stats path + smoothing
    check_fused_ce_grads(b=16384, eps=0.0)  # col-blocked lean kernels
    check_fused_ce_grads(b=16384, eps=0.1)  # col-blocked stats fwd + eps bwd
    check_blocked_large()            # B=32768: beyond the XLA reference
    check_manual_fused_ce()          # compressed-DP's in-shard_map CE form
    check_dense_table_grad()
    check_onehot_lookup()
    check_pallas_gather()
    check_sampled_step_determinism()
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
