"""Component profiler for the sampled train step on the real TPU.

Two modes:

* variant timing (default) — times config-toggled variants of the step so
  component costs come from measured differences, not estimates:
  ``python scripts/profile_step.py [variant ...]``
* ``--trace`` — runs 3 pipelined dispatches of the ``full`` variant under
  ``jax.profiler`` and prints the per-op device-time table ("XLA Ops"),
  which attributes every microsecond exactly.

Methodology (hard-won on the tunneled runtime — CLAUDE.md):

* throughput loops PIPELINE dispatches and fetch ONE value at the end
  (a per-dispatch fetch adds ~30 ms of tunnel round-trip each);
* every variant's scan body consumes carry-dependent inputs (params change
  each step), so XLA cannot hoist the body out of the loop (LICM);
* every variant RETURNS state whose params were updated from the computed
  quantity, so the backward cannot be dead-code-eliminated.

Measured budget for the headline config lives in BENCHMARKS.md
("Where the remaining 3.0 ms goes").
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jodalrob_twotower_tpu.config import (
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
from jodalrob_twotower_tpu.schema import reference_shaped_schema
from jodalrob_twotower_tpu.train.train_step import (
    _forward_loss,
    create_train_state,
    device_store,
    make_sampled_train_steps,
)

B = 8192
N_INNER = 16
N_DISPATCH = 20


def build(cfg_kwargs_model=None, cfg_kwargs_loss=None, cfg_kwargs_opt=None):
    # The base "full" variant is the DEFAULT TrainConfig — on the TPU this
    # profiler targets, the "auto" knobs (fused CE, rbg dropout, one-hot
    # lookup, bf16 stores) resolve to exactly the headline-bench path
    # (bench.flagship_config); toggles measure deltas from that default.
    return TrainConfig(
        model=ModelConfig(**(cfg_kwargs_model or {})),
        loss=LossConfig(**(cfg_kwargs_loss or {})),
        optimizer=OptimizerConfig(**(cfg_kwargs_opt or {})),
    )


def setup_data():
    """Config-independent: synthetic dataset + device-resident stores.
    Built ONCE — regenerating per variant re-uploads ~600 MB over the
    ~100 MB/s host link."""
    schema = reference_shaped_schema()
    ds = make_synthetic_dataset(
        schema, n_notices=100_000, n_companies=100_000, n_pairs=400_000,
        n_clusters=256, seed=0,
    )
    # stores at the default-resolved dtype (device_store_dtype="auto" =
    # the bf16 compute dtype), matching bench.py's headline path
    n_store = device_store(ds.notice_store, dtype=jnp.bfloat16)
    c_store = device_store(ds.company_store, dtype=jnp.bfloat16)
    pairs_dev = jax.device_put(ds.pairs.astype(np.int32))
    return ds, n_store, c_store, pairs_dev


def setup_state(cfg, ds):
    model = TwoTowerModel(ds.schema, cfg.model)
    warm = assemble_pair_batch(ds.notice_store, ds.company_store, ds.pairs[:B])
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), warm, 1000)
    return model, state, tx


def timeit(name, fn, state, *args):
    state = jax.tree.map(jnp.copy, state)  # donation-safe fresh buffers
    t0 = time.perf_counter()
    state2, out = fn(state, jax.random.PRNGKey(99), *args)
    float(np.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(N_DISPATCH):
        state2, out = fn(state2, jax.random.fold_in(jax.random.PRNGKey(7), i), *args)
    v = float(np.asarray(out).ravel()[0])
    elapsed = time.perf_counter() - t0
    per_step_ms = elapsed / (N_DISPATCH * N_INNER) * 1e3
    print(f"{name:24s} {per_step_ms:7.3f} ms/step   (compile {compile_s:5.1f}s, probe {v:.4f})", flush=True)
    return per_step_ms


def gather_batch(pair_idx, n_store, c_store):
    n_dense, n_cat = n_store
    c_dense, c_cat = c_store
    return PairBatch(
        notice=TowerBatch(dense=jnp.take(n_dense, pair_idx[:, 0], axis=0),
                          cat_ids=jnp.take(n_cat, pair_idx[:, 0], axis=0)),
        company=TowerBatch(dense=jnp.take(c_dense, pair_idx[:, 1], axis=0),
                           cat_ids=jnp.take(c_cat, pair_idx[:, 1], axis=0)),
    )


def make_full_step(model, cfg, tx):
    """The PRODUCTION sampled multi-step — measured via the real code path
    (train_step.make_sampled_train_steps) so the profiler cannot drift from
    what bench.py and the Trainer run. Output adapted to timeit's (state,
    array) contract."""
    steps = make_sampled_train_steps(model, cfg, tx, N_INNER, B)

    def fn(state, key, pairs_dev, n_store, c_store):
        state, metrics = steps(state, key, pairs_dev, n_store, c_store)
        return state, metrics["loss"]

    return fn


def make_variant(model, cfg, tx, mode):
    """Ablations of the step body: fwd_only | no_opt | gather_only |
    sample_only (plus 'full' for config-toggle variants, equivalent to the
    production step)."""

    def steps_fn(state, sample_key, pairs_dev, notice_store, company_store):
        n_pairs = pairs_dev.shape[0]

        def body(carry, _):
            key = jax.random.fold_in(sample_key, carry.step)
            rows = jax.random.randint(key, (B,), 0, n_pairs)
            if mode == "sample_only":
                delta = jnp.sum(rows).astype(jnp.float32) * 1e-20
                new_params = jax.tree.map(lambda p: p + delta, carry.params)
                carry = carry.replace(step=carry.step + 1, params=new_params)
                return carry, delta
            pair_idx = jnp.take(pairs_dev, rows, axis=0)
            batch = gather_batch(pair_idx, notice_store, company_store)
            if mode == "gather_only":
                probe = (jnp.sum(batch.notice.dense) + jnp.sum(batch.company.dense)
                         + jnp.sum(batch.notice.cat_ids) + jnp.sum(batch.company.cat_ids)).astype(jnp.float32)
                new_params = jax.tree.map(lambda p: p + probe * 1e-20, carry.params)
                carry = carry.replace(step=carry.step + 1, params=new_params)
                return carry, probe
            dropout_rng = jax.random.fold_in(carry.rng, carry.step)

            def loss_fn(params):
                return _forward_loss(model, cfg, params, carry.batch_stats, batch,
                                     dropout_rng, train=True)

            if mode == "fwd_only":
                loss, (_, _, _, new_bs) = loss_fn(carry.params)
                new_params = jax.tree.map(lambda p: p + loss * 1e-20, carry.params)
                carry = carry.replace(step=carry.step + 1, params=new_params,
                                      batch_stats=new_bs)
                return carry, loss
            (loss, (_, _, _, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(carry.params)
            if mode == "no_opt":
                new_params = jax.tree.map(lambda p, g: p - 1e-9 * g, carry.params, grads)
                new_opt = carry.opt_state
            else:
                updates, new_opt = tx.update(grads, carry.opt_state, carry.params)
                new_params = optax.apply_updates(carry.params, updates)
            carry = carry.replace(step=carry.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
            return carry, loss

        return jax.lax.scan(body, state, None, length=N_INNER)

    return jax.jit(steps_fn, donate_argnums=(0,))


VARIANTS = [
    "full",            # headline config
    "no_opt",          # - optimizer update
    "fwd_only",        # forward + loss only
    "gather_only",     # sample + batch gather only
    "sample_only",     # randint sampling only
    "no_dropout",      # full, dropout_rate=0
    "threefry_dropout",  # full, dropout masks from threefry VPU rounds
                       # (the pre-round-5 default; "full" now resolves
                       # auto->rbg on TPU, so this is the control)
    "no_bn",           # full, use_batch_norm=False
    "xla_loss",        # full, use_fused_logits=False
    "scatter_grad",    # full, embedding_grad=scatter
    "bf16_mu",         # full, AdamW first moment stored bf16
    "onehot_lookup",   # full, embedding_lookup=onehot (one-hot MXU forward)
    "gather_lookup",   # full, embedding_lookup=gather (row-DMA forward —
                       # the pre-round-4 default, kept as the control)
]

_MODEL_TOGGLES = {"no_dropout": {"dropout_rate": 0.0},
                  "threefry_dropout": {"dropout_rng_impl": "threefry"},
                  "no_bn": {"use_batch_norm": False},
                  "scatter_grad": {"embedding_grad": "scatter"},
                  "onehot_lookup": {"embedding_lookup": "onehot"},
                  "gather_lookup": {"embedding_lookup": "gather"}}
_LOSS_TOGGLES = {"xla_loss": {"use_fused_logits": False}}
_OPT_TOGGLES = {"bf16_mu": {"adam_moment_dtype": "bfloat16"}}


def run_variants(want):
    unknown = [n for n in want if n not in VARIANTS]
    if unknown:
        raise SystemExit(f"unknown variant(s) {unknown}; choose from {VARIANTS}")
    ds, n_store, c_store, pairs_dev = setup_data()
    base_cfg = build()
    base = setup_state(base_cfg, ds)
    for name in want:
        if name == "full":
            model, state, tx = base
            fn = make_full_step(model, base_cfg, tx)
        elif name in ("no_opt", "fwd_only", "gather_only", "sample_only"):
            model, state, tx = base
            fn = make_variant(model, base_cfg, tx, name)
        else:
            cfg = build(_MODEL_TOGGLES.get(name, {}), _LOSS_TOGGLES.get(name, {}),
                        _OPT_TOGGLES.get(name, {}))
            model, state, tx = setup_state(cfg, ds)
            fn = make_variant(model, cfg, tx, "full")
        timeit(name, fn, state, pairs_dev, n_store, c_store)


def run_trace(n_dispatch=3, top=40):
    cfg = build()
    ds, n_store, c_store, pairs_dev = setup_data()
    model, state, tx = setup_state(cfg, ds)
    fn = make_full_step(model, cfg, tx)
    state = jax.tree.map(jnp.copy, state)
    state, out = fn(state, jax.random.PRNGKey(99), pairs_dev, n_store, c_store)
    float(np.asarray(out).ravel()[0])

    tdir = tempfile.mkdtemp(prefix="step_trace_")
    jax.profiler.start_trace(tdir)
    for i in range(n_dispatch):
        state, out = fn(state, jax.random.fold_in(jax.random.PRNGKey(7), i),
                        pairs_dev, n_store, c_store)
    float(np.asarray(out).ravel()[0])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise SystemExit(
            f"profiler produced no trace.json.gz under {tdir} — "
            f"contents: {glob.glob(tdir + '/**', recursive=True)}"
        )
    path = traces[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    agg = collections.Counter()
    mod_busy = 0
    mod_lo, mod_hi = float("inf"), 0.0
    for e in ev:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            tname = str(tids.get((e["pid"], e["tid"]), e["tid"]))
            agg[(tname, e["name"][:60])] += e["dur"]
            if "Modules" in tname:  # whole-program executions on the device
                mod_busy += e["dur"]
                mod_lo = min(mod_lo, e["ts"])
                mod_hi = max(mod_hi, e["ts"] + e["dur"])
    n_steps = n_dispatch * N_INNER
    print(f"device op totals over {n_dispatch} dispatches ({n_steps} steps); trace: {path}")
    if mod_busy and mod_hi > mod_lo:
        # step-time device utilization (BASELINE criterion: >= 80%): device
        # busy executing XLA modules / wall span of the traced region. The
        # pipelined multi-step dispatch keeps the gap to dispatch latency.
        util = mod_busy / (mod_hi - mod_lo)
        print(f"device utilization over the traced span: {util:6.1%} "
              f"(busy {mod_busy/1e3:.1f} ms / span {(mod_hi-mod_lo)/1e3:.1f} ms)")
    for (tid, name), dur in agg.most_common(top):
        print(f"{dur/1e3:9.3f} ms total  {dur/1e3/n_steps:7.3f} ms/step  [{tid}] {name}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    print(f"devices: {jax.devices()}", flush=True)
    if "--trace" in args:
        run_trace()
    else:
        run_variants(args or VARIANTS)
