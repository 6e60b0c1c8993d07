"""True multi-process validation of the multi-host training path.

BASELINE config 4 asks for a 2+ host pod slice. No multi-host TPU is
attached to this sandbox, so this harness runs the REAL multi-process
recipe on CPU: N separate processes, `jax.distributed.initialize` over a
local coordinator, a global mesh spanning all processes' devices, each
process feeding only its own pair shard (`host_shard_pairs`) assembled into
globally-sharded batches (`host_local_batch_to_global`) — exactly what a
pod slice runs, minus the ICI. Verifies:

  * the global device count is processes x local devices;
  * the sharded train step executes and the loss is finite and IDENTICAL
    on every process (replicated output of a global computation);
  * embedding tables are row-sharded across the global mesh.

Usage:
  python scripts/multihost_smoke.py              # spawn 2 workers + report
  python scripts/multihost_smoke.py --worker I N # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

COORD = "localhost:12355"
LOCAL_DEVICES = 4
BATCH = 64


def worker(process_id: int, num_processes: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from jodalrob_twotower_tpu.parallel.distributed import (
        host_local_batch_to_global,
        host_shard_pairs,
        initialize,
        process_info,
    )

    initialize(COORD, num_processes, process_id)
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from jodalrob_twotower_tpu.config import (
        DataConfig,
        LossConfig,
        MeshConfig,
        ModelConfig,
        OptimizerConfig,
        TrainConfig,
    )
    from jodalrob_twotower_tpu.data.pipeline import assemble_pair_batch
    from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset
    from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel
    from jodalrob_twotower_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from jodalrob_twotower_tpu.parallel.sharded_train import make_sharded_train

    idx, count = process_info()
    assert count == num_processes, (idx, count)
    n_global = len(jax.devices())
    assert n_global == num_processes * LOCAL_DEVICES, n_global

    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8, dense_projection_dim=16,
            tower_hidden_dims=(32, 16), final_embedding_dim=8,
            dropout_rate=0.0, compute_dtype="float32", use_batch_norm=False,
        ),
        loss=LossConfig(temperature=0.5, use_fused_logits=False),
        optimizer=OptimizerConfig(learning_rate=1e-2),
        data=DataConfig(batch_size=BATCH),
        # pin row-sharding: this smoke asserts each host holds half the
        # table rows ("auto" would replicate these tiny test vocabs)
        mesh=MeshConfig(embedding_sharding="gspmd_rows"),
    )
    # every process generates the same dataset (same seed), then keeps its shard
    ds = make_synthetic_dataset(seed=0, n_notices=512, n_companies=512, n_pairs=2048)
    my_pairs = host_shard_pairs(ds.pairs)
    assert len(my_pairs) == len(ds.pairs) // count

    model = TwoTowerModel(ds.schema, cfg.model)
    mesh = make_mesh(jax.devices())
    # example batch: the local slice of the global batch
    local_b = BATCH // count
    example_local = assemble_pair_batch(ds.notice_store, ds.company_store, my_pairs[:local_b])
    example = host_local_batch_to_global(mesh, P(DATA_AXIS), example_local)
    state, train_step, _ = make_sharded_train(model, cfg, mesh, example, total_steps=10)

    losses = []
    for step in range(3):
        rows = my_pairs[step * local_b : (step + 1) * local_b]
        local = assemble_pair_batch(ds.notice_store, ds.company_store, rows)
        gbatch = host_local_batch_to_global(mesh, P(DATA_AXIS), local)
        state, metrics = train_step(state, gbatch)
        losses.append(float(metrics["loss"]))
    table = state.params["notice_tower"]["embeddings"]["table"]
    local_rows = sum(s.data.shape[0] for s in table.addressable_shards)

    # the shard_mapped FUSED CE (all_gather + col-lse merge + psum_scatter)
    # across PROCESSES: one fused step must equal the XLA step's first loss
    import dataclasses

    cfg_f = cfg.replace(loss=dataclasses.replace(cfg.loss, use_fused_logits=True))
    state_f, step_f, _ = make_sharded_train(model, cfg_f, mesh, example, total_steps=10)
    first_local = assemble_pair_batch(
        ds.notice_store, ds.company_store, my_pairs[:local_b]
    )
    gbatch_f = host_local_batch_to_global(mesh, P(DATA_AXIS), first_local)
    _, metrics_f = step_f(state_f, gbatch_f)
    fused_loss = float(metrics_f["loss"])

    # ---- streaming Trainer across processes (VERDICT r2 #5) ---------------
    # Drive Trainer.train_streaming end-to-end: per-host parquet sharding
    # (host_index/host_count, data/parquet_stream.py lockstep invariant) +
    # the shard_mapped fused CE over the global mesh. Every process streams
    # only ITS rows; put_idx assembles the global batch from process-local
    # shards (parallel/sharded_train.py make_array_from_process_local_data).
    import tempfile

    from jodalrob_twotower_tpu.data.parquet_dataset import save_pairs_parquet
    from jodalrob_twotower_tpu.data.parquet_stream import (
        stream_pair_chunks,
        streaming_index_batches,
    )
    from jodalrob_twotower_tpu.train.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix=f"mh_stream_{idx}_")
    pair_file = os.path.join(tmp, "pairs.parquet")
    save_pairs_parquet(
        pair_file,
        ds.notice_store.keys[ds.pairs[:, 0]],
        ds.company_store.keys[ds.pairs[:, 1]],
    )

    # lockstep invariant first: every host gets the SAME number of batches
    # (unequal counts would deadlock the mesh collectives mid-epoch).
    # cfg.data.batch_size is the GLOBAL batch; each host streams
    # BATCH // count rows per step (Trainer.train_streaming divides).
    def batch_count() -> int:
        src = streaming_index_batches(
            stream_pair_chunks(
                pair_file, ds.notice_store, ds.company_store,
                chunk_rows=512, host_index=idx, host_count=count,
            ),
            BATCH // count, seed=1,
        )
        return sum(1 for _ in src)

    my_batches = batch_count()

    cfg_stream = cfg_f.replace(results_csv="")
    trainer = Trainer(
        cfg_stream, ds.schema, ds.notice_store, ds.company_store,
        mesh=mesh, log_fn=lambda s: None,
    )
    result = trainer.train_streaming(
        pair_file,
        np.empty((0, 2), np.int64),  # train-path invariants are the target
        steps_per_epoch=my_batches,
        host_index=idx,
        host_count=count,
        chunk_rows=512,
        corpus_eval=False,
    )
    stream_loss = result.history[-1]["train_loss"]

    # ---- compressed-DP Trainer across processes (VERDICT r3 #1) -----------
    # the DCN scenario grad_compression exists for: dense grads cross the
    # process boundary as int8-quantized int16-psum wire traffic with
    # per-worker error-feedback residuals (parallel/compressed_grads.py)
    cfg_c = cfg.replace(
        results_csv="",
        mesh=dataclasses.replace(cfg.mesh, grad_compression="int16"),
    )
    trainer_c = Trainer(
        cfg_c, ds.schema, ds.notice_store, ds.company_store,
        mesh=mesh, log_fn=lambda s: None,
    )
    res_c = trainer_c.train(
        ds.pairs[:1024], np.empty((0, 2), np.int64), corpus_eval=False
    )
    compressed_loss = float(res_c.history[-1]["train_loss"])

    # ---- compressed-DP x GLOBAL negatives across processes (round 5) -----
    # the manual fused CE (ops/fused_logits.make_manual_fused_ce) inside
    # the compressed shard_map, with the candidate set spanning BOTH
    # processes' batch shards: its loss must match the GSPMD global-
    # negatives step on the same first batch
    cfg_cg = cfg.replace(
        results_csv="",
        mesh=dataclasses.replace(
            cfg.mesh, grad_compression="none", compressed_negatives="global"
        ),
    )
    from jodalrob_twotower_tpu.parallel.compressed_grads import (
        make_dp_compressed_indexed_train,
    )

    cdp = make_dp_compressed_indexed_train(model, cfg_cg, mesh, example, 10,
                                           method="none")
    n_cg = cdp.put_store((np.asarray(ds.notice_store.dense),
                          np.asarray(ds.notice_store.cat_ids)))
    c_cg = cdp.put_store((np.asarray(ds.company_store.dense),
                          np.asarray(ds.company_store.cat_ids)))
    # same first-batch rows as the GSPMD leg: each process feeds its slice
    local_idx = my_pairs[:local_b].astype(np.int32)
    _, _, m_cg = cdp.single_step(
        cdp.state, cdp.err_state, cdp.put_idx(local_idx), n_cg, c_cg
    )
    compressed_global_loss = float(m_cg["loss"])

    # ---- rows-sharded store across processes (ADVICE r4 low #3) ----------
    # put_row_sharded_store's multi-process branch assembles the global
    # array via make_array_from_callback (each process uploads only its
    # addressable row shards); the explicit exchange must still be exactly
    # a gather against the full host matrix.
    from jax.sharding import NamedSharding
    from jodalrob_twotower_tpu.parallel.mesh import put_replicated
    from jodalrob_twotower_tpu.parallel.sharded_store import (
        make_tower_batch_gather,
        put_row_sharded_store,
    )

    rstore = put_row_sharded_store(
        (np.asarray(ds.notice_store.dense), np.asarray(ds.notice_store.cat_ids)),
        mesh,
    )
    rows_local = sum(s.data.shape[0] for s in rstore[0].addressable_shards)
    sgather = make_tower_batch_gather(mesh)
    probe = (np.arange(BATCH, dtype=np.int32) * 37) % len(ds.notice_store)
    tb = sgather(rstore, put_replicated(probe, mesh))
    rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    got_dense = np.asarray(rep(tb.dense).addressable_shards[0].data)
    got_cat = np.asarray(rep(tb.cat_ids).addressable_shards[0].data)
    store_gather_exact = bool(
        np.array_equal(got_dense, np.asarray(ds.notice_store.dense)[probe])
        and np.array_equal(got_cat, np.asarray(ds.notice_store.cat_ids)[probe])
    )

    print(json.dumps({
        "process": idx, "processes": count, "global_devices": n_global,
        "losses": [round(l, 6) for l in losses],
        "fused_loss": round(fused_loss, 6),
        "fused_matches_xla": bool(abs(fused_loss - losses[0]) < 1e-3),
        "table_rows_global": table.shape[0],
        "table_rows_on_this_host": int(local_rows),
        "stream_batches": int(my_batches),
        "stream_loss": round(float(stream_loss), 6),
        "stream_finite": bool(np.isfinite(stream_loss)),
        "compressed_loss": round(compressed_loss, 6),
        "compressed_finite": bool(np.isfinite(compressed_loss)),
        "store_rows_on_this_host": int(rows_local),
        "store_rows_global": int(rstore[0].shape[0]),
        "store_gather_exact": store_gather_exact,
        "compressed_global_loss": round(compressed_global_loss, 6),
        "compressed_global_matches_gspmd": bool(
            abs(compressed_global_loss - losses[0]) < 1e-3
        ),
    }), flush=True)


def main() -> int:
    n = 2
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i), str(n)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(n)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            print(err[-3000:], file=sys.stderr)
            return 1
        outs.append(json.loads([l for l in out.splitlines() if l.startswith("{")][-1]))
    # every process must see the same global losses
    assert outs[0]["losses"] == outs[1]["losses"], outs
    assert outs[0]["global_devices"] == n * LOCAL_DEVICES
    # the shard_mapped fused CE agreed with the XLA loss on both processes
    assert all(o["fused_matches_xla"] for o in outs), outs
    # tables row-sharded: each host holds half the rows
    assert outs[0]["table_rows_on_this_host"] * n == outs[0]["table_rows_global"]
    # streaming Trainer: equal per-host batch counts (the lockstep
    # invariant that prevents mesh hangs) and identical replicated losses
    assert outs[0]["stream_batches"] == outs[1]["stream_batches"] > 0, outs
    assert outs[0]["stream_loss"] == outs[1]["stream_loss"], outs
    assert all(o["stream_finite"] for o in outs), outs
    # compressed-DP: identical replicated loss on both processes (the
    # int16 psum'd gradient is applied identically everywhere) and finite
    assert outs[0]["compressed_loss"] == outs[1]["compressed_loss"], outs
    assert all(o["compressed_finite"] for o in outs), outs
    # rows-sharded store: each host holds half the rows and the explicit
    # exchange equals a host-side gather (multi-process placement path)
    assert outs[0]["store_rows_on_this_host"] * n == outs[0]["store_rows_global"]
    assert all(o["store_gather_exact"] for o in outs), outs
    # compressed-DP with GLOBAL negatives: the manual fused CE's candidate
    # set spans both processes and matches the GSPMD loss, identically on
    # every process
    assert all(o["compressed_global_matches_gspmd"] for o in outs), outs
    assert outs[0]["compressed_global_loss"] == outs[1]["compressed_global_loss"], outs
    print(json.dumps({"bench": "multihost_smoke", "ok": True, **outs[0]}))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        raise SystemExit(main())
