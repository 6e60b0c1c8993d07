"""Sharded-serving regression bench on the 8-virtual-device CPU mesh.

Records ShardedIndex's full step math — per-shard scoring (+ optional
approx select and rescore), O(ndev·k) candidate all-gather, replicated
merge — as wall time and recall-vs-exact on the virtual mesh, so multi-chip
serving has a regression line before real multi-chip hardware exists
(VERDICT r1 item 10). CPU wall times are NOT TPU predictions; the value is
(a) the sharded program compiles+executes end-to-end and (b) recall of the
sharded merge equals the single-device index's.

Run directly (forces the CPU backend with 8 virtual devices) or via
``python bench_suite.py serving_sharded_mesh`` (subprocess).
"""

from __future__ import annotations

import json
import os
import time

N_DEV = 8


def _force_cpu() -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    _force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jodalrob_twotower_tpu.parallel.mesh import make_mesh
    from jodalrob_twotower_tpu.serving.index import (
        BruteForceIndex,
        ShardedIndex,
        recall_vs_exact,
    )

    assert len(jax.devices()) >= N_DEV
    mesh = make_mesh(jax.devices()[:N_DEV])

    n_corpus, d, n_q, k = 200_000, 128, 1024, 100
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n_corpus, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(n_q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    exact_ref = BruteForceIndex(corpus).search(queries, k=k)

    for kind, kwargs in (
        ("exact", {}),
        ("int8", {}),
        ("int8_rescore", {"kind": "int8", "rescore_depth": 400,
                          "rescore_dtype": "bfloat16"}),
    ):
        idx = ShardedIndex(
            corpus, mesh, kind=kwargs.pop("kind", kind), **kwargs
        )
        res = idx.search(queries, k=k)  # compile + run
        t0 = time.perf_counter()
        res = idx.search(queries, k=k)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "bench": f"serving_sharded_mesh_{kind}",
            "backend": "cpu_virtual_mesh",
            "n_devices": N_DEV,
            "corpus_size": n_corpus,
            "k": k,
            "wall_ms_per_1024q": round(dt * 1e3, 1),
            "recall_vs_exact_at100": round(recall_vs_exact(res, exact_ref), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
