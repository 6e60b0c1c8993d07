"""Microbench: cotangent-relayout absorption in the emb-grad kernel
(VERDICT r4 #5b).

Compares, at the flagship shape (B=8192, K=32, D=32, 33k rows), starting
from the tower's NATIVE [B, K, D] f32 cotangent each iteration:

  t_kernel — XLA [B,K,D]→[K,D,B] relayout (the in-step `copy.65` cost)
             + dense_table_grad_t (lane-dim contraction)
  bmajor   — dense_table_grad_bmajor: free bitcast-reshape to [B, K·D],
             sublane-dim contraction inside the kernel, NO relayout

Methodology (CLAUDE.md): 16-iteration lax.scan per dispatch with a
carry-dependent input (no LICM), value fetch as the barrier, several
dispatches. Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from jodalrob_twotower_tpu.models.embedding import table_layout, tile_feature_map
from jodalrob_twotower_tpu.ops.embedding_grad import (
    _dense_table_grad,
    dense_table_grad_bmajor,
)

B, K, D = 8192, 32, 32
N_INNER, N_DISPATCH = 16, 12


def main() -> None:
    vocabs = tuple([1000] * K)
    offsets, total = table_layout(vocabs)
    tf = tuple(tile_feature_map(vocabs).tolist())
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (B, K), 0, 1000) + jnp.asarray(
        np.asarray(offsets)
    )[None, :]
    g0 = jax.random.normal(jax.random.fold_in(key, 1), (B, K, D), jnp.float32)

    def variant(fn):
        def steps(g, ids):
            def body(carry, _):
                out = fn(ids, carry)  # [D, R] f32
                # next input depends on the output (scalar broadcast), so
                # the scan body cannot be hoisted or dead-code-eliminated
                nxt = carry + 1e-6 * out[0, 0]
                return nxt, out[0, 0]
            return jax.lax.scan(body, g, None, length=N_INNER)

        return jax.jit(steps)

    fns = {
        "t_kernel_plus_relayout": lambda ids, g: _dense_table_grad(
            ids, g, total_rows=total, tile_feature=tf, transposed=True
        ),
        "bmajor_no_relayout": lambda ids, g: dense_table_grad_bmajor(
            ids, g, total_rows=total, tile_feature=tf
        ),
    }
    for name, fn in fns.items():
        run = variant(fn)
        try:
            g, out = run(g0, ids)
            float(out[-1])  # compile + barrier
        except Exception as e:  # noqa: BLE001 — report the structural reject
            # expected for bmajor at the flagship shape: Mosaic pads the
            # 32-lane feature stripe to 128 lanes, 4x-ing VMEM past the
            # 16 MB scoped limit (the documented reject, BENCHMARKS.md)
            msg = str(e)
            print(json.dumps({
                "bench": f"embgrad_{name}", "compile_error": msg[:200],
                "vmem_oom": "vmem" in msg.lower(), "b": B, "k": K, "d": D,
            }), flush=True)
            continue
        t0 = time.perf_counter()
        for i in range(N_DISPATCH):
            g, out = run(g, ids)
        v = float(out[-1])
        dt = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e3
        print(json.dumps({
            "bench": f"embgrad_{name}", "ms_per_call": round(dt, 4),
            "b": B, "k": K, "d": D, "rows": int(total), "probe": round(v, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
