"""Microbench: top-k strategies for chunk-scanned MIPS on this chip.

Isolates the per-chunk candidate-selection cost in serving/index.py's
_scanned_topk: matmul alone, matmul+lax.top_k, matmul+approx_max_k, and a
max-pool prefilter. Value-fetch barriers per CLAUDE.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

Q, C, D, K = 1024, 262_144, 128, 100

rng = np.random.default_rng(0)
q = jax.device_put(rng.normal(size=(Q, D)).astype(np.float32))
corpus = jax.device_put(rng.normal(size=(C, D)).astype(np.float32))


def timeit(name, fn, n=10):
    out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1, :1])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


@jax.jit
def mm_only(q, corpus):
    return jnp.dot(q, corpus.T, preferred_element_type=jnp.float32)


@jax.jit
def mm_topk(q, corpus):
    return jax.lax.top_k(jnp.dot(q, corpus.T, preferred_element_type=jnp.float32), K)


@jax.jit
def mm_approx(q, corpus):
    return jax.lax.approx_max_k(
        jnp.dot(q, corpus.T, preferred_element_type=jnp.float32), K
    )


@jax.jit
def mm_maxpool_topk(q, corpus):
    """Prefilter: max over groups of 8, exact top-k over C/8, then refine
    within the winning groups (upper bound on achievable with 2-phase)."""
    sims = jnp.dot(q, corpus.T, preferred_element_type=jnp.float32)
    g = 8
    pooled = sims.reshape(Q, C // g, g).max(axis=-1)
    s, gi = jax.lax.top_k(pooled, K)
    return s, gi


if __name__ == "__main__":
    timeit("matmul only", lambda: mm_only(q, corpus))
    timeit("matmul+top_k", lambda: mm_topk(q, corpus))
    timeit("matmul+approx_max_k", lambda: mm_approx(q, corpus))
    timeit("matmul+maxpool+top_k", lambda: mm_maxpool_topk(q, corpus))
    # int8 variant of the matmul
    ci8 = jax.device_put(
        np.clip(rng.normal(size=(C, D)) * 50, -127, 127).astype(np.int8)
    )

    @jax.jit
    def mm_int8(q, ci8):
        return jnp.dot(
            q.astype(jnp.bfloat16), ci8.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    timeit("matmul int8->bf16", lambda: mm_int8(q, ci8))
