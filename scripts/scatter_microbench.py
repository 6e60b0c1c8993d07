"""Microbench: XLA scatter-add strategies for sparse embedding updates.

Finds the fastest way to apply 65k-row updates into a [10M, 64] table on
this chip (the cost that dominates train_scaled_sparse). Variants:

  baseline   — two .at[].add per side (table + accumulator), as shipped
  fused      — one [R, D+1] combined table+accumulator scatter per side
  sorted     — pre-sorted rows + indices_are_sorted=True
  fused+sorted

Timing uses value-fetch barriers (CLAUDE.md measurement rules).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R, D, N = 10_000_000, 64, 65_536

rng = np.random.default_rng(0)
rows_np = rng.integers(0, R, N).astype(np.int32)
grads_np = rng.normal(size=(N, D)).astype(np.float32)

table = jax.device_put(jnp.zeros((R, D), jnp.float32))
acc = jax.device_put(jnp.full((R, 1), 0.1, jnp.float32))
fusedtab = jax.device_put(jnp.zeros((R, D + 1), jnp.float32))
rows = jax.device_put(rows_np)
grads = jax.device_put(grads_np)


@jax.jit
def baseline(table, acc, rows, grads):
    gsq = jnp.mean(jnp.square(grads), axis=-1, keepdims=True)
    acc = acc.at[rows].add(gsq)
    denom = jax.lax.rsqrt(jnp.take(acc, rows, axis=0) + 1e-8)
    table = table.at[rows].add(-0.01 * grads * denom)
    return table, acc


@jax.jit
def fused(ft, rows, grads):
    gsq = jnp.mean(jnp.square(grads), axis=-1, keepdims=True)
    # post-all-occurrences accumulator via a first scatter on [R,1]? No —
    # single fused scatter: compute acc' locally with a sorted segment sum.
    order = jnp.argsort(rows)
    r_s = jnp.take(rows, order)
    g_s = jnp.take(grads, order, axis=0)
    q_s = jnp.take(gsq[:, 0], order)
    # segment total of gsq per duplicate run (post-update acc semantics)
    seg_start = jnp.concatenate([jnp.ones((1,), bool), r_s[1:] != r_s[:-1]])
    seg_id = jnp.cumsum(seg_start) - 1
    totals = jax.ops.segment_sum(q_s, seg_id, num_segments=N)
    acc_new = jnp.take(ft[:, D], r_s) + jnp.take(totals, seg_id)
    denom = jax.lax.rsqrt(acc_new[:, None] + 1e-8)
    payload = jnp.concatenate([-0.01 * g_s * denom, q_s[:, None]], axis=1)
    return ft.at[r_s].add(payload, indices_are_sorted=True)


@jax.jit
def sorted_two(table, acc, rows, grads):
    order = jnp.argsort(rows)
    r_s = jnp.take(rows, order)
    g_s = jnp.take(grads, order, axis=0)
    gsq = jnp.mean(jnp.square(g_s), axis=-1, keepdims=True)
    acc = acc.at[r_s].add(gsq, indices_are_sorted=True)
    denom = jax.lax.rsqrt(jnp.take(acc, r_s, axis=0) + 1e-8)
    table = table.at[r_s].add(-0.01 * g_s * denom, indices_are_sorted=True)
    return table, acc


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])  # barrier
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0][0, 0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:16s} {dt:8.2f} ms")
    return dt


@jax.jit
def one_scatter_unique(table, rows, grads):
    """UNSAFE unless rows are duplicate-free; probes XLA's unique fast path."""
    order = jnp.argsort(rows)
    r_s = jnp.take(rows, order)
    g_s = jnp.take(grads, order, axis=0)
    return table.at[r_s].add(g_s, indices_are_sorted=True, unique_indices=True)


@jax.jit
def dedup_then_scatter(table, rows, grads):
    """Safe: sort, segment-sum duplicates, scatter unique (N slots, zero-padded)."""
    order = jnp.argsort(rows)
    r_s = jnp.take(rows, order)
    g_s = jnp.take(grads, order, axis=0)
    seg_start = jnp.concatenate([jnp.ones((1,), bool), r_s[1:] != r_s[:-1]])
    seg_id = jnp.cumsum(seg_start) - 1
    summed = jax.ops.segment_sum(g_s, seg_id, num_segments=N)
    uniq_rows = jax.ops.segment_max(r_s, seg_id, num_segments=N)
    n_seg = seg_id[-1] + 1
    valid = jnp.arange(N) < n_seg
    uniq_rows = jnp.where(valid, uniq_rows, R)  # R = out-of-range drop
    return table.at[uniq_rows].add(summed, indices_are_sorted=True,
                                   unique_indices=True, mode="drop")


if __name__ == "__main__":
    timeit("baseline", baseline, table, acc, rows, grads)
    timeit("sorted_two", sorted_two, table, acc, rows, grads)
    timeit("fused_sorted", fused, fusedtab, rows, grads)
    # pure scatter cost floor, one scatter only:
    @jax.jit
    def one_scatter(table, rows, grads):
        return table.at[rows].add(grads)
    timeit("one_scatter", one_scatter, table, rows, grads)
    @jax.jit
    def one_scatter_sorted(table, rows, grads):
        order = jnp.argsort(rows)
        return table.at[jnp.take(rows, order)].add(
            jnp.take(grads, order, axis=0), indices_are_sorted=True
        )
    timeit("one_scatter_srt", one_scatter_sorted, table, rows, grads)
    timeit("one_scatter_uniq", one_scatter_unique, table, rows, grads)
    timeit("dedup_scatter", dedup_then_scatter, table, rows, grads)
