"""Multi-host (multi-process) support.

The reference is strictly single-process/single-GPU (SURVEY.md §2.6). Here
multi-host TPU training is the standard JAX recipe:

  1. every host calls :func:`initialize` (jax.distributed) before first use;
  2. the GLOBAL mesh spans all hosts' devices (parallel/mesh.py works
     unchanged — `jax.devices()` is global after initialization);
  3. each host feeds only its own slice of the data
     (:func:`host_shard_pairs` / the host_index/host_count arguments of
     data/parquet_stream.py), and builds globally-sharded batch arrays with
     :func:`host_local_batch_to_global`;
  4. collectives ride ICI within a slice and DCN across slices — chosen by
     XLA from the same NamedShardings as single-host.

On one process every helper degrades to a no-op, so the same driver runs
everywhere.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize, no-op when single-process or already up.

    Must run before anything touches the XLA backend — so the
    already-initialized check CANNOT use jax.process_count() (it would
    initialize the backend and poison the real initialize)."""
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        return  # single-process run (TPU VM auto-detect happens inside jax)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def host_shard_pairs(pairs: np.ndarray) -> np.ndarray:
    """Strided split of the pair list across hosts (every host must end up
    with the same number of batches; trim to the common multiple).

    Strided (pairs[idx::count]) rather than contiguous blocks: pair lists
    commonly arrive sorted by notice id, and a block split would hand each
    host a distributionally skewed slice."""
    idx, count = process_info()
    if count == 1:
        return pairs
    per_host = len(pairs) // count
    if per_host == 0:
        raise ValueError(
            f"{len(pairs)} pairs cannot be sharded over {count} hosts — every "
            "host would train on nothing (collectives would hang, not error)"
        )
    return pairs[idx::count][:per_host]


def host_local_batch_to_global(mesh, spec, host_arrays):
    """Assemble a jax.Array whose global shape spans all hosts from each
    host's local shard (jax.make_array_from_process_local_data)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        host_arrays,
    )
