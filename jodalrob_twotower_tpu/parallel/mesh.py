"""Device mesh construction and batch shardings.

The reference is single-GPU with no distributed layer at all (SURVEY.md
§2.5-2.6). Here parallelism is declarative GSPMD: one logical mesh with a
``data`` axis (batch + embedding-table rows shard over it) and an optional
``model`` axis (unused by default — the tower MLPs are far too small for
tensor parallelism to pay for its collectives). XLA inserts all collectives:
all-reduce for dense grads, all-gather for the global in-batch-negative
logits, and the gather/scatter exchanges of the row-sharded tables.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jodalrob_twotower_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    cfg: MeshConfig | None = None,
) -> Mesh:
    """Build a [data, model] mesh; data axis absorbs remaining devices."""
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model_axis, 1)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model_axis={model}")
    data = cfg.data_axis if cfg.data_axis > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batches along dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(x, mesh: Mesh):
    """Place a host array replicated on the mesh — the ONE replicated-put
    helper every mesh path uses.

    Measured on this JAX version (2-process CPU harness): a plain
    ``jax.device_put`` to a sharding spanning non-addressable devices DOES
    work cross-process (it writes each process's addressable shards from
    the replicated host value). The explicit
    ``make_array_from_process_local_data`` branch is kept anyway: it is
    the documented-stable API for assembling global arrays from
    process-local copies, so the placement does not ride an
    implementation detail of device_put across JAX upgrades."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def row_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard dim 0 (embedding-table rows / rowwise optimizer state)."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


# dense table gradients (cost ∝ rows x batch) lose to the scatter above
# this unified-table height; below it, replicating the (few-MB) table is
# cheaper than exchanging rows per step AND keeps the dense-grad kernel
# (models/embedding.py DENSE_GRAD_MAX_ROWS — the same crossover).
AUTO_REPLICATE_MAX_ROWS = 1 << 16


def resolve_embedding_sharding(mesh_cfg: MeshConfig, schema) -> str:
    """Concrete embedding-sharding mode from a config + schema.

    "auto" -> "replicated" when every tower's unified table is small enough
    for the replicate+dense-grad regime, else "gspmd_rows". Explicit modes
    pass through."""
    mode = mesh_cfg.embedding_sharding
    if mode != "auto":
        return mode
    from jodalrob_twotower_tpu.models.embedding import table_layout

    total = max(
        table_layout(side.vocab_sizes)[1] if side.vocab_sizes else 0
        for side in (schema.notice, schema.company)
    )
    return "replicated" if total <= AUTO_REPLICATE_MAX_ROWS else "gspmd_rows"
