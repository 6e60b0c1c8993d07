"""Analytic model-FLOPs accounting for MFU reporting.

"Model FLOPs" are the algorithmically required floating-point operations of
the training step — the tower matmuls (forward + the standard 2x for
backward) and the [B, B] in-batch-negative logits (one forward dot + the
two backward contractions). Implementation detail FLOPs are deliberately
EXCLUDED: the embedding gradient is an O(B·K·D) scatter-add algorithmically
even though this framework computes it as a one-hot matmul on the MXU
(ops/embedding_grad.py), and the fused loss recomputes S tiles in its
backward because FLOPs are cheaper than HBM here (ops/fused_logits.py).
This matches the convention MFU is defined under (model FLOPs / peak),
so the number stays comparable across implementations.

The busy-time "device utilization" the profiler reports (~99%+,
utils/profiling.py) answers "is the chip idle?"; MFU answers "how close is
the math to the speed of light?". A bandwidth-bound workload like this one
(row gathers, optimizer state streaming) legitimately shows high busy-time
and modest MFU — report both (VERDICT round 1, item 9).
"""

from __future__ import annotations

from jodalrob_twotower_tpu.config import TrainConfig
from jodalrob_twotower_tpu.schema import SideSchema, TwoTowerSchema

# TPU v5e nominal peak, bf16 (the chip this framework benches on; the
# measured large-matmul ceiling through the tunnel is ~152 TFLOP/s).
TPU_V5E_PEAK_BF16_FLOPS = 197e12


def tower_forward_flops_per_example(side: SideSchema, cfg: TrainConfig) -> int:
    """Matmul FLOPs (2·m·n per [m]->[n] dense layer) of one tower forward,
    per example. Mirrors models/tower.py layer by layer."""
    m = cfg.model
    f = 0
    n_blocks = 0
    if side.num_numeric:
        f += 2 * side.num_numeric * m.dense_projection_dim
        n_blocks += 1
    for t in side.text:
        f += 2 * t.embed_dim * m.dense_projection_dim
        n_blocks += 1
    width = 0
    if n_blocks:
        proj_out = n_blocks * m.dense_projection_dim
        f += 2 * proj_out * m.tower_hidden_dims[0]
        width += m.tower_hidden_dims[0]
    width += side.num_categorical * m.categorical_embedding_dim
    for w in m.tower_hidden_dims[1:]:
        f += 2 * width * w
        width = w
    f += 2 * width * m.final_embedding_dim
    return f


def train_step_model_flops(
    schema: TwoTowerSchema, cfg: TrainConfig, batch_size: int
) -> int:
    """Model FLOPs of ONE train step at ``batch_size`` (global batch).

    towers: forward + backward = 3x forward matmul FLOPs.
    logits: forward N·Cᵀ is 2·B²·D; backward needs dN = A·C and dC = Aᵀ·N,
    2·B²·D each — 6·B²·D total (reference loss semantics,
    two_tower_train_task.py:99-134).
    """
    tower_fwd = tower_forward_flops_per_example(
        schema.notice, cfg
    ) + tower_forward_flops_per_example(schema.company, cfg)
    per_example = 3 * tower_fwd + 6 * batch_size * cfg.model.final_embedding_dim
    return per_example * batch_size


def mfu(
    examples_per_sec: float,
    schema: TwoTowerSchema,
    cfg: TrainConfig,
    batch_size: int,
    peak_flops: float = TPU_V5E_PEAK_BF16_FLOPS,
) -> float:
    """Model-FLOPs utilization: achieved model FLOP/s over nominal peak."""
    flops_per_example = train_step_model_flops(schema, cfg, batch_size) / batch_size
    return examples_per_sec * flops_per_example / peak_flops
