"""Model-FLOPs accounting used for the bench's MFU field."""

import numpy as np

from jodalrob_twotower_tpu.config import ModelConfig, TrainConfig
from jodalrob_twotower_tpu.schema import reference_shaped_schema, tiny_synthetic_schema
from jodalrob_twotower_tpu.utils.flops import (
    mfu,
    tower_forward_flops_per_example,
    train_step_model_flops,
)


def test_tower_forward_flops_hand_check():
    """Tiny schema, hand-computed layer by layer."""
    schema = tiny_synthetic_schema(n_categorical=2, vocab_size=10, n_numeric=4)
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 24),
            final_embedding_dim=12,
        )
    )
    # proj_numeric 4->16, dense_projection 16->32, mlp (32+2*8)->24, head 24->12
    expected = 2 * (4 * 16 + 16 * 32 + 48 * 24 + 24 * 12)
    assert tower_forward_flops_per_example(schema.notice, cfg) == expected


def test_train_step_flops_flagship_magnitude():
    """Flagship at B=8192: towers+logits land in the tens of GFLOPs —
    the magnitude BENCHMARKS.md reasons about (~80-100 GFLOP/step)."""
    schema = reference_shaped_schema()
    cfg = TrainConfig()
    flops = train_step_model_flops(schema, cfg, 8192)
    assert 20e9 < flops < 200e9
    # logits term alone: 6 * B^2 * D
    assert flops > 6 * 8192 * 8192 * 128


def test_mfu_scales_linearly():
    schema = reference_shaped_schema()
    cfg = TrainConfig()
    m1 = mfu(1e6, schema, cfg, 8192)
    m2 = mfu(2e6, schema, cfg, 8192)
    np.testing.assert_allclose(m2, 2 * m1, rtol=1e-12)
    assert 0 < m1 < 1
