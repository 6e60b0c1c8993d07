"""Streaming Trainer mode: train from parquet pair files end-to-end."""

import numpy as np

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.data.parquet_dataset import save_pairs_parquet
from jodalrob_twotower_tpu.train.trainer import Trainer

_CFG = TrainConfig(
    model=ModelConfig(
        categorical_embedding_dim=8,
        dense_projection_dim=16,
        tower_hidden_dims=(32, 16),
        final_embedding_dim=8,
        dropout_rate=0.0,
        compute_dtype="float32",
    ),
    loss=LossConfig(temperature=0.1),
    optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=2),
    data=DataConfig(batch_size=64),
    results_csv="",
)


def test_train_streaming_learns(tiny_dataset, tmp_path):
    ds = tiny_dataset
    tr, va = ds.split(0.2, seed=0)
    # two pair files to exercise multi-file streaming
    half = len(tr) // 2
    files = []
    for i, part in enumerate((tr[:half], tr[half:])):
        p = tmp_path / f"pairs_{i}.parquet"
        save_pairs_parquet(
            p, ds.notice_store.keys[part[:, 0]], ds.company_store.keys[part[:, 1]]
        )
        files.append(p)

    trainer = Trainer(_CFG, ds.schema, ds.notice_store, ds.company_store, log_fn=lambda s: None)
    result = trainer.train_streaming(
        files,
        va,
        steps_per_epoch=len(tr) // 64,
        chunk_rows=700,
        corpus_eval=False,
    )
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    assert result.final_val["accuracy"] > 3.0 / 64
