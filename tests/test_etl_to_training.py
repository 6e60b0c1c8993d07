"""Integration: raw tables -> ETL pipeline -> FeatureStore -> training.

The full offline->online loop on synthetic raw data, the workflow a user
migrating from the reference would run end-to-end.
"""

import numpy as np
import pytest

from jodalrob_twotower_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from jodalrob_twotower_tpu.etl.pipeline import run_pipeline
from jodalrob_twotower_tpu.etl.text import HashTextEmbedder
from jodalrob_twotower_tpu.etl.to_feature_store import (
    feature_store_from_pipeline,
    side_schema_from_manifest,
)
from jodalrob_twotower_tpu.schema import TwoTowerSchema
from jodalrob_twotower_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def etl_outputs(tmp_path_factory):
    """Raw 'notice' and 'company' tables with planted cluster structure,
    pushed through the real ETL pipeline."""
    out = tmp_path_factory.mktemp("etl")
    rng = np.random.default_rng(0)
    n_rows, n_clusters = 600, 8
    n_cluster = rng.integers(0, n_clusters, n_rows)
    c_cluster = rng.integers(0, n_clusters, n_rows)

    def raw_table(prefix, cluster):
        price = cluster * 10.0 + rng.normal(0, 1, n_rows)
        price[::50] = np.nan  # some nulls
        region = np.asarray([f"r{c}" for c in cluster], object)
        title = np.asarray([f"{prefix} item cluster{c}" for c in cluster], object)
        return {
            "id": np.asarray([f"{prefix}{i}" for i in range(n_rows)], object),
            "price": price,
            "region": region,
            "title": title,
        }

    for name, cluster in (("notice", n_cluster), ("company", c_cluster)):
        run_pipeline(
            name,
            [raw_table(name, cluster)],
            out,
            pk_columns=["id"],
            numeric_columns=["price"],
            categorical_columns=["region"],
            text_columns=["title"],
            text_embedder=HashTextEmbedder(32),
        )

    # positive pairs: same-cluster (notice_row, company_row)
    pairs = []
    for c in range(n_clusters):
        ns = np.flatnonzero(n_cluster == c)
        cs = np.flatnonzero(c_cluster == c)
        for ni in ns:
            pairs.append((ni, cs[rng.integers(0, len(cs))]))
    return out, np.asarray(pairs, np.int64), n_cluster, c_cluster


def test_schema_from_manifest(etl_outputs):
    out, _, _, _ = etl_outputs
    schema = side_schema_from_manifest(out, "notice")
    assert schema.pk == ("id",)
    # numeric outputs include the generated null flag
    assert set(schema.numeric_names) == {"price", "price_is_null"}
    # vocab = 8 regions + 3 specials + 10 margin
    assert schema.vocab_sizes == (8 + 3 + 10,)
    assert schema.text_names == ("title",) and schema.text[0].embed_dim == 32


def test_full_loop_trains(etl_outputs):
    out, pairs, _, _ = etl_outputs
    n_schema, n_store = feature_store_from_pipeline(out, "notice")
    c_schema, c_store = feature_store_from_pipeline(out, "company")
    assert len(n_store) == 600 and n_store.dense.shape[1] == 2 + 32
    assert n_store.key_to_row["notice0"] == 0

    schema = TwoTowerSchema(notice=n_schema, company=c_schema)
    cfg = TrainConfig(
        model=ModelConfig(
            categorical_embedding_dim=8,
            dense_projection_dim=16,
            tower_hidden_dims=(32, 16),
            final_embedding_dim=8,
            dropout_rate=0.0,
            compute_dtype="float32",
        ),
        loss=LossConfig(temperature=0.1),
        optimizer=OptimizerConfig(learning_rate=3e-3, num_epochs=5),
        data=DataConfig(batch_size=64),
        results_csv="",
    )
    trainer = Trainer(cfg, schema, n_store, c_store, log_fn=lambda s: None)
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(pairs))
    tr, va = pairs[perm[120:]], pairs[perm[:120]]
    result = trainer.train(tr, va, corpus_eval=True)
    # 8 planted clusters: within-cluster candidates are indistinguishable, so
    # the in-batch accuracy ceiling is ~1/8; require well above random (1/64)
    assert result.final_val["accuracy"] > 3 / 64
    assert result.corpus.recall[100] > 0.5
