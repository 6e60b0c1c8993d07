"""Glue: ETL pipeline outputs -> TwoTowerSchema + FeatureStore.

Completes the offline->online loop the reference spread across
feature_store.py + schema.py + feature_preprocessor.py: after
`etl.pipeline.run_pipeline` has produced preprocessed parquet chunks and a
manifest, this module derives the side schema (embedding-table sizes come
from the fitted categorical vocabs + safety margin, reference
cat_embed.py:76) and assembles the column-major FeatureStore the trainer
consumes.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from jodalrob_twotower_tpu.data.feature_store import FeatureStore
from jodalrob_twotower_tpu.etl.pipeline import load_preprocessed
from jodalrob_twotower_tpu.schema import (
    CategoricalSpec,
    NumericSpec,
    SideSchema,
    TextSpec,
    VOCAB_SAFETY_MARGIN,
)


def side_schema_from_manifest(out_dir: str | Path, table_name: str) -> SideSchema:
    """Derive a SideSchema from an ETL manifest: numeric outputs (incl. the
    generated *_is_null flags) are numeric features; fitted vocab sizes plus
    the safety margin size the embedding tables; text columns carry the
    pipeline's embedding width."""
    out = Path(out_dir)
    manifest = json.loads((out / f"{table_name}_manifest.json").read_text())
    return SideSchema(
        table=table_name,
        pk=tuple(manifest["pk"]),
        numeric=tuple(NumericSpec(c) for c in manifest["numeric_outputs"]),
        categorical=tuple(
            CategoricalSpec(c, int(dim) + VOCAB_SAFETY_MARGIN)
            for c, dim in manifest["categorical_input_dims"].items()
        ),
        text=tuple(
            TextSpec(c, int(manifest["text_embed_dim"])) for c in manifest["text_outputs"]
        ),
    )


def feature_store_from_pipeline(
    out_dir: str | Path, table_name: str, schema: SideSchema | None = None
) -> tuple[SideSchema, FeatureStore]:
    """Load preprocessed chunks into a FeatureStore keyed by the PK columns
    (composite PKs joined with '|', matching FeatureStore semantics)."""
    schema = schema or side_schema_from_manifest(out_dir, table_name)
    data = load_preprocessed(out_dir, table_name)
    n = len(next(iter(data.values())))
    if len(schema.pk) == 1:
        keys = np.asarray(data[schema.pk[0]]).astype(str)
    else:
        keys = np.asarray(
            ["|".join(str(data[c][i]) for c in schema.pk) for i in range(n)]
        )
    numeric = np.stack(
        [np.asarray(data[c], dtype=np.float32) for c in schema.numeric_names], axis=1
    ) if schema.numeric else None
    categorical = np.stack(
        [np.asarray(data[c], dtype=np.int32) for c in schema.categorical_names], axis=1
    ) if schema.categorical else None
    text = {t.name: np.asarray(data[t.name], dtype=np.float32) for t in schema.text} or None
    store = FeatureStore.from_columns(
        schema, numeric=numeric, categorical=categorical, text=text, keys=keys
    )
    return schema, store
