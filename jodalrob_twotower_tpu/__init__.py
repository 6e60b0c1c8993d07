"""TPU-native two-tower retrieval framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
reference PyTorch/TorchRec system (zoongahn/jodalroB-twoTower, see SURVEY.md):
schema-driven feature pipelines, two MLP towers over categorical embeddings
plus dense features, in-batch-negative contrastive training, recall@k / MRR /
similarity-gap evaluation, checkpoint/resume and a results ledger - extended
with row-sharded embedding tables over a TPU device mesh, Pallas kernels for
the hot ops, a streaming parquet input pipeline, and a brute-force + int8 MIPS
serving path.
"""

__version__ = "0.1.0"

from jodalrob_twotower_tpu.schema import (  # noqa: F401
    CategoricalSpec,
    NumericSpec,
    PairSchema,
    SideSchema,
    TextSpec,
    TwoTowerSchema,
    classify_columns,
    schema_from_metadata_csv,
)
