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
from jodalrob_twotower_tpu.config import TrainConfig  # noqa: F401


def __getattr__(name):
    # lazy heavyweight entry points (avoid importing jax at package import)
    if name == "Trainer":
        from jodalrob_twotower_tpu.train.trainer import Trainer

        return Trainer
    if name == "RetrievalService":
        from jodalrob_twotower_tpu.serving.service import RetrievalService

        return RetrievalService
    if name == "make_synthetic_dataset":
        from jodalrob_twotower_tpu.data.synthetic import make_synthetic_dataset

        return make_synthetic_dataset
    if name == "build_model":
        from jodalrob_twotower_tpu.models import build_model

        return build_model
    raise AttributeError(name)
