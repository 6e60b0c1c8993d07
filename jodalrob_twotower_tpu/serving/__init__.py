from jodalrob_twotower_tpu.serving.index import (  # noqa: F401
    BruteForceIndex,
    Int8Index,
    ShardedIndex,
    load_index,
    save_index,
)
from jodalrob_twotower_tpu.serving.service import RetrievalService, qps_bench  # noqa: F401
