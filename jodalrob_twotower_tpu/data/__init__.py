from jodalrob_twotower_tpu.data.types import PairBatch, TowerBatch  # noqa: F401
from jodalrob_twotower_tpu.data.feature_store import FeatureStore  # noqa: F401
from jodalrob_twotower_tpu.data.synthetic import SyntheticDataset, make_synthetic_dataset  # noqa: F401
