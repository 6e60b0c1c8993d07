from jodalrob_twotower_tpu.models.embedding import EmbeddingCollection  # noqa: F401
from jodalrob_twotower_tpu.models.tower import Tower  # noqa: F401
from jodalrob_twotower_tpu.models.two_tower import TwoTowerModel  # noqa: F401
