from jodalrob_twotower_tpu.serving.index import BruteForceIndex, Int8Index  # noqa: F401
from jodalrob_twotower_tpu.serving.service import RetrievalService  # noqa: F401
