from jodalrob_twotower_tpu.etl.numeric import NumericPreprocessor  # noqa: F401
from jodalrob_twotower_tpu.etl.categorical import CategoricalPreprocessor  # noqa: F401
from jodalrob_twotower_tpu.etl.pipeline import run_pipeline  # noqa: F401
