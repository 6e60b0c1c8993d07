from jodalrob_twotower_tpu.evaluation.evaluator import (  # noqa: F401
    Evaluator,
    corpus_retrieval_eval,
    qualitative_assessment,
)
