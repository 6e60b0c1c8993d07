from jodalrob_twotower_tpu.train.loss import bidirectional_ce_loss, cosine_embedding_loss  # noqa: F401
from jodalrob_twotower_tpu.train.metrics import in_batch_metrics  # noqa: F401
from jodalrob_twotower_tpu.train.optimizer import build_optimizer, rowwise_adagrad  # noqa: F401
from jodalrob_twotower_tpu.train.train_step import TrainState, make_train_step, make_eval_step, create_train_state  # noqa: F401
