from snipper_tpu.train.state import TrainState, create_train_state, make_optimizer  # noqa: F401
from snipper_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
