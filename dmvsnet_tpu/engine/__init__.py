from dmvsnet_tpu.engine.state import TrainState, create_train_state, make_lr_schedule  # noqa: F401
from dmvsnet_tpu.engine.steps import make_eval_step, make_train_step  # noqa: F401
