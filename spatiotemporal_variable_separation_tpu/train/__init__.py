from spatiotemporal_variable_separation_tpu.train.state import TrainState, create_train_state  # noqa: F401
from spatiotemporal_variable_separation_tpu.train.step import make_train_step, make_optimizer, multistep_lr  # noqa: F401
