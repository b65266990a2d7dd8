from .optimizer import TrainConfig, build_optimizer, label_params
from .train_step import TrainState, make_train_step, init_train_state
