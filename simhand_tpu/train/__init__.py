from simhand_tpu.train.optimizer import make_optimizer, OptimizerConfig
from simhand_tpu.train.state import TrainState, create_train_state
from simhand_tpu.train.loop import make_train_step, make_eval_step
