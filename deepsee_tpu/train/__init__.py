from deepsee_tpu.train.state import TrainState, create_train_state
from deepsee_tpu.train.steps import make_train_step
