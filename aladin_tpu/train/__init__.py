from aladin_tpu.train.schedule import make_lr_schedule  # noqa: F401
from aladin_tpu.train.state import TrainState, create_train_state  # noqa: F401
from aladin_tpu.train.step import make_train_step  # noqa: F401
