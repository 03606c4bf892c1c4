"""Training orchestration: train state, jitted steps, loop, checkpoints."""

from hgr_tpu.train.state import TrainState, create_train_state, multistep_lr  # noqa: F401
from hgr_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
