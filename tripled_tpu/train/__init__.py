"""Training: optimizer/schedule, sharded train step, epoch loop, checkpoints."""

from tripled_tpu.train.optim import make_optimizer, make_lr_schedule
from tripled_tpu.train.state import TrainState, create_train_state
from tripled_tpu.train.step import make_train_step, make_predict_fn
from tripled_tpu.train.loop import train_mono
