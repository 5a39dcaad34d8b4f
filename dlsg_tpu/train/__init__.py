"""Training subsystem: optimizer states, schedules, jitted steps, trainers."""

from dlsg_tpu.train.optim import TrainState, make_optimizer, multistep_lr  # noqa: F401
from dlsg_tpu.train.gan_lambda import GANLambdaHandler  # noqa: F401
from dlsg_tpu.train.schedule import (  # noqa: F401
    scheduled_sampling_epsilon,
    saving_schedule,
)
