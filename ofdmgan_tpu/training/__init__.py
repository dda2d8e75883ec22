from .wgan_gp import (  # noqa: F401
    LossConfig,
    TrainState,
    build_train_step,
    critic_loss_fn,
    generator_loss_fn,
    make_eval_step,
    make_train_step,
)
from .schedules import make_adam, step_lr  # noqa: F401
