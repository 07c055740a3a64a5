"""Training: Noam schedule, sharded train/eval steps, epoch runners,
checkpointing."""

from ecg_byte_tpu.train.scheduler import noam_schedule, make_optimizer  # noqa: F401
from ecg_byte_tpu.train.step import (  # noqa: F401
    TrainState,
    make_train_step,
    make_eval_step,
    create_train_state,
)
