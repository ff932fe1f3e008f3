"""Training engine: TrainState, fused jitted steps, instructor, checkpoints."""

from gan_image_captioning_tpu.train.state import TrainState, create_train_state  # noqa: F401
from gan_image_captioning_tpu.train.steps import (  # noqa: F401
    make_mle_step, make_mle_eval_step, make_adv_step, make_adv_eval_step)
