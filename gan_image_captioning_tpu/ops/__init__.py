"""Pure-function compute ops: losses, schedules, sampling, initializers."""

from gan_image_captioning_tpu.ops.losses import gan_losses, bce_with_logits, cross_entropy_loss  # noqa: F401
from gan_image_captioning_tpu.ops.temperature import get_fixed_temperature  # noqa: F401
from gan_image_captioning_tpu.ops.gumbel import add_gumbel, gumbel_softmax  # noqa: F401
from gan_image_captioning_tpu.ops.initializers import init_param_tree  # noqa: F401
