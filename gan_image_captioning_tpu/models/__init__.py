"""Model zoo: pure-pytree params + apply functions.

Parameters are nested dicts of jnp arrays in torch-compatible layouts (so the
reference's checkpoints can be converted weight-for-weight), but all compute
is idiomatic JAX: ``lax.scan`` decode loops, fused jitted steps, static
shapes.
"""

from gan_image_captioning_tpu.models import lstm  # noqa: F401
from gan_image_captioning_tpu.models.generator import Generator  # noqa: F401
from gan_image_captioning_tpu.models.discriminator import Discriminator  # noqa: F401
