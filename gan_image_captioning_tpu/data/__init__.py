"""Host-side data pipeline: vocab build, COCO dataset, fixed-shape batching.

The reference's pipeline (``tasks.py``) produces ragged per-batch shapes
(pad-to-batch-max, ``tasks.py:143-156``) from PyTorch DataLoader worker
processes.  XLA wants one static shape, so this pipeline pads every batch to
``max_seq_len + 2`` and (for eval) pads the final partial batch with
zero-weighted rows instead of shrinking it.
"""

from gan_image_captioning_tpu.data.loader import Batcher, make_batch  # noqa: F401
from gan_image_captioning_tpu.data.synthetic import SyntheticCaptions  # noqa: F401
from gan_image_captioning_tpu.data.coco import CocoCaptions  # noqa: F401
from gan_image_captioning_tpu.data.vocab import (  # noqa: F401
    SPECIAL_TOKENS, build_coco_records)
