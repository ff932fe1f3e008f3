"""Flag system — API-compatible shim over the framework's config module.

The reference exposes ``get_args`` plus the three group builders from
``src/args.py`` (``args.py:6,72,117,200``); scripts importing them keep
working against the rebuild.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gan_image_captioning_tpu.config import (  # noqa: F401
    add_data_args, add_model_args, add_training_args, build_parser, get_args)
