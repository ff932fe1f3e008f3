"""Evaluation: BLEU-4, NLL_gen, caption decoding."""

from gan_image_captioning_tpu.eval.bleu import corpus_bleu  # noqa: F401
from gan_image_captioning_tpu.eval.metrics import strip_caption, ids_to_words  # noqa: F401
