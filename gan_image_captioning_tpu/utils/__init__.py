"""Utilities: logging, metric streams, profiling hooks."""

from gan_image_captioning_tpu.utils.logging import create_logger, MetricWriter  # noqa: F401
