"""Logging + metric streams.

Three channels, mirroring the reference's observability (SURVEY §5):

1. Python logger → stdout + ``{log_file}.txt`` (reference ``create_logger``,
   ``utils.py:78-103`` — same API surface here).
2. Scalar metric stream: a structured ``metrics.jsonl`` (one JSON object per
   scalar write) plus TensorBoard event files when ``tensorboard`` (via
   torch) is importable — tag names match the reference
   (``GenPreTraining_train_loss`` etc., ``training.py:92,171-175``).
3. Stdout progress lines (the reference used tqdm bars,
   ``training.py:52,133``).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def create_logger(name, silent: bool = False, to_disk: bool = False,
                  log_file: Optional[str] = None):
    """Same call surface as reference ``utils.py:78-103``."""
    log = logging.getLogger(name)
    log.setLevel(logging.DEBUG)
    log.propagate = False
    log.handlers.clear()
    formatter = logging.Formatter(fmt="%(message)s")
    if not silent:
        ch = logging.StreamHandler(sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(formatter)
        log.addHandler(ch)
    if to_disk and log_file:
        files = log_file if isinstance(log_file, list) else [log_file]
        for filename in files:
            fh = logging.FileHandler(filename, mode="w")
            fh.setLevel(logging.INFO)
            fh.setFormatter(formatter)
            log.addHandler(fh)
    return log


class MetricWriter:
    """Scalar writer: JSONL always, TensorBoard when available."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self._jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(save_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": value, "step": int(step)})
            + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
