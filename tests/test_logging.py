"""Logging / metric-stream units."""

import json
import logging
import os

from gan_image_captioning_tpu.utils.logging import MetricWriter, create_logger


def test_create_logger_stdout_and_file(tmp_path, capsys):
    path = os.path.join(str(tmp_path), "log.txt")
    log = create_logger("gic_test", silent=False, to_disk=True, log_file=path)
    log.info("hello %s", "world")
    for h in log.handlers:
        h.flush()
    assert "hello world" in capsys.readouterr().out
    assert "hello world" in open(path).read()
    # reference API shape: list of files also accepted (utils.py:92-97)
    log2 = create_logger("gic_test2", silent=True, to_disk=True,
                         log_file=[path + ".a", path + ".b"])
    log2.info("twice")
    for h in log2.handlers:
        h.flush()
    assert "twice" in open(path + ".a").read()
    assert "twice" in open(path + ".b").read()


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.add_scalar("Generator_train_loss", 1.25, step=3)
    w.add_scalar("BLEU4", 0.5, step=4)
    w.close()
    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert lines[0]["tag"] == "Generator_train_loss"
    assert lines[0]["value"] == 1.25 and lines[0]["step"] == 3
    assert lines[1]["tag"] == "BLEU4"
    # TensorBoard event file written when torch's writer is available
    assert any(f.startswith("events.out") for f in os.listdir(str(tmp_path)))
