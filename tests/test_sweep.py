"""Sweep runner (src/sweep.py) — the one-command version of the report's
hand-run grids (NLP_Report.pdf Tables 2-5)."""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from src.sweep import cell_name, parse_grid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_grid_cartesian():
    cells = parse_grid("a=1,2;b-c=x")
    assert cells == [{"a": "1", "b-c": "x"}, {"a": "2", "b-c": "x"}]
    # underscore spelling normalizes to dashes
    assert parse_grid("disc_train_freq=1,2") == [
        {"disc-train-freq": "1"}, {"disc-train-freq": "2"}]


def test_parse_grid_rejects_empty_axis():
    with pytest.raises(SystemExit):
        parse_grid("a=")


def test_cell_name_stable():
    assert cell_name({"disc-train-freq": "2", "temperature": "100"}) == \
        "disctrainfreq2__temperature100"


@pytest.mark.slow
def test_sweep_end_to_end(tmp_path):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, "src/sweep.py", "--grid", "temperature=10,100",
         "--dataset", "synthetic", "--max-seq-len", "8",
         "--synthetic-items", "32", "--pretrain-epochs", "1",
         "--adv-epochs", "1", "--pre-train-batch-size", "8",
         "--adv-train-batch-size", "8", "--num-workers", "0",
         "--sweep-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(ln)
            for ln in (tmp_path / "results.jsonl").read_text().splitlines()]
    assert len(rows) == 2
    for row in rows:
        assert "error" not in row, row
        assert "nll_gen" in row["pretrained"] and "nll_gen" in row["adv"]
    # markdown table on stdout, one line per cell
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("|")]
    assert len(lines) == 4  # header + separator + 2 cells
