"""tools/train_tsp.py CLI smoke: synthetic videos + CSVs + label-mapping
JSONs through the full epoch trainer (reference train.py CLI surface)."""

import csv
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from tests.test_tsp_dataset import write_video  # noqa: E402


def _world(tmp_path):
    for sub in ("train", "valid"):
        d = tmp_path / sub
        d.mkdir()
        write_video(str(d / "vid0.avi"))
    for sub in ("train", "valid"):
        with open(tmp_path / f"{sub}.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["filename", "fps", "t-start", "t-end",
                        "video-duration", "action-label",
                        "temporal-region-label"])
            w.writerow(["vid0.avi", 10, 0.0, 3.5, 4.0, "run", "inside"])
    (tmp_path / "actions.json").write_text(json.dumps(["run", "jump"]))
    (tmp_path / "regions.json").write_text(json.dumps(["inside", "outside"]))


def test_train_tsp_cli(tmp_path):
    _world(tmp_path)
    from train_tsp import main
    out = str(tmp_path / "run")
    history = main([
        "--root-dir", str(tmp_path),
        "--train-csv", str(tmp_path / "train.csv"),
        "--valid-csv", str(tmp_path / "valid.csv"),
        "--label-columns", "action-label", "temporal-region-label",
        "--label-mapping-jsons", str(tmp_path / "actions.json"),
        str(tmp_path / "regions.json"),
        "--backbone", "r3d_18", "--clip-len", "8", "--clip-size", "32",
        "--frame-rate", "5", "--clips-per-segment", "2",
        "--batch-size", "2", "--epochs", "1", "--lr-warmup-epochs", "1",
        "--lr-milestones", "4", "--output-dir", out, "--debug"])
    assert len(history) == 1
    assert np.isfinite(history[0]["avg_loss"])
    assert os.path.isdir(os.path.join(out, "epoch_0.ckpt"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
