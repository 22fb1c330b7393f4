"""TSP data plumbing e2e: synthetic videos + metadata CSV + GVF -> clip
sampler -> jitted TSP train step (reference:
video_backbone/TSP/train/untrimmed_video_dataset.py + train.py)."""

import csv
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gvl_tpu.backbone.train_tsp import TSPTrainConfig, train_tsp
from gvl_tpu.backbone.untrimmed_dataset import (UntrimmedClipDataset,
                                                tsp_batches)


def write_video(path, n_frames=40, size=48, fps=10):
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    vw = cv2.VideoWriter(path, fourcc, fps, (size, size))
    if not vw.isOpened():
        pytest.skip("cv2.VideoWriter unavailable in this build")
    rng = np.random.RandomState(0)
    for _ in range(n_frames):
        vw.write(rng.randint(0, 255, (size, size, 3), np.uint8))
    vw.release()


def make_world(tmp_path, gvf=False):
    vids = []
    for i in range(2):
        p = str(tmp_path / f"vid{i}.avi")
        write_video(p)
        vids.append(p)
    csv_path = str(tmp_path / "meta.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "fps", "t-start", "t-end", "video-duration",
                    "action-label", "temporal-region-label"])
        # one labeled segment, one with a missing action label (-> -1),
        # one too short to fit a clip (dropped)
        w.writerow(["vid0.avi", 10, 0.0, 3.5, 4.0, "run", "inside"])
        w.writerow(["vid1.avi", 10, 0.5, 4.0, 4.0, "", "outside"])
        w.writerow(["vid1.avi", 10, 0.0, 0.1, 4.0, "run", "inside"])
    gvf_dir = None
    if gvf:
        gvf_dir = str(tmp_path / "gvf")
        os.makedirs(gvf_dir)
        for i in range(2):
            np.save(os.path.join(gvf_dir, f"vid{i}.npy"),
                    np.random.RandomState(i).randn(512).astype(np.float32))
    ds = UntrimmedClipDataset(
        csv_path, str(tmp_path), clip_length=8, frame_rate=5,
        clips_per_segment=2, temporal_jittering=True,
        label_columns=["action-label", "temporal-region-label"],
        label_mappings=[{"run": 0, "jump": 1}, {"inside": 0, "outside": 1}],
        size=32, global_video_features=gvf_dir)
    return ds


def test_clip_sampler_semantics(tmp_path):
    ds = make_world(tmp_path)
    # 3 csv rows, 1 dropped (too short) -> 2 segments x 2 clips
    assert len(ds.rows) == 2 and len(ds) == 4
    ex = ds.example(0)
    assert ex["clip"].shape == (8, 32, 32, 3)
    assert ex["clip"].dtype == np.float32
    assert int(ex["action-label"]) == 0
    ex1 = ds.example(1)  # vid1 row: missing action label -> -1
    assert int(ex1["action-label"]) == -1
    assert int(ex1["temporal-region-label"]) == 1


def test_train_tsp_through_sampler(tmp_path):
    ds = make_world(tmp_path, gvf=True)
    cfg = TSPTrainConfig(backbone="r2plus1d_18", num_classes_list=(2, 2),
                         use_gvf=True, warmup_steps=1, total_steps=4)
    params, stats, hist = train_tsp(
        cfg, tsp_batches(ds, batch_size=2, epochs=2), num_steps=2,
        clip_shape=(8, 32, 32, 3), log_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"))
    assert hist and np.isfinite(hist[0]["total_loss"])
    assert os.path.isdir(str(tmp_path / "ckpt"))
