"""Round-2 data-prep subcommands, driven through the CLI (reference:
data/tacos/rebuild_*, data/anet/{anet1.3,grounding}/*, data/youmakeup/*,
video_backbone/TSP/{data,extract_features}/*)."""

import csv
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "data_prep.py")


def run(*args):
    r = subprocess.run([sys.executable, TOOL, *args], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


def tacos_anno(tmp_path):
    # two timestamps; the first annotated twice (multi-annotation group)
    anno = {"s13-d21": {"duration": 100.0,
                        "timestamps": [[0, 10], [0, 10], [20, 30]],
                        "sentences": ["a first", "a first alt", "a second"]}}
    p = tmp_path / "val.json"
    p.write_text(json.dumps(anno))
    return str(p)


def test_rebuild_tacos_multi(tmp_path):
    run("rebuild_tacos_multi", "--anno", tacos_anno(tmp_path),
        "--out_dir", str(tmp_path))
    d = json.load(open(tmp_path / "rebuild_val.json"))
    # max annotation count 2 -> two pseudo-videos 000/001
    assert sorted(d) == ["000s13-d21", "001s13-d21"]
    for v in d.values():
        assert v["timestamps"] == [[0, 10], [20, 30]]
        assert len(v["sentences"]) == 2
    # group 0 takes the first annotation of each timestamp
    assert d["000s13-d21"]["sentences"][0] == "a first"
    g = json.load(open(tmp_path / "grounding" / "rebuild_grounding_val.json"))
    assert "sentences" not in g["000s13-d21"]
    para = json.load(open(tmp_path / "para" / "rebuild_para_val.json"))
    assert para["000s13-d21"].endswith(".")


def test_rebuild_sub_para(tmp_path):
    anno = {"vid": {"duration": 50.0,
                    "timestamps": [[i, i + 1] for i in range(5)],
                    "sentences": [f"s{i}" for i in range(5)]}}
    p = tmp_path / "test.json"
    p.write_text(json.dumps(anno))
    run("rebuild_sub_para", "--anno", str(p), "--out_dir", str(tmp_path),
        "--min_events", "2", "--max_events", "2")
    d = json.load(open(tmp_path / "min2_max2_rebuild_test.json"))
    # 5 events at <=2 per sub-para -> 3 pseudo-videos (2+2+1)
    assert len(d) == 3
    sizes = sorted(len(v["sentences"]) for v in d.values())
    assert sizes == [1, 2, 2]
    # every event appears exactly once across the split
    all_ts = sorted(ts for v in d.values() for ts in v["timestamps"])
    assert all_ts == [[i, i + 1] for i in range(5)]


def test_merge_grounding_results(tmp_path):
    gt = {"v_00000000001": {"timestamps": [[0, 1], [1, 2]],
                            "sentences": ["x", "y"]}}
    d1 = {"results": {"00000000001-0": [{"timestamp": [0, 1]}],
                      "00000000001-1": [{"timestamp": [1, 2]}]}}
    d2 = {"results": {"00000000001-0": [{"timestamp": [5, 6]}]}}
    for name, blob in (("gt", gt), ("a", d1), ("b", d2)):
        (tmp_path / f"{name}.json").write_text(json.dumps(blob))
    run("merge_grounding_results", "--first", str(tmp_path / "a.json"),
        "--second", str(tmp_path / "b.json"), "--gt",
        str(tmp_path / "gt.json"), "--out", str(tmp_path / "m.json"))
    m = json.load(open(tmp_path / "m.json"))["results"]
    # second file's anno 0 lands after the GT's 2 sentences
    assert sorted(m) == ["00000000001-0", "00000000001-1", "00000000001-2"]
    assert m["00000000001-2"][0]["timestamp"] == [5, 6]


def test_process_anet13(tmp_path):
    db = {"database": {
        "aaaaaaaaaaa": {"duration": 10.0, "subset": "training",
                        "annotations": [{"segment": [0, 5], "label": "run"}]},
        "bbbbbbbbbbb": {"duration": 8.0, "subset": "validation",
                        "annotations": [{"segment": [1, 4], "label": "jump"},
                                        {"segment": [5, 3], "label": "bad"}]},
        "ccccccccccc": {"duration": 5.0, "subset": "validation",
                        "annotations": []},
    }}
    cap_train = {}
    (tmp_path / "anet13.json").write_text(json.dumps(db))
    (tmp_path / "cap.json").write_text(json.dumps(cap_train))
    run("process_anet13", "--anet13", str(tmp_path / "anet13.json"),
        "--cap_train", str(tmp_path / "cap.json"),
        "--out_dir", str(tmp_path / "out"))
    train = json.load(open(tmp_path / "out" / "train.json"))
    val = json.load(open(tmp_path / "out" / "val.json"))
    assert list(train) == ["v_aaaaaaaaaaa"]
    assert train["v_aaaaaaaaaaa"]["action_labels"] == ["run"]
    assert train["v_aaaaaaaaaaa"]["sentences"] == [""]
    # invalid (reversed) segment dropped; empty-annotation video dropped
    assert list(val) == ["v_bbbbbbbbbbb"]
    assert val["v_bbbbbbbbbbb"]["timestamps"] == [[1, 4]]


def test_reformat_youmakeup(tmp_path):
    origin = [{"video_id": "abc", "video_title": "t", "video_duration": 60.0,
               "step": {"1": {"area": ["face"], "caption": "apply powder",
                              "startime": "00:00:05", "endtime": "00:01:10"}}},
              {"video_id": "xyz", "video_title": "u", "video_duration": 9.0}]
    (tmp_path / "o.json").write_text(json.dumps(origin))
    run("reformat_youmakeup", "--origin", str(tmp_path / "o.json"),
        "--out", str(tmp_path / "c.json"))
    d = json.load(open(tmp_path / "c.json"))
    assert d["v_abc"]["timestamps"] == [[5, 70]]
    assert d["v_abc"]["sentences"] == ["apply powder"]
    # unlabeled item gets the placeholder event
    assert d["v_xyz"]["timestamps"] == [[0, 0.5]]

    queries = [{"video_id": "abc", "caption": "q1", "video_title": "t",
                "video_duration": 60.0, "query_idx": 7},
               {"video_id": "abc", "caption": "q2", "video_title": "t",
                "video_duration": 60.0, "query_idx": 9}]
    (tmp_path / "g.json").write_text(json.dumps(queries))
    run("reformat_youmakeup_grounding", "--origin", str(tmp_path / "g.json"),
        "--out", str(tmp_path / "gg.json"))
    g = json.load(open(tmp_path / "gg.json"))
    assert g["v_abc"]["sentences"] == ["q1", "q2"]
    assert g["v_abc"]["query_indicies"] == [7, 9]

    run("extract_vocab_youmakeup", "--origins", str(tmp_path / "o.json"),
        str(tmp_path / "g.json"), "--out", str(tmp_path / "v.json"))
    v = json.load(open(tmp_path / "v.json"))
    assert "powder" in v["word_to_ix"] and "UNK" in v["word_to_ix"]
    assert min(v["word_to_ix"].values()) == 1


def test_generate_metadata_csv(tmp_path):
    cv2 = pytest.importorskip("cv2")
    vw = cv2.VideoWriter(str(tmp_path / "v0.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 32))
    if not vw.isOpened():
        pytest.skip("cv2.VideoWriter unavailable")
    for _ in range(20):
        vw.write(np.zeros((32, 32, 3), np.uint8))
    vw.release()
    run("generate_metadata_csv", "--video_folder", str(tmp_path),
        "--ext", "avi", "--out", str(tmp_path / "meta.csv"))
    rows = list(csv.DictReader(open(tmp_path / "meta.csv")))
    assert rows[0]["filename"] == "v0.avi"
    assert abs(float(rows[0]["fps"]) - 10.0) < 1e-6
    assert int(rows[0]["video-frames"]) == 20


def test_merge_pkl_to_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    feats = {}
    for name in ("vidA", "vidB"):
        arr = np.random.RandomState(0).randn(4, 8).astype(np.float32)
        with open(tmp_path / f"{name}.pkl", "wb") as f:
            pickle.dump(arr, f)
        feats[name] = arr
    run("merge_pkl_to_h5", "--features_folder", str(tmp_path),
        "--out", str(tmp_path / "all.h5"))
    with h5py.File(tmp_path / "all.h5") as f:
        for name, arr in feats.items():
            np.testing.assert_array_equal(f[name][:], arr)
