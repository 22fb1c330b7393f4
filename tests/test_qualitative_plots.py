"""Qualitative plot suite (reference misc/plot/*): duration-bucketed result
splits, per-video timelines, and the good-sample finder."""

import json
import os

from gvl_tpu.eval.plots import (find_good_samples, split_results_by_duration,
                                visualize_video_results)


def make_world(tmp_path):
    gt = {
        "v_a": {"duration": 25.0, "timestamps": [[0, 10], [12, 20]],
                "sentences": ["a man runs across the field",
                              "the dog eats a red ball"]},
        "v_b": {"duration": 95.0, "timestamps": [[5, 50]],
                "sentences": ["a woman opens the door"]},
    }
    def res_for(perfect):
        out = {"results": {}, "version": "V", "external_data": {}}
        for vid, info in gt.items():
            out["results"][vid] = [
                {"timestamp": list(ts),
                 "sentence": s if perfect else "purple quantum turnips",
                 "proposal_score": 0.9, "sentence_score": -1.0,
                 "cl_score": 0.0, "query_id": i,
                 "vid_duration": info["duration"], "pred_event_count": 1}
                for i, (ts, s) in enumerate(zip(info["timestamps"],
                                                info["sentences"]))]
        return out
    gt_p = tmp_path / "gt.json"
    ours_p = tmp_path / "ours.json"
    base_p = tmp_path / "base.json"
    gt_p.write_text(json.dumps(gt))
    ours_p.write_text(json.dumps(res_for(True)))
    base_p.write_text(json.dumps(res_for(False)))
    return str(gt_p), str(ours_p), str(base_p)


def test_split_results_by_duration(tmp_path):
    gt_p, ours_p, _ = make_world(tmp_path)
    paths = split_results_by_duration(ours_p, gt_p,
                                      out_dir=str(tmp_path / "bydur"))
    # v_a (25s) -> 30s bucket; v_b (95s) -> 100s bucket
    assert sorted(paths) == [30.0, 100.0]
    blob = json.load(open(paths[30.0]))
    assert list(blob["results"]) == ["v_a"]
    assert os.path.exists(str(tmp_path / "bydur" / "recall_vs_duration.png"))


def test_visualize_video_results(tmp_path):
    gt_p, ours_p, base_p = make_world(tmp_path)
    pngs = visualize_video_results({"ours": ours_p, "base": base_p}, gt_p,
                                   out_dir=str(tmp_path / "viz"))
    assert len(pngs) == 2
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in pngs)


def test_find_good_samples(tmp_path):
    gt_p, ours_p, base_p = make_world(tmp_path)
    good = find_good_samples(gt_p, {"ours": ours_p, "base": base_p}, "ours")
    assert sorted(good) == ["v_a", "v_b"]  # perfect captions beat garbage
    none = find_good_samples(gt_p, {"ours": base_p, "base": ours_p}, "ours")
    assert none == []
