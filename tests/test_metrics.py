"""Metric harness tests: perfect predictions score high, garbage scores low,
and output schemas match the reference's."""

import json

import numpy as np
import pytest

from gvl_tpu.eval.metrics import (eval_dvc, eval_metrics,
                                  eval_metrics_grounding)
from gvl_tpu.eval.metrics.scorers import Bleu, Cider, Meteor, Rouge, ptb_tokenize
from gvl_tpu.eval.metrics.soda import chased_dp_assignment
from gvl_tpu.eval.metrics.tal import eval_tal


def make_files(tmp_path, perfect=True):
    gt = {
        "v_00000000001": {
            "duration": 60.0,
            "timestamps": [[0.0, 10.0], [20.0, 40.0]],
            "sentences": ["a man runs across the field",
                          "the dog jumps over a fence"],
        },
        "v_00000000002": {
            "duration": 30.0,
            "timestamps": [[5.0, 25.0]],
            "sentences": ["a woman opens the door"],
        },
    }
    preds = {"results": {}, "version": "VERSION 1.0", "external_data": {}}
    for vid, info in gt.items():
        items = []
        for ts, sent in zip(info["timestamps"], info["sentences"]):
            if not perfect:
                ts = [0.0, 1.0]
                sent = "zzz yyy xxx qqq"
            items.append({"timestamp": list(ts), "sentence": sent,
                          "proposal_score": 0.9, "sentence_score": -1.0,
                          "cl_score": 0.0, "pred_event_count": len(
                              info["timestamps"])})
        preds["results"][vid] = items
    gt_path = tmp_path / "gt.json"
    pred_path = tmp_path / "pred.json"
    para_gt = {vid: " ".join(info["sentences"]) for vid, info in gt.items()}
    para_path = tmp_path / "para_gt.json"
    gt_path.write_text(json.dumps(gt))
    pred_path.write_text(json.dumps(preds))
    para_path.write_text(json.dumps(para_gt))
    return str(gt_path), str(pred_path), str(para_path)


def test_scorers_perfect_match():
    gts = {0: ["a man runs across the field"], 1: ["the dog jumps"]}
    res = {0: ["a man runs across the field"], 1: ["the dog jumps"]}
    bleu, per = Bleu(4).compute_score(gts, res)
    assert bleu[3] > 0.99
    # METEOR 1.5 (en): even identical strings pay the fragmentation penalty
    # gamma*(chunks/m)^beta — aggregate here is 1 - 0.6*(2/9)^0.2
    m, _ = Meteor().compute_score(gts, res)
    assert m == pytest.approx(1.0 - 0.6 * (2.0 / 9.0) ** 0.2, abs=1e-9)
    r, _ = Rouge().compute_score(gts, res)
    assert r > 0.99
    c, _ = Cider().compute_score(gts, res)
    assert c > 5.0  # CIDEr of identical strings is ~10 with df>1 corpus


def test_scorers_ordering():
    # two documents: CIDEr's tf-idf needs a non-degenerate corpus (with one
    # document every df == N and all weights vanish — pycocoevalcap behaves
    # identically)
    gts = {0: ["a man runs across the field"],
           1: ["the dog eats a red ball"]}
    good = {0: ["a man runs across a field"],
            1: ["the dog eats a red ball quickly"]}
    bad = {0: ["purple elephants sing opera"],
           1: ["quantum turnips whisper loudly"]}
    for scorer in [Bleu(4), Meteor(), Rouge(), Cider()]:
        sg, _ = scorer.compute_score(gts, good)
        sb, _ = scorer.compute_score(gts, bad)
        if isinstance(sg, list):
            sg, sb = sg[0], sb[0]
        assert sg > sb, type(scorer)


def test_ptb_tokenize():
    out = ptb_tokenize({0: [{"caption": "A man, who can't stop; RUNS!"}]})
    assert out[0][0] == "a man who ca n't stop runs"


def test_dp_assignment():
    s = np.array([[0.5, 0.1], [0.2, 0.9]])
    assert abs(chased_dp_assignment(s) - 1.4) < 1e-9
    s2 = np.array([[1.0]])
    assert chased_dp_assignment(s2) == 1.0


def test_eval_metrics_perfect_vs_garbage(tmp_path):
    gt, pred, para = make_files(tmp_path, perfect=True)
    scores = eval_metrics(pred, [gt], [para])
    assert scores["METEOR"] > 0.4
    assert scores["Recall"] > 0.99 and scores["Precision"] > 0.99
    assert scores["soda_c"] > 0.4
    assert scores["para_Bleu_4"] > 0.9
    assert scores["MetaScore"] == scores["METEOR"] + scores["soda_c"]

    gt2, pred2, para2 = make_files(tmp_path, perfect=False)
    bad = eval_metrics(pred2, [gt2], [para2])
    assert bad["METEOR"] < 0.05
    assert bad["Recall"] < 0.01
    assert bad["soda_c"] < 0.01


def test_eval_grounding_schema(tmp_path):
    gt = {"v_x": {"timestamps": [[0, 10], [20, 30]], "sentences": ["a", "b"]}}
    res = {"results": {
        "v_x-0": [{"timestamp": [0, 10], "score": 1.0, "cl_score": 0,
                   "sentence": "a"}],
        "v_x-1": [{"timestamp": [0, 5], "score": 1.0, "cl_score": 0,
                   "sentence": "b"}],
    }}
    gt_p, res_p = tmp_path / "g.json", tmp_path / "r.json"
    gt_p.write_text(json.dumps(gt))
    res_p.write_text(json.dumps(res))
    s = eval_metrics_grounding(str(res_p), str(gt_p))
    assert s["grounding_R@1IOU0.7"] == 0.5
    assert abs(s["grounding_mIOU"] - 0.5) < 1e-6


def test_eval_tal(tmp_path):
    gt = {"database": {
        "vid1": {"subset": "validation", "annotations": [
            {"segment": [0, 10], "label": "run"},
            {"segment": [20, 30], "label": "jump"}]},
    }, "taxonomy": [], "version": "1.3"}
    pred = {"results": {
        "vid1": [{"segment": [0, 10], "label": "run", "score": 0.9},
                 {"segment": [20, 30], "label": "jump", "score": 0.8}]},
        "version": "1.3", "external_data": {}}
    g, p = tmp_path / "tg.json", tmp_path / "tp.json"
    g.write_text(json.dumps(gt))
    p.write_text(json.dumps(pred))
    out = eval_tal(str(g), str(p))
    assert out["TAL_Average_mAP"] > 0.99


def test_eval_dvc_2018_cider_dispatch(tmp_path):
    """'2018_cider': tIoU {0.9} only, verbose scorer set, corpus-level
    scoring (reference eval_dvc.py:17-20 + evaluate2018_cider.py:226)."""
    gt = {"v_a": {"duration": 30.0, "timestamps": [[0, 10], [12, 25]],
                  "sentences": ["a man runs across the field",
                                "the dog eats a red ball"]}}
    res = {"results": {"v_a": [
        {"timestamp": [0, 10], "sentence": "a man runs across the field"},
        {"timestamp": [12, 25], "sentence": "the dog eats a red ball"}]},
        "version": "V", "external_data": {}}
    gt_p, res_p = tmp_path / "gt.json", tmp_path / "res.json"
    gt_p.write_text(json.dumps(gt))
    res_p.write_text(json.dumps(res))

    out = eval_dvc(str(res_p), [str(gt_p)], version="2018_cider")
    # single tIoU bucket (0.9)
    assert len(out["CIDEr"]) == 1 and len(out["Recall"]) == 1
    # verbose is forced: the full scorer set runs
    for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in out
    # corpus-level CIDEr of identical strings with a 2-doc corpus is 10
    assert out["CIDEr"][0] == pytest.approx(10.0, abs=1e-6)

    # plain 2018 non-verbose runs METEOR only (evaluate2018.py:54-63)
    out18 = eval_dvc(str(res_p), [str(gt_p)], version="2018")
    assert "METEOR" in out18 and "CIDEr" not in out18
    assert len(out18["METEOR"]) == 4
    # and verbose restores the full set, per-video averaged
    out18v = eval_dvc(str(res_p), [str(gt_p)], version="2018", verbose=True)
    assert out18v["Bleu_4"][0] > 0.99
