"""Approximate-metric marking at the point of emission (VERDICT r4 #6).

When METEOR runs without the jar's corpus-derived data files
(function/en.words, WordNet synonyms, paraphrase-en — reference
densevid_eval3/pycocoevalcap_bak/meteor/meteor.py:12-25 jar internals) or
SPICE runs with the rule-based chunker instead of CoreNLP (reference
evaluate2018_cider.py:62), the emitted score dicts must carry an
``"approx": [...]`` marker so no downstream parity claim can silently
consume an approximate number — and the marker must be invisible to the
model-selection logic (reference train.py:475-494 criteria).
"""
import json

import pytest

pytestmark = pytest.mark.core


@pytest.fixture()
def tiny_eval_files(tmp_path):
    gt = {"v_a": {"duration": 30.0, "timestamps": [[0, 10], [12, 25]],
                  "sentences": ["a man runs across the field",
                                "the dog eats a red ball"]}}
    res = {"results": {"v_a": [
        {"timestamp": [0, 10], "sentence": "a man runs across the field"},
        {"timestamp": [12, 25], "sentence": "the dog eats a red ball"}]},
        "version": "VERSION 1.0", "external_data": {}}
    gt_p, res_p = tmp_path / "gt.json", tmp_path / "res.json"
    gt_p.write_text(json.dumps(gt))
    res_p.write_text(json.dumps(res))
    para_p = tmp_path / "para_gt.json"
    para_p.write_text(json.dumps(
        {v: " ".join(d["sentences"]) for v, d in gt.items()}))
    return str(res_p), str(gt_p), str(para_p)


def _expected_meteor_markers():
    from gvl_tpu.eval.metrics import meteor
    return meteor.approximations()


def test_meteor_module_markers_in_this_process():
    # In this sandbox none of the jar data files are installed, so all
    # three METEOR markers must be up (they clear individually once
    # make_goldens.sh step 6 dumps the jar data on a networked host).
    marks = _expected_meteor_markers()
    assert "meteor_function_words" in marks
    assert marks == sorted(marks)


def test_dvc_eval_emits_approx(tiny_eval_files):
    from gvl_tpu.eval.metrics.dvc_eval import eval_dvc
    res_p, gt_p, _ = tiny_eval_files
    out = eval_dvc(res_p, [gt_p], version="2018")
    assert set(out["approx"]) == set(_expected_meteor_markers())
    # every other value keeps the per-tIoU list contract
    for k, v in out.items():
        if k != "approx":
            assert isinstance(v, list) and all(
                isinstance(x, float) for x in v), k

    # verbose 2018_cider adds SPICE → spice_parser joins the set
    outc = eval_dvc(res_p, [gt_p], version="2018_cider")
    assert "spice_parser" in outc["approx"]

    # no_lang_eval runs no approximate scorer → no marker at all
    outn = eval_dvc(res_p, [gt_p], version="2018", no_lang_eval=True)
    assert "approx" not in outn


def test_soda_para_emit_approx(tiny_eval_files):
    from gvl_tpu.eval.metrics.soda import eval_soda
    from gvl_tpu.eval.metrics.para import eval_para
    res_p, gt_p, para_p = tiny_eval_files
    assert set(eval_soda(res_p, [gt_p])["approx"]) == \
        set(_expected_meteor_markers())
    assert set(eval_para(res_p, [para_p])["approx"]) == \
        set(_expected_meteor_markers())


def test_eval_metrics_facade_merges_and_stays_numeric(tiny_eval_files):
    from gvl_tpu.eval.metrics import eval_metrics
    res_p, gt_p, para_p = tiny_eval_files
    score = eval_metrics(res_p, [gt_p], para_gt_filenames=[para_p],
                         dvc_eval_version="2018")
    approx = score["approx"]
    assert set(approx) >= set(_expected_meteor_markers())
    assert approx == sorted(set(approx))          # deduped, deterministic
    # all other values are plain floats — averaging was not disturbed
    for k, v in score.items():
        if k != "approx":
            assert isinstance(v, float), k
    assert score["MetaScore"] == pytest.approx(
        score["METEOR"] + score["soda_c"])


def test_selection_and_writer_ignore_marker(tmp_path, tiny_eval_files):
    from gvl_tpu.eval.metrics import eval_metrics
    from gvl_tpu.train.loop import criteria_score
    from gvl_tpu.utils.logging import MetricsWriter
    res_p, gt_p, para_p = tiny_eval_files
    score = eval_metrics(res_p, [gt_p], para_gt_filenames=[para_p])
    # best-checkpoint criteria read specific numeric keys only
    for task in ("dvc", "pc"):
        assert isinstance(criteria_score(task, score), float)
    # the jsonl/TB writer silently drops the non-numeric marker
    w = MetricsWriter(str(tmp_path))
    w.write(1, score, prefix="eval/")
    rec = json.loads(open(w.path).read().strip().splitlines()[-1])
    assert "eval/approx" not in rec
    assert rec["eval/METEOR"] == pytest.approx(score["METEOR"])


def test_parity_comparison_fails_loudly_on_approx():
    # the marker is a list on purpose: float() raises, so a blind
    # "compare every value as float" parity check cannot silently
    # consume an approximate score dict
    with pytest.raises(TypeError):
        float(["meteor_function_words"])  # type: ignore[arg-type]
