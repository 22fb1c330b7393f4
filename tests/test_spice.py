"""SPICE port tests: scene-graph extraction, tuple categories, F1/NaN
conventions, the pycocoevalcap wrapper contract, and the 2018_cider
verbose-set integration (reference pycocoevalcap_bak/spice/spice.py +
evaluate2018_cider.py:62)."""

import json
import math

import numpy as np
import pytest

from gvl_tpu.eval.metrics.spice import (Spice, parse_scene_graph,
                                        score_pair)

pytestmark = pytest.mark.core


class TestParser:
    def test_object_attribute_relation(self):
        t = parse_scene_graph("a young girl sits on the large bench").tuples()
        assert ("girl",) in t and ("bench",) in t
        assert ("girl", "young") in t
        assert ("bench", "large") in t
        assert ("girl", "sit on", "bench") in t

    def test_compound_noun_merges(self):
        t = parse_scene_graph("a tennis court").tuples()
        assert ("tennis court",) in t

    def test_cardinality(self):
        t = parse_scene_graph("two men ride on a boat").tuples()
        assert ("man", "2") in t
        assert ("man", "ride on", "boat") in t

    def test_copula_adjectives(self):
        t = parse_scene_graph("the dog is black and white").tuples()
        assert ("dog", "black") in t and ("dog", "white") in t

    def test_progressive_verb_clause(self):
        # 'is cooking eggs' must parse as a verb clause, not a premodifier
        t = parse_scene_graph("a man is cooking eggs in a pan").tuples()
        assert ("man", "cook", "egg") in t
        assert ("egg", "in", "pan") in t

    def test_participle_premodifier(self):
        t = parse_scene_graph("a running man crosses the street").tuples()
        assert ("man", "run") in t
        assert ("man", "cross", "street") in t

    def test_intransitive_verb_becomes_attribute(self):
        t = parse_scene_graph("the woman smiles").tuples()
        assert ("woman", "smile") in t

    def test_nominal_predicate(self):
        t = parse_scene_graph("the man is a doctor").tuples()
        assert ("man", "doctor") in t

    def test_bare_pp_relation(self):
        t = parse_scene_graph("a cat on the table").tuples()
        assert ("cat", "on", "table") in t

    def test_lemmatization(self):
        # plural nouns and inflected verbs normalize to base forms
        t = parse_scene_graph("three dogs ate the loaves").tuples()
        assert ("dog",) in t and ("loaf",) in t
        assert ("dog", "eat", "loaf") in t
        assert ("dog", "3") in t


class TestScoring:
    def test_identical_is_one(self):
        s = score_pair("a man rides a horse", ["a man rides a horse"])
        assert s["All"]["f"] == pytest.approx(1.0)

    def test_disjoint_is_zero(self):
        s = score_pair("a man rides a horse", ["the cat sleeps on a mat"])
        assert s["All"]["f"] == 0.0

    def test_inflection_invariance(self):
        # stem/lemma canonicalization: morphology doesn't break matching
        a = score_pair("a man riding horses", ["the men ride a horse"])
        assert a["Object"]["f"] == pytest.approx(1.0)

    def test_refs_merged_before_matching(self):
        # the union protocol: recall denominators come from the MERGED ref
        # graph, so a duplicate tuple across refs counts once
        s1 = score_pair("a dog", ["a dog", "a dog"])
        s2 = score_pair("a dog", ["a dog"])
        assert s1["All"] == s2["All"]

    def test_empty_category_is_nan(self):
        s = score_pair("a man rides a horse", ["a man rides a horse"])
        assert math.isnan(s["Color"]["f"])      # no color tuples anywhere
        assert math.isnan(s["Cardinality"]["f"])

    def test_color_size_categories(self):
        s = score_pair("a big red ball", ["the large red ball"])
        assert s["Color"]["f"] == pytest.approx(1.0)
        assert s["Size"]["f"] == 0.0            # big vs large: no WordNet
        s2 = score_pair("a big ball", ["a big ball"])
        assert s2["Size"]["f"] == pytest.approx(1.0)

    def test_precision_recall_direction(self):
        # extra candidate tuples hurt precision, missing ones hurt recall
        s = score_pair("a man", ["a man rides a brown horse"])
        assert s["All"]["p"] == pytest.approx(1.0)
        assert s["All"]["r"] < 1.0


class TestWrapper:
    def test_compute_score_contract(self):
        sc = Spice()
        gts = {2: ["a man rides a horse"], 1: ["a red car on the road"]}
        res = {2: ["a man riding a horse"], 1: ["a red car on a road"]}
        avg, scores = sc.compute_score(gts, res)
        assert sc.method() == "SPICE"
        assert len(scores) == 2
        # scores follow sorted(gts.keys()) order (reference spice.py:34)
        assert set(scores[0]) == {"All", "Object", "Attribute", "Relation",
                                  "Cardinality", "Color", "Size"}
        assert avg == pytest.approx(
            np.mean([s["All"]["f"] for s in scores]))
        assert 0.5 < avg <= 1.0

    def test_wrapper_asserts_contract(self):
        sc = Spice()
        with pytest.raises(AssertionError):
            sc.compute_score({1: ["a"]}, {2: ["b"]})      # key mismatch
        with pytest.raises(AssertionError):
            sc.compute_score({1: ["a"]}, {1: ["b", "c"]})  # 2 candidates


def test_2018_cider_verbose_includes_spice(tmp_path):
    """eval_dvc('2018_cider') now reports SPICE alongside the verbose set
    (reference evaluate2018_cider.py:62)."""
    from gvl_tpu.eval.metrics.dvc_eval import eval_dvc
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
    assert "SPICE" in out and len(out["SPICE"]) == 1
    assert out["SPICE"][0] == pytest.approx(1.0)  # identical captions
    # non-verbose 2018 still excludes it
    out18 = eval_dvc(str(res_p), [str(gt_p)], version="2018")
    assert "SPICE" not in out18
