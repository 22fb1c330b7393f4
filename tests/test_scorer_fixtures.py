"""Scorer golden-fixture plumbing (VERDICT r2 item 7):

- replay: when goldens/scorer_fixtures.json exists (dumped from the Java
  meteor-1.5.jar / PTBTokenizer jars on a networked host via
  tools/dump_scorer_fixtures.py), hold our ports to its numbers;
- format: the dump script's --use-port mode writes the same schema from our
  ports; dumping + replaying it end-to-end validates the fixture format and
  loader in-sandbox (explicitly NOT jar parity);
- synonym stage: the WordNet matcher activates when synset data is
  available — proven with a stub wordnet here, and against the real nltk
  corpus when installed.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "goldens", "scorer_fixtures.json")


def _replay(path):
    from gvl_tpu.eval.metrics.meteor import Meteor
    from gvl_tpu.eval.metrics.ptb_tokenizer import ptb_tokenize

    with open(path) as f:
        data = json.load(f)
    assert data["meteor"] and data["ptb"]
    meteor = Meteor()
    for case in data["meteor"]:
        score, _ = meteor.score_segment(case["hyp"], case["refs"])
        assert abs(score - case["score"]) < 2e-3, \
            (case["hyp"], score, case["score"])
    for case in data["ptb"]:
        toks = ptb_tokenize({"0": [{"caption": case["raw"]}]})["0"][0]
        assert toks.split() == case["tokens"], (case["raw"], toks)
    return data


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="no jar-dumped scorer fixtures (networked-host "
                           "artifact, tools/dump_scorer_fixtures.py)")
def test_replay_jar_fixtures():
    data = _replay(GOLDEN)
    assert data["source"] == "jar"


def test_fixture_format_roundtrip(tmp_path):
    out = tmp_path / "fixtures.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "dump_scorer_fixtures.py"),
         "--use-port", "--out", str(out)],
        check=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    data = _replay(str(out))
    assert data["source"] == "port"


class _StubSynset:
    def __init__(self, name):
        self._n = name

    def name(self):
        return self._n


class _StubWordnet:
    """cat/feline share a synset; nothing else does."""

    def synsets(self, w):
        if w in ("cat", "feline"):
            return [_StubSynset("cat.n.01")]
        return []


def test_synonym_stage_with_stub_wordnet(monkeypatch):
    import gvl_tpu.eval.metrics.meteor as M
    monkeypatch.setattr(M, "_wordnet_cache", _StubWordnet())
    with_syn, _ = M.Meteor(use_synonyms=True).score_segment(
        "feline", ["cat"])
    without, _ = M.Meteor(use_synonyms=False).score_segment(
        "feline", ["cat"])
    assert with_syn > 0.3 and without == 0.0   # 0.32: syn weight 0.8 x chunk penalty


def test_synonym_stage_with_real_wordnet():
    try:
        from nltk.corpus import wordnet
        wordnet.synsets("test")
    except Exception:
        pytest.skip("nltk wordnet corpus not installed")
    from gvl_tpu.eval.metrics.meteor import Meteor
    s, _ = Meteor(use_synonyms=True).score_segment("sofa", ["couch"])
    assert s > 0.3
