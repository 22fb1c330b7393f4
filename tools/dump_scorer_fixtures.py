"""Dump Java-scorer golden fixtures for the METEOR / PTBTokenizer ports.

On a NETWORKED host with the reference checkout (meteor-1.5.jar +
stanford-corenlp jar under densevid_eval3/pycocoevalcap_bak/), this records
jar input->output pairs on a canned sentence set:

    python tools/dump_scorer_fixtures.py --ref /path/to/GVL \
        --out goldens/scorer_fixtures.json

The replay tests (tests/test_scorer_fixtures.py) then hold
gvl_tpu/eval/metrics/{meteor,ptb_tokenizer}.py to those numbers. In this
sandbox (no jars), `--use-port` writes the same fixture format from our own
ports — that validates the schema and replay plumbing, NOT jar parity; the
file it writes is marked "source": "port".
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# deliberately quirky set: casing, punctuation, contractions, hyphens,
# synonyms, word order, repetition, empty-ish strings
CASES = [
    ("a man is playing a guitar", ["a man plays the guitar"]),
    ("the dog runs quickly across the yard",
     ["a dog sprints across the yard", "the dog runs fast"]),
    ("she doesn't like it", ["she does not like it"]),
    ("people are dancing", ["a group of people dance together"]),
    ("Add the chopped onions to the pan.",
     ["add onion pieces into the pan"]),
    ("a b c d", ["d c b a"]),
    ("hello", ["hello"]),
    ("completely unrelated words here", ["nothing matches at all"]),
]

PTB_SENTENCES = [
    "A man, playing guitar -- loudly!",
    "she doesn't like it...",
    "Mix 1/2 cup of flour (sifted) with \"sugar\".",
    "U.S. officials said it's a state-of-the-art system.",
    "don't stop; keep going?",
]


def dump_with_jars(ref_path: str):
    sys.path.insert(0, os.path.join(ref_path, "densevid_eval3"))
    from pycocoevalcap_bak.meteor.meteor import Meteor as JarMeteor
    from pycocoevalcap_bak.tokenizer.ptbtokenizer import PTBTokenizer

    meteor = JarMeteor()
    m_fixtures = []
    for hyp, refs in CASES:
        gts = {"0": refs}
        res = {"0": [hyp]}
        score, _ = meteor.compute_score(gts, res)
        m_fixtures.append({"hyp": hyp, "refs": refs,
                           "score": float(score)})

    tok = PTBTokenizer()
    caps = {str(i): [{"caption": s}] for i, s in enumerate(PTB_SENTENCES)}
    toks = tok.tokenize(caps)
    p_fixtures = [{"raw": s, "tokens": toks[str(i)][0].split()}
                  for i, s in enumerate(PTB_SENTENCES)]
    return {"source": "jar", "meteor": m_fixtures, "ptb": p_fixtures}


def dump_with_ports():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gvl_tpu.eval.metrics.meteor import Meteor
    from gvl_tpu.eval.metrics.ptb_tokenizer import ptb_tokenize

    meteor = Meteor()
    m_fixtures = []
    for hyp, refs in CASES:
        score, _ = meteor.score_segment(hyp, refs)
        m_fixtures.append({"hyp": hyp, "refs": refs, "score": float(score)})
    caps = {str(i): [{"caption": s}] for i, s in enumerate(PTB_SENTENCES)}
    toks = ptb_tokenize(caps)
    p_fixtures = [{"raw": s, "tokens": toks[str(i)][0].split()}
                  for i, s in enumerate(PTB_SENTENCES)]
    return {"source": "port", "meteor": m_fixtures, "ptb": p_fixtures}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", help="reference GVL checkout (with jars)")
    ap.add_argument("--out", default="goldens/scorer_fixtures.json")
    ap.add_argument("--use-port", action="store_true",
                    help="write fixtures from our ports (format validation "
                         "only — NOT jar goldens)")
    args = ap.parse_args()

    data = dump_with_ports() if args.use_port else dump_with_jars(args.ref)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {len(data['meteor'])} meteor + {len(data['ptb'])} ptb "
          f"fixtures (source={data['source']}) to {args.out}")


if __name__ == "__main__":
    main()
