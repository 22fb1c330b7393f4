#!/usr/bin/env python
"""Quantify how sensitive the DVC/SODA metric outputs are to the METEOR
function-word list approximation (VERDICT r3 next-round #4).

The Meteor 1.5 jar weights content words delta=0.75 and function words 0.25
using a corpus-derived `function/en.words` list that is absent in-sandbox;
gvl_tpu/eval/metrics/meteor.py approximates it with the English closed
classes. This tool A/Bs the FULL harness outputs (eval_dvc METEOR per-tIoU
average + eval_soda F1) on synthetic corpora under:

  approx    the shipped closed-class list (production default)
  none      empty list => every word is content => the delta split is
            inert (equivalent to delta=1.0: the list cannot matter)
  perturbed approx with every 5th entry dropped (list-error sensitivity)
  file      (optional, --function_words) a dumped jar `function/en.words`

If max spread vs `approx` stays well under the 0.5-pt parity bar the
approximation is safe; the measured table lives in DESIGN.md ("METEOR
function-word sensitivity").

Usage: python tools/meteor_sensitivity.py [--n_videos 40] [--seed 0]
       [--function_words goldens/meteor_data/en.words]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# realistic caption vocabulary: heavy in articles/preps/pronouns so the
# function-word split actually engages (DVC captions average ~40% function
# words)
WORDS = ("a the man woman is are runs jumps over red blue ball park and "
         "then stops to look at it while holding his her dog quickly "
         "slowly in on with of they we").split()


def make_corpus(tmp, n_videos=40, seed=0):
    rng = np.random.RandomState(seed)
    vids = [f"v{i}" for i in range(n_videos)]
    durations = {v: float(rng.uniform(20, 60)) for v in vids}

    def sentence(lo=5, hi=12):
        n = rng.randint(lo, hi + 1)
        return " ".join(WORDS[i] for i in rng.randint(0, len(WORDS), n))

    def events(dur, n):
        out = []
        for _ in range(n):
            s = float(rng.uniform(0, dur * 0.8))
            out.append([round(s, 2), round(s + rng.uniform(1, dur - s), 2)])
        return out

    gt = {}
    for v in vids:
        ts = events(durations[v], rng.randint(2, 5))
        gt[v] = {"duration": durations[v], "timestamps": ts,
                 "sentences": [sentence() for _ in ts]}
    results = {}
    for v in vids:
        preds = []
        for j, ts in enumerate(gt[v]["timestamps"]):
            jit = rng.uniform(-3, 3, 2)
            t = [max(0.0, ts[0] + jit[0]), ts[1] + abs(jit[1])]
            # half near-copies (high METEOR), half fresh (low METEOR):
            # spreads scores across the range where delta-weighting matters
            if rng.rand() < 0.5:
                toks = gt[v]["sentences"][j].split()
                keep = [t_ for t_ in toks if rng.rand() < 0.8]
                sent = " ".join(keep + sentence(2, 4).split())
            else:
                sent = sentence()
            preds.append({"timestamp": [round(t[0], 2), round(t[1], 2)],
                          "sentence": sent,
                          "proposal_score": float(rng.rand())})
        results[v] = preds
    ref = os.path.join(tmp, "ref.json")
    pred = os.path.join(tmp, "pred.json")
    json.dump(gt, open(ref, "w"))
    json.dump({"results": results, "version": "VERSION 1.0",
               "external_data": {}}, open(pred, "w"))
    return pred, [ref]


def score(pred, refs):
    from gvl_tpu.eval.metrics.dvc_eval import eval_dvc
    from gvl_tpu.eval.metrics.soda import eval_soda
    dvc = eval_dvc(pred, refs, version="2018")
    soda = eval_soda(pred, refs)
    return {"DVC_METEOR(avg over tIoU) x100":
            100 * float(np.mean(dvc["METEOR"])),
            "SODA_c F1 x100": 100 * float(soda["soda_c"])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_videos", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--function_words", default=None,
                    help="dumped jar function/en.words to include in the A/B")
    args = ap.parse_args()

    from gvl_tpu.eval.metrics.meteor import (FUNCTION_WORDS,
                                             default_function_words,
                                             load_function_words)

    variants = {"approx (production)": FUNCTION_WORDS,
                "none (delta inert)": frozenset(),
                "perturbed (-20%)": frozenset(
                    w for i, w in enumerate(sorted(FUNCTION_WORDS))
                    if i % 5 != 0)}
    if args.function_words:
        variants["jar file"] = load_function_words(args.function_words)

    with tempfile.TemporaryDirectory() as tmp:
        pred, refs = make_corpus(tmp, args.n_videos, args.seed)
        rows = {}
        for name, words in variants.items():
            with default_function_words(words):
                rows[name] = score(pred, refs)

    base = rows["approx (production)"]
    metrics = list(base)
    print(f"{'variant':24s} " + "  ".join(f"{m:>28s}" for m in metrics)
          + f"  {'max |delta| vs approx':>22s}")
    for name, r in rows.items():
        spread = max(abs(r[m] - base[m]) for m in metrics)
        print(f"{name:24s} " + "  ".join(f"{r[m]:28.4f}" for m in metrics)
              + f"  {spread:22.4f}")
    worst = max(max(abs(r[m] - base[m]) for m in metrics)
                for n, r in rows.items() if n != "approx (production)")
    bar = 0.2
    print(f"\nmax spread {worst:.4f} pts vs the ~{bar} budget inside the "
          f"0.5-pt parity bar: "
          f"{'OK — approximation is safe' if worst < bar else 'EXCEEDS — call out per-metric in DESIGN.md'}")


if __name__ == "__main__":
    main()
