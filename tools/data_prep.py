#!/usr/bin/env python
"""Dataset preparation utilities.

One CLI covering the reference's scattered prep scripts (reference: data/**
converters — hdf5->npy feature dumps, TACoS annotation building from 2D-TAN
json, paragraph-GT construction, grounding-GT construction, vocabulary
building, MSVG annotation splitting).

Usage examples:
  python tools/data_prep.py h5_to_npy --inputs feats.h5 --out_dir tsp/
  python tools/data_prep.py build_para_gt --anno yc2_val.json --out para.json
  python tools/data_prep.py build_grounding_gt --annos val_1.json \
      --out val1_for_grounding.json
  python tools/data_prep.py build_vocab --annos train.json --out vocab.json
  python tools/data_prep.py build_tacos_anno --tan2d train.json --out out.json
  python tools/data_prep.py split_anno --anno train.json --out split.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def h5_to_npy(inputs, out_dir):
    """Explode per-video datasets of .h5 feature files into <key>.npy
    (reference: data/*/features/convert_*_h5_to_npy.py)."""
    try:
        import h5py
    except ImportError as e:
        raise SystemExit("h5py is not installed in this environment; "
                         "convert the h5 file where it is available") from e
    os.makedirs(out_dir, exist_ok=True)
    for in_path in inputs:
        with h5py.File(in_path, "r") as d:
            for key in d.keys():
                np.save(os.path.join(out_dir, key + ".npy"), d[key][:])
                print("wrote", key)


def build_para_gt(anno_path, out_path):
    """Caption annotations -> {vid: 'sent. sent. ...'} paragraph GT
    (reference: data/yc2/captiondata/para/convert_to_para.py)."""
    with open(anno_path) as f:
        d = json.load(f)
    out = {k: ". ".join(v["sentences"]) for k, v in d.items()}
    with open(out_path, "w") as f:
        json.dump(out, f)


def build_grounding_gt(anno_paths, out_path, strip_prefix=True):
    """Merge caption annotations into per-sentence grounding GT keyed by
    video id without the 'v_' prefix (reference:
    data/anet/captiondata/grounding/process_grounding_gt.py)."""
    annos = [json.load(open(p)) for p in anno_paths]
    keys = set()
    for a in annos:
        keys |= set(a.keys())
    out = {}
    for vid in keys:
        stamps, duration = [], None
        for a in annos:
            if vid in a:
                stamps.extend(a[vid]["timestamps"])
                duration = a[vid]["duration"]
        k = vid[2:] if strip_prefix else vid
        out[k] = {"timestamps": stamps, "duration": duration}
    with open(out_path, "w") as f:
        json.dump(out, f)


def build_vocab(anno_paths, out_path, min_count=1):
    """Build a Translator vocabulary json from caption annotations
    (reference: misc/build_vocab.py)."""
    from gvl_tpu.data.vocabulary import build_vocabulary
    sents = []
    for p in anno_paths:
        with open(p) as f:
            for v in json.load(f).values():
                sents.extend(v["sentences"])
    vocab = build_vocabulary(sents, min_count)
    with open(out_path, "w") as f:
        json.dump(vocab, f)
    print(f"vocab size: {len(vocab['word_to_ix'])}")


def build_tacos_anno(tan2d_path, out_path):
    """2D-TAN TACoS json -> our annotation format; frame-index timestamps
    become seconds via fps (reference: data/tacos/build_anno.py:32-47)."""
    with open(tan2d_path) as f:
        anno = json.load(f)
    out = {}
    for key, v in anno.items():
        duration = v["num_frames"] / v["fps"]
        stamps = [[max(t[0] / v["fps"], 0.0), min(t[1] / v["fps"], duration)]
                  for t in v["timestamps"]]
        out[key[:-4] if key.endswith(".avi") else key] = {
            "duration": duration, "timestamps": stamps,
            "sentences": v["sentences"]}
    with open(out_path, "w") as f:
        json.dump(out, f)


def split_anno(anno_path, out_path):
    """Split each multi-sentence video into per-sentence pseudo-videos for
    single-sentence grounding training: key '<i>_<vid>' (reference: the
    train_with_split_anno data layout, video_dataset.py:264)."""
    with open(anno_path) as f:
        d = json.load(f)
    out = {}
    for vid, v in d.items():
        for i, (ts, s) in enumerate(zip(v["timestamps"], v["sentences"])):
            out[f"{i:02d}_{vid}"] = {"duration": v["duration"],
                                     "timestamps": [ts], "sentences": [s]}
    with open(out_path, "w") as f:
        json.dump(out, f)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("h5_to_npy")
    s.add_argument("--inputs", nargs="+", required=True)
    s.add_argument("--out_dir", required=True)
    s = sub.add_parser("build_para_gt")
    s.add_argument("--anno", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("build_grounding_gt")
    s.add_argument("--annos", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("build_vocab")
    s.add_argument("--annos", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--min_count", type=int, default=1)
    s = sub.add_parser("build_tacos_anno")
    s.add_argument("--tan2d", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("split_anno")
    s.add_argument("--anno", required=True)
    s.add_argument("--out", required=True)
    a = p.parse_args()
    if a.cmd == "h5_to_npy":
        h5_to_npy(a.inputs, a.out_dir)
    elif a.cmd == "build_para_gt":
        build_para_gt(a.anno, a.out)
    elif a.cmd == "build_grounding_gt":
        build_grounding_gt(a.annos, a.out)
    elif a.cmd == "build_vocab":
        build_vocab(a.annos, a.out, a.min_count)
    elif a.cmd == "build_tacos_anno":
        build_tacos_anno(a.tan2d, a.out)
    elif a.cmd == "split_anno":
        split_anno(a.anno, a.out)


if __name__ == "__main__":
    main()
