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


def _group_by_timestamp(v, rng):
    """Group a video's sentences by identical timestamp and pad every group
    to the max annotation count by resampling (reference:
    data/tacos/rebuild_anno_for_multi.py:18-32)."""
    groups = {}
    for ts, s in zip(v["timestamps"], v["sentences"]):
        groups.setdefault(tuple(ts), []).append(s)
    max_n = max(len(g) for g in groups.values())
    for k, g in groups.items():
        if len(g) < max_n:
            g.extend(rng.choice(g, size=max_n - len(g)).tolist())
    return groups, max_n


def rebuild_tacos_multi(anno_path, out_dir, seed=0):
    """Per-timestamp sentence groups -> one multi-sentence pseudo-video per
    annotation group, key '<group:03d><vid>', plus grounding/para GT files
    (reference: data/tacos/rebuild_anno_for_multi.py)."""
    rng = np.random.RandomState(seed)
    with open(anno_path) as f:
        d = json.load(f)
    name = os.path.splitext(os.path.basename(anno_path))[0]
    new, g_new, p_new = {}, {}, {}
    for key, v in d.items():
        groups, max_n = _group_by_timestamp(v, rng)
        for gid in range(max_n):
            gkey = f"{gid:03d}" + key
            stamps = [list(ts) for ts in sorted(groups)]
            sents = [groups[ts][gid] for ts in sorted(groups)]
            new[gkey] = {"duration": v["duration"], "timestamps": stamps,
                         "sentences": sents}
            g_new[gkey] = {"duration": v["duration"], "timestamps": stamps}
            p_new[gkey] = "".join(s + "." for s in sents)
    os.makedirs(os.path.join(out_dir, "grounding"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "para"), exist_ok=True)
    json.dump(new, open(os.path.join(out_dir, f"rebuild_{name}.json"), "w"))
    json.dump(g_new, open(os.path.join(
        out_dir, "grounding", f"rebuild_grounding_{name}.json"), "w"))
    json.dump(p_new, open(os.path.join(
        out_dir, "para", f"rebuild_para_{name}.json"), "w"))


def rebuild_sub_para(anno_path, out_dir, min_events=2, max_events=8,
                     random_split=False, seed=0):
    """Split each annotation group into sub-paragraph pseudo-videos of at
    most max_events events each (reference:
    data/tacos/rebuild_sub_para_for_eval.py)."""
    import random as pyrandom
    pyrandom.seed(seed)
    rng = np.random.RandomState(seed)
    with open(anno_path) as f:
        d = json.load(f)
    name = os.path.splitext(os.path.basename(anno_path))[0]
    prefix = f"min{min_events}_max{max_events}_"
    new, g_new, p_new = {}, {}, {}

    def split_indices(n):
        if random_split:
            lo, hi = n // max_events, n // min_events
            # stdlib randint is INCLUSIVE of hi+1 — reproduced deliberately:
            # the reference uses random.randint(lo, hi + 1) with the same
            # inclusive semantics (rebuild_sub_para_for_eval.py:8-10)
            k = pyrandom.randint(lo, hi + 1)
            sizes = [n // k] * k if k else [n]
            if k and n % k:
                sizes.append(n % k)
        else:
            k = n // max_events
            sizes = [max_events] * k
            if n - k * max_events > 0:
                sizes.append(n - k * max_events)
        idx = list(range(n))
        pyrandom.shuffle(idx)
        out, start = [], 0
        for sz in sizes:
            out.append(sorted(idx[start:start + sz]))
            start += sz
        return out

    for key, v in d.items():
        groups, max_n = _group_by_timestamp(v, rng)
        keys_sorted = sorted(groups)
        pid = 0
        for gid in range(max_n):
            for part in split_indices(len(keys_sorted)):
                stamps = [list(keys_sorted[i]) for i in part]
                sents = [groups[keys_sorted[i]][gid] for i in part]
                pkey = f"{pid:03d}" + key
                new[pkey] = {"duration": v["duration"],
                             "timestamps": stamps, "sentences": sents}
                g_new[pkey] = {"duration": v["duration"],
                               "timestamps": stamps}
                p_new[pkey] = "".join(s + "." for s in sents)
                pid += 1
    os.makedirs(os.path.join(out_dir, "grounding"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "para"), exist_ok=True)
    json.dump(new, open(os.path.join(
        out_dir, f"{prefix}rebuild_{name}.json"), "w"))
    json.dump(g_new, open(os.path.join(
        out_dir, "grounding", f"{prefix}rebuild_grounding_{name}.json"), "w"))
    json.dump(p_new, open(os.path.join(
        out_dir, "para", f"{prefix}rebuild_para_{name}.json"), "w"))


def merge_grounding_results(p1, p2, gt_path, out_path):
    """Merge a second grounding-result JSON behind the first: the second
    file's per-video anno_ids are shifted past the GT sentence count of
    the first (reference:
    data/anet/captiondata/grounding/merge_grounding_results.py)."""
    d1 = json.load(open(p1))["results"]
    d2 = json.load(open(p2))["results"]
    gt = json.load(open(gt_path))
    # NOTE (inherited from the reference): the second file's per-video
    # anno ids are assumed contiguous from 0; pre-offset files would need
    # renumbering first
    key2 = [k[:11] for k in d2.keys()]
    for vid in set(k[:11] for k in d1) | set(key2):
        pid = len(gt.get("v_" + vid, {}).get("timestamps", []))
        for j in range(key2.count(vid)):
            old = f"{vid}-{j}"
            if old in d2:
                d1[f"{vid}-{j + pid}"] = d2[old]
    json.dump({"results": d1}, open(out_path, "w"))


def process_anet13(anet13_path, cap_train_path, out_dir,
                   feature_dir=None):
    """ActivityNet-1.3 TAL annotations -> caption-format train/val files
    with empty sentences + action_labels (reference:
    data/anet/anet1.3/process_anet1.3.py)."""
    db = json.load(open(anet13_path))["database"]
    cap_train = json.load(open(cap_train_path)) if cap_train_path else {}
    train, val = {}, {}
    for key, item in db.items():
        key = "v_" + key
        if feature_dir and not os.path.exists(
                os.path.join(feature_dir, key + ".npy")):
            print(f"key {key} has no features, skipping")
            continue
        stamps, labels = [], []
        for anno in item["annotations"]:
            ts = anno["segment"]
            if ts[0] > ts[1]:
                print(f"Invalid segment in {key}")
                continue
            stamps.append(ts)
            labels.append(anno["label"])
        if not stamps:
            continue
        entry = {"duration": item["duration"], "timestamps": stamps,
                 "sentences": [""] * len(stamps), "action_labels": labels}
        if item["subset"] == "training":
            train[key] = entry
        elif item["subset"] == "validation" and key not in cap_train:
            val[key] = entry
    os.makedirs(out_dir, exist_ok=True)
    json.dump(train, open(os.path.join(out_dir, "train.json"), "w"))
    json.dump(val, open(os.path.join(out_dir, "val.json"), "w"))
    print(f"Train number: {len(train)}  Val number: {len(val)}")


def _ym_to_sec(t):
    h, m, s = (int(x) for x in t.split(":"))
    return h * 3600 + m * 60 + s


def reformat_youmakeup(origin_path, out_path):
    """YouMakeup origin captioning json -> caption-format annotations; items
    without steps (the unlabeled test split) get placeholder events
    (reference: data/youmakeup/reformat.py)."""
    data = json.load(open(origin_path))
    out = {}
    for v in data:
        stamps, sents, areas = [], [], []
        for _, step in v.get("step", {}).items():
            stamps.append([_ym_to_sec(step["startime"]),
                           _ym_to_sec(step["endtime"])])
            sents.append(step["caption"])
            areas.append(step["area"])
        if not stamps:  # unlabeled test split placeholder
            stamps, sents, areas = [[0, 0.5]], ["a a"], [["face"]]
        out["v_" + v["video_id"]] = {
            "duration": v["video_duration"], "timestamps": stamps,
            "sentences": sents, "title": v["video_title"], "areas": areas,
            "actions": ["makeup"], "action_labels": [0]}
    json.dump(out, open(out_path, "w"))


def reformat_youmakeup_grounding(origin_path, out_path):
    """YouMakeup grounding-query list -> per-video grouped queries with
    placeholder timestamps (reference:
    data/youmakeup/reformat_for_grounding.py)."""
    data = json.load(open(origin_path))
    out = {}
    for q in data:
        vid = "v_" + q["video_id"]
        if vid not in out:
            out[vid] = {"sentences": [], "timestamps": [],
                        "duration": q["video_duration"],
                        "title": q["video_title"], "query_indicies": []}
        out[vid]["sentences"].append(q["caption"])
        out[vid]["query_indicies"].append(q["query_idx"])
        out[vid]["timestamps"].append([0, 0.5])
    json.dump(out, open(out_path, "w"))


def extract_vocab_youmakeup(origin_paths, out_path):
    """YouMakeup vocabulary from origin caption/grounding files — unordered
    full-vocab variant with UNK/<bos>/<eos>, ids from 1 (reference:
    data/youmakeup/annotations/extract_vocab.py)."""
    vocab = set()
    for p in origin_paths:
        for item in json.load(open(p)):
            sents = ([item["caption"]] if "caption" in item else
                     [s["caption"] for s in item.get("step", {}).values()])
            for sent in sents:
                for tok in (",", ":", "!", "_", ";", ".", "?", '"', "\\n",
                            "\\"):
                    sent = sent.replace(tok, " ")
                vocab.update(sent.lower().split())
    vocab |= {"UNK", "<bos>", "<eos>"}
    words = sorted(vocab)
    out = {"ix_to_word": {str(i): w for i, w in enumerate(words, start=1)},
           "word_to_ix": {w: i for i, w in enumerate(words, start=1)}}
    json.dump(out, open(out_path, "w"))
    print(f"vocab size: {len(words)}")


def generate_metadata_csv(video_folder, ext, out_csv):
    """Metadata CSV [filename, video-duration, fps, video-frames] for the
    TSP pipeline, via cv2 (reference:
    video_backbone/TSP/data/generate_metadata_csv.py)."""
    import csv
    import glob

    import cv2
    rows = []
    for path in sorted(glob.glob(os.path.join(video_folder, f"*.{ext}"))):
        cap = cv2.VideoCapture(path)
        fps = cap.get(cv2.CAP_PROP_FPS)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        if fps:
            rows.append([os.path.basename(path), n / fps, fps, n])
        else:
            print(f"WARNING: {path} has an issue (fps={fps})")
            rows.append([os.path.basename(path), None, None, None])
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "video-duration", "fps", "video-frames"])
        w.writerows(rows)
    print(f"saved metadata for {len(rows)} videos to {out_csv}")


def merge_pkl_to_h5(features_folder, output_h5):
    """Merge per-video .pkl feature files into one h5 (reference:
    video_backbone/TSP/extract_features/
    merge_pkl_files_into_one_h5_feature_file.py)."""
    import glob
    import pickle

    import h5py
    with h5py.File(output_h5, "w") as out:
        for p in sorted(glob.glob(os.path.join(features_folder, "*.pkl"))):
            name = os.path.basename(p)[: -len(".pkl")]
            with open(p, "rb") as f:
                out.create_dataset(name, data=pickle.load(f), chunks=True,
                                   compression="gzip", compression_opts=9)
    print(f"wrote {output_h5}")


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
    s = sub.add_parser("rebuild_tacos_multi")
    s.add_argument("--anno", required=True)
    s.add_argument("--out_dir", required=True)
    s.add_argument("--seed", type=int, default=0)
    s = sub.add_parser("rebuild_sub_para")
    s.add_argument("--anno", required=True)
    s.add_argument("--out_dir", required=True)
    s.add_argument("--min_events", type=int, default=2)
    s.add_argument("--max_events", type=int, default=8)
    s.add_argument("--random_split", action="store_true")
    s.add_argument("--seed", type=int, default=0)
    s = sub.add_parser("merge_grounding_results")
    s.add_argument("--first", required=True)
    s.add_argument("--second", required=True)
    s.add_argument("--gt", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("process_anet13")
    s.add_argument("--anet13", required=True)
    s.add_argument("--cap_train", default=None)
    s.add_argument("--out_dir", required=True)
    s.add_argument("--feature_dir", default=None)
    s = sub.add_parser("reformat_youmakeup")
    s.add_argument("--origin", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("reformat_youmakeup_grounding")
    s.add_argument("--origin", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("extract_vocab_youmakeup")
    s.add_argument("--origins", nargs="+", required=True)
    s.add_argument("--out", required=True)
    s = sub.add_parser("generate_metadata_csv")
    s.add_argument("--video_folder", required=True)
    s.add_argument("--ext", default="mp4")
    s.add_argument("--out", required=True)
    s = sub.add_parser("merge_pkl_to_h5")
    s.add_argument("--features_folder", required=True)
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
    elif a.cmd == "rebuild_tacos_multi":
        rebuild_tacos_multi(a.anno, a.out_dir, a.seed)
    elif a.cmd == "rebuild_sub_para":
        rebuild_sub_para(a.anno, a.out_dir, a.min_events, a.max_events,
                         a.random_split, a.seed)
    elif a.cmd == "merge_grounding_results":
        merge_grounding_results(a.first, a.second, a.gt, a.out)
    elif a.cmd == "process_anet13":
        process_anet13(a.anet13, a.cap_train, a.out_dir, a.feature_dir)
    elif a.cmd == "reformat_youmakeup":
        reformat_youmakeup(a.origin, a.out)
    elif a.cmd == "reformat_youmakeup_grounding":
        reformat_youmakeup_grounding(a.origin, a.out)
    elif a.cmd == "extract_vocab_youmakeup":
        extract_vocab_youmakeup(a.origins, a.out)
    elif a.cmd == "generate_metadata_csv":
        generate_metadata_csv(a.video_folder, a.ext, a.out)
    elif a.cmd == "merge_pkl_to_h5":
        merge_pkl_to_h5(a.features_folder, a.out)


if __name__ == "__main__":
    main()
