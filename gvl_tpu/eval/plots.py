"""Diagnostic plots: per-query proposal distribution.

Behavioral spec: reference misc/plot_proposal_distribution.py — for each
query slot, the temporal coverage histogram of its predicted segments across
videos plus score/center/length box plots, written as a PNG next to the
result JSON and hooked into every eval (reference eval_utils.py:258-261,
wrapped in try/except)."""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def plot_score_vs_video_length(result_json: str, gt_json: str,
                               out_png: Optional[str] = None) -> str:
    """Qualitative diagnostic: per-video detection recall (tIoU 0.5) and mean
    proposal score against video duration (reference: misc/plot/* result-vs-
    video-length plots)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from gvl_tpu.eval.metrics.dvc_eval import _iou

    out_png = out_png or (result_json[:-5] if result_json.endswith(".json")
                          else result_json) + "_vs_length.png"
    with open(result_json) as f:
        preds = json.load(f)["results"]
    with open(gt_json) as f:
        gt = json.load(f)

    durations, recalls, scores = [], [], []
    for vid, g in gt.items():
        if vid not in preds or not preds[vid]:
            continue
        p = preds[vid]
        hit = sum(any(_iou(item["timestamp"], ts) >= 0.5 for item in p)
                  for ts in g["timestamps"])
        durations.append(g["duration"])
        recalls.append(hit / max(len(g["timestamps"]), 1))
        scores.append(float(np.mean([item["proposal_score"] for item in p])))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4), dpi=100)
    ax1.scatter(durations, recalls, s=8)
    ax1.set_xlabel("video duration (s)")
    ax1.set_ylabel("recall@0.5")
    ax2.scatter(durations, scores, s=8, color="tab:orange")
    ax2.set_xlabel("video duration (s)")
    ax2.set_ylabel("mean proposal score")
    fig.tight_layout()
    fig.savefig(out_png)
    plt.close(fig)
    return out_png


def plot_proposal_distribution(result_json: str,
                               out_png: Optional[str] = None) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out_png = out_png or (result_json[:-5] if result_json.endswith(".json")
                          else result_json) + ".png"
    with open(result_json) as f:
        d = json.load(f)["results"]
    vids = list(d.keys())
    if not vids:
        return out_png
    n_query = max((p["query_id"] for p in d[vids[0]]), default=0) + 1

    L = 100
    coverage = np.zeros((n_query, L))
    stats = [[] for _ in range(n_query)]   # (score, center, length)
    for vid, items in d.items():
        for p in sorted(items, key=lambda x: x["query_id"]):
            q = p["query_id"]
            if q >= n_query:
                continue
            dur = max(p["vid_duration"], 1e-6)
            s = min(max(p["timestamp"][0] / dur, 0), 1)
            e = min(max(p["timestamp"][1] / dur, 0), 1)
            coverage[q, int(s * (L - 1)): int(e * (L - 1)) + 1] += 1
            stats[q].append((p["proposal_score"] * L, 0.5 * (s + e) * L,
                             (e - s) * L))
    coverage /= max(len(vids), 1)

    n_row = int(np.ceil(np.sqrt(n_query)))
    n_col = int(2 * np.ceil(n_query / n_row))
    fig = plt.figure(figsize=(4 * n_col, 3 * n_row), dpi=100)
    for q in range(n_query):
        ax = fig.add_subplot(n_row, n_col, 2 * q + 1)
        ax.plot(np.arange(L), coverage[q])
        ax.set_xlim([0, L])
        ax.set_title(f"query {q} coverage", fontsize=8)
        ax2 = fig.add_subplot(n_row, n_col, 2 * q + 2)
        if stats[q]:
            arr = np.array(stats[q])
            ax2.boxplot([arr[:, 0], arr[:, 1], arr[:, 2]],
                        positions=[1, 2, 3], vert=False, showmeans=True,
                        flierprops=dict(marker=".", markersize=1))
        ax2.set_xlim([0, L])
        ax2.set_title("score/center/len", fontsize=8)
    fig.savefig(out_png, bbox_inches="tight", pad_inches=0.3)
    plt.close(fig)
    return out_png
