"""Post-processing: top-k detection outputs, batched greedy captioning, and
contrastive grounding matching.

Behavioral spec: reference pdvc/pdvc.py PostProcess.forward (:1002-1089) and
PostProcess.forward_grounding (:948-1000) + the grounding eval matcher config
(:938-946).

Split: everything array-shaped runs jitted on device (`eval_forward`), string
decoding and JSON assembly stay on host (gvl_tpu/eval/evaluate.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.train.criterion import cl_match_matrix
from gvl_tpu.train.lap import batched_lap
from gvl_tpu.utils import boxes as box_ops


@dataclasses.dataclass(frozen=True)
class GroundingSpec:
    """Eval grounding matcher weights (reference: opts.py:250-255,
    pdvc.py:938-946)."""
    cost_cl: float = 1.0
    cost_class: float = 0.0
    alpha: float = 0.25
    gamma: float = 2.0
    maximum_matching: bool = False


def detection_outputs(outputs: Dict, durations: jnp.ndarray) -> Dict:
    """Top-k over query x class scores + box scaling
    (reference: PostProcess.forward, pdvc.py:1009-1028)."""
    logits = outputs["pred_logits"][-1]             # (B, Nq, K)
    boxes = outputs["pred_boxes"][-1]               # (B, Nq, 2)
    B, Nq, K = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(B, Nq * K)
    scores, topk = jax.lax.top_k(prob, Nq)
    query_idx = topk // K
    labels = topk % K

    xy = box_ops.box_cl_to_xy(boxes)
    raw_boxes = xy * durations[:, None, None]
    clipped = jnp.clip(xy, 0.0, 1.0)
    sel = jnp.take_along_axis(clipped, query_idx[..., None], axis=1)
    sel = sel * durations[:, None, None]

    count_logits = outputs["pred_count"][-1]
    pred_count = jnp.clip(jnp.argmax(count_logits, -1), 1, None)

    return dict(scores=scores, labels=labels, boxes=sel,
                raw_boxes=jnp.take_along_axis(raw_boxes, query_idx[..., None],
                                              axis=1),
                query_idx=query_idx, pred_count=pred_count)


def grounding_outputs(outputs: Dict, durations: jnp.ndarray,
                      gt_mask: jnp.ndarray, spec: GroundingSpec,
                      layer: int = -1) -> Dict:
    """Per-GT-sentence event selection via the contrastive match matrix.

    Cost = cost_cl * (-cosine) + cost_class * focal(label=0); solve Hungarian
    (or per-column argmin when maximum_matching); unmatched columns fall back
    to argmin (reference: pdvc.py:968-990).
    Returns boxes (B,G,2 seconds), confs (B,G), cl_scores (B,G).
    """
    logits = outputs["pred_logits"][layer]
    boxes = outputs["pred_boxes"][layer]
    event_embed = outputs["event_embed"][layer]
    text_embed = outputs["_grounding_text"]        # (B, G, Dcl), final layer
    B, Nq, K = logits.shape
    G = text_embed.shape[1]

    cl_mat = cl_match_matrix(event_embed, text_embed)      # (B, Nq, G)
    p = jax.nn.sigmoid(logits[..., 0])                     # class 0
    a, g = spec.alpha, spec.gamma
    pos = a * ((1 - p) ** g) * (-jnp.log(p + 1e-8))
    neg = (1 - a) * (p ** g) * (-jnp.log(1 - p + 1e-8))
    cost_class = (pos - neg)[..., None]                    # (B, Nq, 1)
    C = spec.cost_cl * (-cl_mat) + spec.cost_class * cost_class

    col_argmin = jnp.argmin(C, axis=1)                     # (B, G)
    if spec.maximum_matching:
        event_j = col_argmin
    else:
        Cm = jnp.where(gt_mask[:, None, :], C, 0.0)
        matched = batched_lap(jax.lax.stop_gradient(Cm))   # (B, G)
        event_j = jnp.where(gt_mask, matched, col_argmin)

    xy = jnp.clip(box_ops.box_cl_to_xy(boxes), 0.0, 1.0)
    xy = xy * durations[:, None, None]
    sel_boxes = jnp.take_along_axis(xy, event_j[..., None], axis=1)
    confs = jnp.take_along_axis(p, event_j, axis=1)
    cl_scores = jnp.take_along_axis(
        jnp.transpose(C, (0, 2, 1)), event_j[..., None], axis=2)[..., 0]
    return dict(boxes=sel_boxes, confs=confs, cl_scores=cl_scores)
