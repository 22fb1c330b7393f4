"""1-D temporal box utilities in jnp.

Boxes are 1-D segments. Two layouts:
- (center, length), both normalized to [0, 1] — the model's native format;
- (start, end) — used by IoU/GIoU math.

Behavioral spec: reference misc/detr_utils/box_ops.py (box_cl_to_xy,
box_xy_to_cl, box_iou, generalized_box_iou), rewritten for jnp with
batched/pairwise broadcasting instead of per-call flattening.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cl_to_xy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) center/length -> start/end."""
    c, l = x[..., 0], x[..., 1]
    return jnp.stack([c - 0.5 * l, c + 0.5 * l], axis=-1)


def box_xy_to_cl(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) start/end -> center/length."""
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([(x0 + x1) / 2, (x1 - x0)], axis=-1)


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """IoU between all pairs.

    boxes1: (..., N, 2) and boxes2: (..., M, 2), start/end layout.
    Returns (iou, union) of shape (..., N, M). eps 1e-5 matches the
    reference's box_iou denominator guard.
    """
    area1 = boxes1[..., 1] - boxes1[..., 0]           # (..., N)
    area2 = boxes2[..., 1] - boxes2[..., 0]           # (..., M)
    lt = jnp.maximum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    rb = jnp.minimum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    inter = jnp.clip(rb - lt, 0.0)
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / (union + 1e-5)
    return iou, union


def pairwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Generalized IoU between all pairs, start/end layout, (..., N, M).

    No degenerate-box assert (jit-incompatible); callers are responsible for
    start <= end, which holds after box_cl_to_xy of clamped (c, l).
    """
    iou, union = pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, 0], boxes2[..., None, :, 0])
    rb = jnp.maximum(boxes1[..., :, None, 1], boxes2[..., None, :, 1])
    area = jnp.clip(rb - lt, 0.0)
    return iou - (area - union) / (area + 1e-5)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between aligned boxes, start/end layout, shape (...,)."""
    lt = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    rb = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    inter = jnp.clip(rb - lt, 0.0)
    area1 = boxes1[..., 1] - boxes1[..., 0]
    area2 = boxes2[..., 1] - boxes2[..., 0]
    union = area1 + area2 - inter
    return inter / (union + 1e-5)


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """GIoU between aligned boxes, start/end layout, shape (...,)."""
    iou = elementwise_iou(boxes1, boxes2)
    inter_lt = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    inter_rb = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    inter = jnp.clip(inter_rb - inter_lt, 0.0)
    union = (boxes1[..., 1] - boxes1[..., 0]) + (boxes2[..., 1] - boxes2[..., 0]) - inter
    lt = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    rb = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    area = jnp.clip(rb - lt, 0.0)
    return iou - (area - union) / (area + 1e-5)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically-clamped logit (reference: misc/detr_utils/misc.py:582-586)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)
