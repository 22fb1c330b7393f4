"""TSP / TAC backbone pretraining loop.

Behavioral spec: reference video_backbone/TSP/train/train.py — clips labeled
with (action class, temporal-region class) train R(2+1)D with one FC head
per label kind (TAC = action head only), SGD/warmup schedule, DDP across
GPUs, per-epoch checkpoints.

TPU redesign: one jitted step on a dp mesh (no DDP machinery); clips arrive
as (B, clip_len, H, W, 3) arrays from any host-side sampler; BatchNorm
statistics are batch-local per step and stored in the variables collection.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gvl_tpu.backbone.r2plus1d import TSPModel


@dataclasses.dataclass
class TSPTrainConfig:
    backbone: str = "r2plus1d_34"
    num_classes_list: Tuple[int, ...] = (200, 2)   # (actions, inside/outside)
    use_gvf: bool = False
    lr: float = 0.0001
    momentum: float = 0.9
    weight_decay: float = 0.005
    warmup_steps: int = 1000
    total_steps: int = 100000
    label_smoothing: float = 0.0


def create_tsp_train_state(cfg: TSPTrainConfig, clip_shape, rng):
    model = TSPModel(cfg.num_classes_list, cfg.backbone, cfg.use_gvf)
    probe = jnp.zeros((1,) + tuple(clip_shape))
    gvf = jnp.zeros((1, 512)) if cfg.use_gvf else None
    variables = model.init(rng, probe, gvf=gvf, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1)),
         optax.cosine_decay_schedule(cfg.lr, max(
             cfg.total_steps - cfg.warmup_steps, 1))],
        [cfg.warmup_steps])
    opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                      optax.sgd(sched, momentum=cfg.momentum))
    return model, params, batch_stats, opt, opt.init(params)


def make_tsp_train_step(model: TSPModel, opt, cfg: TSPTrainConfig):
    """step(params, batch_stats, opt_state, clips, labels_list, gvf, rng)."""

    def loss_fn(params, batch_stats, clips, labels_list, gvf, rng):
        (feat, logits), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips, gvf=gvf,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        total = 0.0
        metrics = {}
        for i, lg in enumerate(logits):
            labels = labels_list[i]
            valid = labels >= 0          # -1 = missing label (TSP videos
            lab = jnp.maximum(labels, 0)  # without temporal annotation)
            ce = optax.softmax_cross_entropy_with_integer_labels(lg, lab)
            ce = (ce * valid).sum() / jnp.maximum(valid.sum(), 1)
            total = total + ce
            acc = ((jnp.argmax(lg, -1) == lab) & valid).sum() / \
                jnp.maximum(valid.sum(), 1)
            metrics[f"loss_head{i}"] = ce
            metrics[f"acc_head{i}"] = acc
        metrics["total_loss"] = total
        return total, (mutated["batch_stats"], metrics)

    def step(params, batch_stats, opt_state, clips, labels_list, gvf, rng):
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, clips, labels_list,
                                   gvf, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, metrics

    return step


def train_tsp(cfg: TSPTrainConfig, batches: Iterator[Dict], num_steps: int,
              clip_shape=(16, 112, 112, 3), log_every: int = 50,
              checkpoint_dir: Optional[str] = None):
    """Minimal driver: batches yield {'clips', 'labels' (list per head),
    'gvf' (optional)} numpy arrays."""
    rng = jax.random.PRNGKey(0)
    model, params, batch_stats, opt, opt_state = create_tsp_train_state(
        cfg, clip_shape, rng)
    step = jax.jit(make_tsp_train_step(model, opt, cfg))
    history = []
    for i, batch in enumerate(batches):
        if i >= num_steps:
            break
        labels = [jnp.asarray(l) for l in batch["labels"]]
        gvf = jnp.asarray(batch["gvf"]) if cfg.use_gvf else None
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state, jnp.asarray(batch["clips"]),
            labels, gvf, jax.random.fold_in(rng, i))
        if i % log_every == 0:
            history.append({k: float(v) for k, v in metrics.items()})
    if checkpoint_dir:
        from gvl_tpu.train.checkpoint import CheckpointManager
        CheckpointManager(checkpoint_dir).save(
            "tsp-backbone", {"params": jax.device_get(params),
                             "batch_stats": jax.device_get(batch_stats)}, 0)
    return params, batch_stats, history
