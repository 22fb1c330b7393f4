"""TSP / TAC backbone pretraining loop.

Behavioral spec: reference video_backbone/TSP/train/train.py + train/opts.py —
clips labeled with (action class, temporal-region class) train R(2+1)D with
one FC head per label kind (TAC = action head only), under:

- three SGD parameter groups (train.py:208-221): the stem FROZEN (lr 0),
  the residual stages at ``backbone_lr`` (default 1e-4), the FC heads at
  ``fc_lr`` (default 2e-3);
- WarmupMultiStepLR per ITERATION (train.py:227-233): linear warmup from
  ``warmup_factor * lr`` over ``lr_warmup_epochs`` worth of steps, then
  ``gamma``-step decay at the epoch milestones;
- per-head losses mixed by ``loss_alphas`` (train.py:60-66) with
  ``ignore_index=-1`` for missing labels (train.py:206);
- an epoch loop with per-epoch validation, per-epoch checkpoints
  (``epoch_<N>`` plus a rolling ``checkpoint``), resume (model/optimizer/
  epoch, train.py:239-245), ``valid_only`` and ``train_only_one_epoch``
  modes, and validation metrics written per epoch (train.py:84-120).

TPU redesign: one jitted step on the chip (no DDP machinery — dp scaling
is a jax.sharding mesh around the same step); clips arrive as
(B, clip_len, H, W, 3) arrays from any host-side sampler (see
untrimmed_dataset.tsp_batches); BatchNorm statistics live in the flax
``batch_stats`` collection (batch-local per step, running stats used at
eval exactly like torch .eval()).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

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
    # --- legacy single-group schedule (kept for driver back-compat; used
    # only when backbone_lr is None) ---
    lr: float = 0.0001
    warmup_steps: int = 1000
    total_steps: int = 100000
    # --- reference parameter-group optimizer (train/opts.py defaults) ---
    backbone_lr: Optional[float] = None            # 1e-4 in the reference
    fc_lr: float = 0.002
    lr_warmup_epochs: int = 2
    lr_milestones: Tuple[int, ...] = (4, 6)        # epochs
    lr_gamma: float = 0.01
    warmup_factor: float = 1e-5
    epochs: int = 8
    loss_alphas: Tuple[float, ...] = (1.0, 1.0)
    momentum: float = 0.9
    weight_decay: float = 0.005
    label_smoothing: float = 0.0


def warmup_multistep_schedule(base_lr: float, warmup_iters: int,
                              milestone_iters: Sequence[int], gamma: float,
                              warmup_factor: float = 1e-5):
    """The reference's WarmupMultiStepLR (torchvision scheduler used at
    train.py:230-233) as an optax schedule: linear warmup from
    ``warmup_factor*base_lr`` to ``base_lr`` over ``warmup_iters`` steps,
    times ``gamma**(milestones passed)``."""
    milestones = jnp.asarray(sorted(milestone_iters), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            warm = warmup_factor * (1.0 - alpha) + alpha
        else:
            warm = 1.0
        decay = gamma ** jnp.sum(step >= milestones.astype(jnp.float32))
        return base_lr * warm * decay

    return schedule


def _param_group(path: Tuple[str, ...]) -> str:
    """Reference train.py:208-221 parameter groups on the flax tree:
    stem (initial convs, lr 0) / backbone (residual stages) / fc heads."""
    if path and path[0] == "backbone":
        return "backbone" if len(path) > 1 and \
            path[1].startswith("BasicBlock") else "stem"
    return "fc"


def _group_labels(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(
            tuple(getattr(k, "key", getattr(k, "name", str(k)))
                  for k in path)), params)


def create_tsp_train_state(cfg: TSPTrainConfig, clip_shape, rng,
                           steps_per_epoch: Optional[int] = None):
    model = TSPModel(cfg.num_classes_list, cfg.backbone, cfg.use_gvf)
    probe = jnp.zeros((1,) + tuple(clip_shape))
    gvf = jnp.zeros((1, 512)) if cfg.use_gvf else None
    variables = model.init(rng, probe, gvf=gvf, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.backbone_lr is None:
        # legacy single-group warmup+cosine driver schedule
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1)),
             optax.cosine_decay_schedule(cfg.lr, max(
                 cfg.total_steps - cfg.warmup_steps, 1))],
            [cfg.warmup_steps])
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                          optax.sgd(sched, momentum=cfg.momentum))
    else:
        spe = steps_per_epoch or 1
        warmup_iters = cfg.lr_warmup_epochs * spe
        milestone_iters = [m * spe for m in cfg.lr_milestones]

        def group_opt(base_lr):
            if base_lr == 0.0:
                return optax.set_to_zero()        # frozen stem
            sched = warmup_multistep_schedule(
                base_lr, warmup_iters, milestone_iters, cfg.lr_gamma,
                cfg.warmup_factor)
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(sched, momentum=cfg.momentum))

        opt = optax.multi_transform(
            {"stem": group_opt(0.0),
             "backbone": group_opt(cfg.backbone_lr),
             "fc": group_opt(cfg.fc_lr)},
            _group_labels(params))
    return model, params, batch_stats, opt, opt.init(params)


def make_tsp_train_step(model: TSPModel, opt, cfg: TSPTrainConfig):
    """step(params, batch_stats, opt_state, clips, labels_list, gvf, rng)."""
    alphas = tuple(cfg.loss_alphas) + (1.0,) * (
        len(cfg.num_classes_list) - len(cfg.loss_alphas))

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
            total = total + alphas[i] * ce
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


def make_tsp_eval_step(model: TSPModel, cfg: TSPTrainConfig):
    """Validation step: running BN stats, no dropout (torch .eval()
    semantics, reference train.py:84-120). Returns per-head loss sums,
    correct counts and valid counts so the epoch aggregation is weighted
    exactly like the reference's MetricLogger."""
    alphas = tuple(cfg.loss_alphas) + (1.0,) * (
        len(cfg.num_classes_list) - len(cfg.loss_alphas))

    def step(params, batch_stats, clips, labels_list, gvf):
        feat, logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips, gvf=gvf,
            train=False)
        out = {}
        total = 0.0
        for i, lg in enumerate(logits):
            labels = labels_list[i]
            valid = labels >= 0
            lab = jnp.maximum(labels, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(lg, lab)
            out[f"loss_sum{i}"] = (ce * valid).sum()
            out[f"correct{i}"] = ((jnp.argmax(lg, -1) == lab) & valid).sum()
            out[f"valid{i}"] = valid.sum()
            total = total + alphas[i] * (ce * valid).sum() / \
                jnp.maximum(valid.sum(), 1)
        out["total_loss"] = total
        return out

    return step


def evaluate_tsp(eval_step, params, batch_stats, batches: Iterable[Dict],
                 use_gvf: bool) -> Dict[str, float]:
    """Run validation over `batches`; returns per-head avg loss/accuracy
    plus the alpha-mixed avg total loss (reference write_metrics_results_
    to_file fields: avg_loss + per-head loss/accuracy)."""
    sums: Dict[str, float] = {}
    n_batches = 0
    for batch in batches:
        labels = [jnp.asarray(l) for l in batch["labels"]]
        gvf = jnp.asarray(batch["gvf"]) if use_gvf else None
        out = eval_step(params, batch_stats, jnp.asarray(batch["clips"]),
                        labels, gvf)
        for k, v in out.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n_batches += 1
    results: Dict[str, float] = {}
    if not n_batches:
        return results
    i = 0
    while f"valid{i}" in sums:
        denom = max(sums[f"valid{i}"], 1.0)
        results[f"loss_head{i}"] = sums[f"loss_sum{i}"] / denom
        results[f"acc_head{i}"] = sums[f"correct{i}"] / denom
        i += 1
    results["avg_loss"] = sums.get("total_loss", 0.0) / n_batches
    return results


def train_tsp(cfg: TSPTrainConfig, batches: Iterator[Dict], num_steps: int,
              clip_shape=(16, 112, 112, 3), log_every: int = 50,
              checkpoint_dir: Optional[str] = None):
    """Step-driven driver (kept for tools/tests): batches yield {'clips',
    'labels' (list per head), 'gvf' (optional)} numpy arrays."""
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


class TSPTrainer:
    """Epoch-driven trainer matching the reference main() control flow
    (train.py:123-288): per-epoch train + validation, per-epoch checkpoints
    (``epoch_<N>`` + rolling ``checkpoint``), resume, ``valid_only``,
    ``train_only_one_epoch``, metrics appended to ``metrics.jsonl``.

    make_train_batches(epoch) / make_valid_batches() return fresh batch
    iterators (the sampler owns shuffling; pass the epoch through to
    reseed like DistributedSampler.set_epoch)."""

    def __init__(self, cfg: TSPTrainConfig, make_train_batches,
                 make_valid_batches, steps_per_epoch: int,
                 clip_shape=(16, 112, 112, 3), output_dir: str = "",
                 seed: int = 0):
        if cfg.backbone_lr is None:
            cfg = dataclasses.replace(cfg, backbone_lr=0.0001)
        self.cfg = cfg
        self.make_train_batches = make_train_batches
        self.make_valid_batches = make_valid_batches
        self.steps_per_epoch = steps_per_epoch
        self.output_dir = output_dir
        self.rng = jax.random.PRNGKey(seed)
        (self.model, self.params, self.batch_stats, self.opt,
         self.opt_state) = create_tsp_train_state(
            cfg, clip_shape, self.rng, steps_per_epoch=steps_per_epoch)
        self._step = jax.jit(make_tsp_train_step(self.model, self.opt, cfg))
        self._eval_step = jax.jit(make_tsp_eval_step(self.model, cfg))
        self.start_epoch = 0
        self._ckpt = None
        if output_dir:
            from gvl_tpu.train.checkpoint import CheckpointManager
            os.makedirs(output_dir, exist_ok=True)
            self._ckpt = CheckpointManager(output_dir)

    # -- checkpointing (reference train.py:262-272: epoch_N + rolling) -----
    def _state_tree(self):
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state}

    def save_checkpoint(self, epoch: int):
        if self._ckpt is None:
            return
        tree = jax.device_get(self._state_tree())
        self._ckpt.save(f"epoch_{epoch}", tree, epoch)
        self._ckpt.save("checkpoint", tree, epoch)

    def resume(self, name: str = "checkpoint") -> bool:
        """Restore model/optimizer/epoch; start_epoch = saved + 1
        (reference train.py:239-245)."""
        if self._ckpt is None:
            return False
        payload = self._ckpt.restore(name, self._state_tree())
        if payload is None:
            return False
        st = payload["state"]
        self.params, self.batch_stats = st["params"], st["batch_stats"]
        self.opt_state = st["opt_state"]
        self.start_epoch = int(payload["epoch"]) + 1
        return True

    # -- epoch loop ---------------------------------------------------------
    def train_one_epoch(self, epoch: int) -> Dict[str, float]:
        last: Dict[str, float] = {}
        it = self.make_train_batches(epoch)
        for i, batch in enumerate(it):
            if i >= self.steps_per_epoch:
                break
            labels = [jnp.asarray(l) for l in batch["labels"]]
            gvf = jnp.asarray(batch["gvf"]) if self.cfg.use_gvf else None
            (self.params, self.batch_stats, self.opt_state,
             metrics) = self._step(
                self.params, self.batch_stats, self.opt_state,
                jnp.asarray(batch["clips"]), labels, gvf,
                jax.random.fold_in(self.rng, epoch * 1000003 + i))
            last = {k: float(v) for k, v in metrics.items()}
        return last

    def validate(self, epoch: int) -> Dict[str, float]:
        results = evaluate_tsp(self._eval_step, self.params,
                               self.batch_stats, self.make_valid_batches(),
                               self.cfg.use_gvf)
        results["epoch"] = epoch
        if self.output_dir:
            with open(os.path.join(self.output_dir, "metrics.jsonl"),
                      "a") as f:
                f.write(json.dumps(results) + "\n")
        return results

    def fit(self, valid_only: bool = False,
            train_only_one_epoch: bool = False) -> List[Dict[str, float]]:
        if valid_only:
            ep = max(self.start_epoch - 1, 0)
            return [self.validate(ep)]
        history = []
        for epoch in range(self.start_epoch, self.cfg.epochs):
            train_metrics = self.train_one_epoch(epoch)
            self.save_checkpoint(epoch)
            if train_only_one_epoch:
                history.append({"epoch": epoch, **{f"train_{k}": v
                                                   for k, v in
                                                   train_metrics.items()}})
                break
            val = self.validate(epoch)
            val.update({f"train_{k}": v for k, v in train_metrics.items()})
            history.append(val)
        return history
