"""TSPTrainer epoch loop: parameter groups, WarmupMultiStepLR schedule,
per-epoch validation/checkpoints, resume, valid_only (reference
video_backbone/TSP/train/train.py:123-288 + opts.py defaults)."""

import numpy as np
import pytest

from gvl_tpu.backbone.train_tsp import (TSPTrainConfig, TSPTrainer,
                                        _group_labels,
                                        create_tsp_train_state,
                                        warmup_multistep_schedule)

SHAPE = (4, 16, 16, 3)


def _cfg(**kw):
    kw.setdefault("backbone", "r3d_18")
    kw.setdefault("num_classes_list", (3, 2))
    kw.setdefault("backbone_lr", 0.01)
    kw.setdefault("fc_lr", 0.2)
    kw.setdefault("epochs", 2)
    kw.setdefault("lr_warmup_epochs", 1)
    kw.setdefault("lr_milestones", (2,))
    return TSPTrainConfig(**kw)


def _batches(n, seed=0):
    r = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        clips = r.randn(2, *SHAPE).astype(np.float32) * 0.1
        labels = r.randint(0, 3, (2,))
        clips[..., 0] += (labels[:, None, None, None] - 1) * 1.0
        out.append({"clips": clips,
                    "labels": [labels, r.randint(0, 2, (2,))]})
    return out


def test_warmup_multistep_schedule_matches_torch_semantics():
    # torchvision WarmupMultiStepLR: linear warmup from factor*lr over
    # warmup_iters, then gamma**(milestones passed)
    s = warmup_multistep_schedule(1.0, warmup_iters=10,
                                  milestone_iters=[20, 40], gamma=0.1,
                                  warmup_factor=1e-5)
    assert float(s(0)) == pytest.approx(1e-5)
    assert float(s(5)) == pytest.approx(0.5, rel=1e-4)
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(19)) == pytest.approx(1.0)
    assert float(s(20)) == pytest.approx(0.1)
    assert float(s(40)) == pytest.approx(0.01)


def test_param_groups_cover_tree():
    import jax
    cfg = _cfg()
    _, params, _, _, _ = create_tsp_train_state(cfg, SHAPE,
                                                jax.random.PRNGKey(0),
                                                steps_per_epoch=2)
    labels = _group_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    groups = {l for _, l in flat}
    assert groups == {"stem", "backbone", "fc"}
    # fc heads labeled fc; initial conv/bn labeled stem; blocks backbone
    for path, lab in flat:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if keys[0].startswith("fc_"):
            assert lab == "fc", keys
        elif keys[0] == "backbone" and keys[1].startswith("BasicBlock"):
            assert lab == "backbone", keys
        elif keys[0] == "backbone":
            assert lab == "stem", keys


def test_stem_frozen_backbone_and_fc_move(tmp_path):
    import jax
    cfg = _cfg(epochs=1)
    tr = TSPTrainer(cfg, lambda ep: iter(_batches(2, seed=ep)),
                    lambda: iter(_batches(1, seed=9)), steps_per_epoch=2,
                    clip_shape=SHAPE)
    before = jax.device_get(tr.params)
    tr.train_one_epoch(0)
    after = jax.device_get(tr.params)
    labels = _group_labels(before)

    def max_delta(group):
        deltas = [float(np.abs(a - b).max()) for (pa, a), (pb, b), (pl, l)
                  in zip(*(jax.tree_util.tree_leaves_with_path(t)
                           for t in (before, after, labels))) if l == group]
        return max(deltas)

    assert max_delta("stem") == 0.0          # frozen at lr 0
    assert max_delta("backbone") > 0.0
    assert max_delta("fc") > 0.0


def test_fit_validates_checkpoints_and_resumes(tmp_path):
    cfg = _cfg()
    out = str(tmp_path / "run")
    mk_tr = lambda ep: iter(_batches(2, seed=ep))
    mk_va = lambda: iter(_batches(2, seed=99))
    tr = TSPTrainer(cfg, mk_tr, mk_va, steps_per_epoch=2, clip_shape=SHAPE,
                    output_dir=out)
    hist = tr.fit()
    assert len(hist) == 2
    for h in hist:
        assert np.isfinite(h["avg_loss"])
        assert {"loss_head0", "acc_head0", "loss_head1",
                "acc_head1"} <= set(h)
    import os
    assert os.path.isdir(os.path.join(out, "epoch_0.ckpt"))
    assert os.path.isdir(os.path.join(out, "epoch_1.ckpt"))
    assert os.path.isdir(os.path.join(out, "checkpoint.ckpt"))
    # metrics.jsonl has one line per validated epoch
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2

    # resume: start_epoch advances past the saved epoch (train.py:243-245)
    tr2 = TSPTrainer(cfg, mk_tr, mk_va, steps_per_epoch=2,
                     clip_shape=SHAPE, output_dir=out)
    assert tr2.resume()
    assert tr2.start_epoch == 2
    assert tr2.fit() == []                   # nothing left to train

    # valid_only evaluates without training (train.py:248-252)
    v = tr2.fit(valid_only=True)
    assert len(v) == 1 and np.isfinite(v[0]["avg_loss"])


def test_train_only_one_epoch(tmp_path):
    cfg = _cfg()
    tr = TSPTrainer(cfg, lambda ep: iter(_batches(2, seed=ep)),
                    lambda: iter(_batches(1, seed=9)), steps_per_epoch=2,
                    clip_shape=SHAPE, output_dir=str(tmp_path / "r"))
    hist = tr.fit(train_only_one_epoch=True)
    assert len(hist) == 1 and hist[0]["epoch"] == 0
    assert "train_total_loss" in hist[0]
    assert "avg_loss" not in hist[0]         # validation skipped
