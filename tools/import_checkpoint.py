#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pth) into an orbax checkpoint
that eval.py / train.py (--pretrain_path) can load.

Usage:
  python tools/import_checkpoint.py --pth model-best.pth \
      --cfg_path cfgs/anet_tsp_msvg_dvc.yml --out save/imported_run

Writes <out>/model-best.ckpt plus opts.json so eval.py can run directly:
  python eval.py --eval_save_dir save --eval_folder imported_run ...

Backbone mode (released TSP/TAC checkpoints, reference
video_backbone/TSP/extract_features/extract_features.py:110-128):
  python tools/import_checkpoint.py --backbone r2plus1d_34 \
      --pth r2plus1d_34-tsp_on_activitynet-....pth --out save/tsp_backbone
writes <out>/backbone.msgpack for gvl_tpu.backbone.tsp.extract_features.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gvl_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--cfg_path")
    p.add_argument("--out", required=True)
    p.add_argument("--backbone", default=None,
                   choices=["r2plus1d_34", "r2plus1d_18", "r3d_18"],
                   help="import a TSP/torchvision video backbone instead "
                        "of a GVL model checkpoint")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # conversion is host-side

    if args.backbone:
        import jax.numpy as jnp
        from flax.serialization import to_bytes
        from gvl_tpu.backbone.import_torch import load_tsp_checkpoint
        from gvl_tpu.backbone.r2plus1d import TSPModel
        model = TSPModel(num_classes_list=(1,), backbone=args.backbone)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 112, 112, 3)), train=False)
        new, unused, unfilled = load_tsp_checkpoint(
            args.pth, variables, args.backbone)
        if unused:
            print(f"WARNING: {len(unused)} torch tensors unmapped:",
                  unused[:10], "...")
        bad = [u for u in unfilled if not u.startswith("params/fc_")]
        if bad:
            raise SystemExit(f"backbone variables left at init: {bad[:10]}")
        os.makedirs(args.out, exist_ok=True)
        out = os.path.join(args.out, "backbone.msgpack")
        # Serialize ONLY the 'backbone' subtree: the fc heads depend on
        # num_classes_list, which differs between this writer and whatever
        # model extract_features builds — and they are unused for feature
        # extraction anyway (reference extract_features.py:123 strips fc).
        sub = {col: {"backbone": tree["backbone"]}
               for col, tree in new.items()}
        with open(out, "wb") as f:
            f.write(to_bytes(sub))
        print(f"wrote {out} (backbone={args.backbone}; backbone subtree "
              f"only — fc heads are rebuilt at init by the reader)")
        return

    assert args.cfg_path, "--cfg_path required for GVL model import"
    import jax.numpy as jnp
    import numpy as np
    from gvl_tpu.config import load_config
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.checkpoint import (CheckpointManager,
                                          import_pytorch_checkpoint)
    from gvl_tpu.train.loop import init_params

    cfg = load_config(args.cfg_path)
    bundle = load_text_encoder(cfg)
    model = build_model(cfg, bundle.hidden_size if bundle else 768)

    B, T, D = 2, cfg.frame_embedding_num, cfg.feature_dim
    G = cfg.effective_max_gt_events
    probe = dict(
        video_feats=np.zeros((B, T, D), np.float32),
        video_mask=np.ones((B, T), bool),
        duration=np.full((B,), 60.0, np.float32),
        gt_boxes=np.full((B, G, 2), 0.5, np.float32),
        gt_labels=np.zeros((B, G), np.int32),
        gt_mask=np.ones((B, G), bool),
        captions=np.zeros((B, G, cfg.max_caption_len), np.int32),
        caption_mask=np.ones((B, G, cfg.max_caption_len), bool))
    params = init_params(model, cfg, bundle, probe)

    new_params, unused, unfilled = import_pytorch_checkpoint(
        args.pth, params, n_heads=cfg.nheads,
        share_caption_head=bool(cfg.share_caption_head))
    if unused:
        print(f"WARNING: {len(unused)} torch tensors unmapped:",
              unused[:10], "...")
    if unfilled:
        print(f"WARNING: {len(unfilled)} flax params left at init:",
              unfilled[:10], "...")

    os.makedirs(args.out, exist_ok=True)
    state = {"params": new_params,
             "text_params": bundle.params if bundle else None}
    # minimal state payload; eval.py restores via restore_raw
    CheckpointManager(args.out).save("model-best", state, epoch=0)
    cfg.dump_json(os.path.join(args.out, "opts.json"))
    print(f"wrote {args.out}/model-best.ckpt "
          f"({len(jax.tree_util.tree_leaves(new_params))} tensors)")


if __name__ == "__main__":
    main()
