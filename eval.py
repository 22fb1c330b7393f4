#!/usr/bin/env python
"""Standalone evaluation entry point.

Behavioral spec: reference eval.py — restore the training-time opt snapshot
from the run dir's info.json (all non-'eval_*' keys; reference eval.py:54-70),
rebuild dataset/model, load a checkpoint, run evaluation + metrics; supports
--eval_mode test with a fabricated caption file from a metadata CSV
(reference eval.py:30-37).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def create_fake_test_caption_file(metadata_csv_path: str) -> str:
    """Fabricate GT-shaped annotations for unlabeled test videos
    (reference: eval.py:30-37)."""
    import pandas as pd
    out = {}
    df = pd.read_csv(metadata_csv_path)
    for i in range(len(df)):
        video_name = df["video-name"][i]
        dur = float(df["video-duration"][i])
        out[video_name] = {"duration": dur, "timestamps": [[0, 0.5 * dur]],
                           "sentences": ["placeholder"]}
    path = ".tmp/fake_test_anno.json"
    os.makedirs(".tmp", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f)
    return path


def eval_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--eval_save_dir", type=str, default="save")
    p.add_argument("--eval_folder", type=str, required=True)
    p.add_argument("--eval_model_path", type=str, default="")
    p.add_argument("--eval_checkpoint", type=str, default="model-best")
    p.add_argument("--eval_batch_size", type=int, default=16)
    p.add_argument("--eval_caption_file", type=str, default="")
    p.add_argument("--eval_mode", type=str, default="eval",
                   choices=["eval", "test"])
    p.add_argument("--test_video_feature_folder", type=str, nargs="+",
                   default=None)
    p.add_argument("--test_video_meta_data_csv_path", type=str, default=None)
    p.add_argument("--eval_gt_file_for_caption", type=str, nargs="+",
                   default=None)
    p.add_argument("--eval_gt_file_for_grounding", type=str, default=None)
    p.add_argument("--eval_transformer_input_type", type=str, default=None)
    p.add_argument("--eval_disable_captioning", action="store_true")
    p.add_argument("--eval_enable_maximum_matching_for_grounding",
                   action="store_true", default=None)
    p.add_argument("--gpu_id", type=str, nargs="+", default=[])
    # full reference eval flag surface (reference eval.py:148-193)
    p.add_argument("--eval_tool_version", type=str, default=None,
                   choices=["2018", "2021", "2018_cider"])
    p.add_argument("--eval_proposal_type", type=str, default=None)
    p.add_argument("--eval_device", type=str, default=None,
                   choices=["cpu", "tpu"])
    p.add_argument("--eval_nthreads", type=int, default=None)
    p.add_argument("--show_all_results", default=None)
    p.add_argument("--eval_enable_matching_score", action="store_true",
                   default=None)
    p.add_argument("--eval_matching_score_weight", type=float, default=None)
    p.add_argument("--eval_ec_alpha", type=float, default=-1.0,
                   help="-1 keeps the trained ec_alpha")
    p.add_argument("--eval_calculate_query_counts", action="store_true",
                   default=None)
    p.add_argument("--eval_enable_grounding", type=int, default=None)
    p.add_argument("--eval_set_cost_class", type=float, default=None)
    p.add_argument("--eval_grounding_cost_alpha", type=float, default=None)
    p.add_argument("--eval_grounding_cost_gamma", type=float, default=None)
    p.add_argument("--eval_set_cost_cl", type=float, default=None)
    p.add_argument("--eval_disable_contrastive", action="store_true",
                   default=None)
    p.add_argument("--eval_for_multi_anno", action="store_true", default=None)
    p.add_argument("--eval_enable_zeroshot_tal", action="store_true",
                   default=None)
    p.add_argument("--eval_prompt", type=str, default=None)
    p.add_argument("--eval_use_amp", action="store_true", default=None,
                   help="maps to eval_decode_bf16 on TPU")
    p.add_argument("--eval_debug", action="store_true", default=None)
    p.add_argument("--eval_num_queries", type=int, default=0)
    p.add_argument("--eval_not_strict_load", action="store_true",
                   default=None)
    p.add_argument("--eval_data_parallel", action="store_true", default=None,
                   help="shard eval batches over all local devices")
    return p


def main():
    args = eval_parser().parse_args()
    from gvl_tpu.utils.platform import (apply_env_platform,
                                        enable_compilation_cache)
    apply_env_platform("cpu" if args.eval_device == "cpu" else None)
    enable_compilation_cache()
    from gvl_tpu.config import Config
    from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
    from gvl_tpu.eval.evaluate import EvalRunner
    from gvl_tpu.eval.metrics import eval_metrics, eval_metrics_grounding
    from gvl_tpu.models import build_model
    from gvl_tpu.models.text_encoder import load_text_encoder
    from gvl_tpu.train.checkpoint import CheckpointManager

    folder = os.path.join(args.eval_save_dir, args.eval_folder)
    info_path = os.path.join(folder, "info.json")
    opts_path = os.path.join(folder, "opts.json")
    cfg = Config()
    src = info_path if os.path.exists(info_path) else opts_path
    with open(src) as f:
        saved = json.load(f)
    saved_opt = saved.get("opt", saved)
    # restore all non-eval_* training-time options (reference eval.py:58-60)
    for k, v in saved_opt.items():
        if not k.startswith("eval_"):
            cfg.set(k, v)
    for k, v in vars(args).items():
        if v is not None and v != "":
            cfg.set(k, v)
    cfg.batch_size = cfg.eval_batch_size
    # flag semantics matching the reference (eval.py:61-85); eval_device is
    # handled at the top of main (backend-init ordering)
    if args.eval_nthreads is not None:
        cfg.num_workers = args.eval_nthreads
    if args.eval_ec_alpha != -1.0:
        cfg.ec_alpha = args.eval_ec_alpha
    if args.eval_disable_contrastive:
        cfg.enable_contrastive = False
    if args.eval_use_amp:
        cfg.eval_decode_bf16 = True
    if args.eval_debug:
        cfg.debug = True
    if args.eval_num_queries > 0:
        cfg.num_queries = args.eval_num_queries
    if args.eval_transformer_input_type is not None:
        # the eval flag decides the decoder input mode (reference
        # eval.py:72: opt.transformer_input_type = eval_transformer_input_type)
        cfg.transformer_input_type = args.eval_transformer_input_type
    if args.eval_for_multi_anno:
        # MSVG rebuilt annotations key videos '<group:03d><vid>': strip the
        # 3-char prefix for feature lookup (reference video_dataset key
        # handling for grouped annos)
        cfg.train_with_split_anno = True

    if args.eval_mode == "test":
        assert args.test_video_meta_data_csv_path
        cfg.val_caption_file = create_fake_test_caption_file(
            args.test_video_meta_data_csv_path)
        if args.test_video_feature_folder:
            cfg.visual_feature_folder = args.test_video_feature_folder
    elif args.eval_caption_file:
        cfg.val_caption_file = args.eval_caption_file

    ds = DenseVideoDataset(cfg.val_caption_file, cfg.visual_feature_folder,
                           cfg.dict_file, False, cfg)
    batcher = Batcher(ds, cfg, cfg.eval_batch_size, shuffle=False)
    bundle = load_text_encoder(cfg)
    model = build_model(cfg, bundle.hidden_size if bundle else 768)

    ckpt = CheckpointManager(folder)
    payload = ckpt.restore_raw(args.eval_checkpoint)
    assert payload is not None, f"no checkpoint {args.eval_checkpoint}"
    loaded = payload["state"]
    eval_params = loaded["params"]
    if args.eval_num_queries > 0:
        # evaluate with a prefix of the trained query slots
        # (reference: eval_num_queries, eval.py:192)
        import jax
        def slice_queries(path, x):
            if path[-1].key == "query_embed" and \
                    x.shape[0] >= args.eval_num_queries:
                return x[: args.eval_num_queries]
            return x
        eval_params = jax.tree_util.tree_map_with_path(slice_queries,
                                                       eval_params)
    text_params = loaded.get("text_params") or \
        (bundle.params if bundle else None)
    print(f"loaded {args.eval_checkpoint} (epoch {payload['epoch']})")

    mesh = None
    if cfg.get("eval_data_parallel", False):
        import jax

        from gvl_tpu.parallel import make_mesh_for_batch
        if len(jax.devices()) > 1:
            mesh = make_mesh_for_batch(cfg.eval_batch_size, "dp")
            print(f"data-parallel eval on mesh {mesh}")
    runner = EvalRunner(cfg, model, bundle, ds.translator, mesh=mesh)
    runner.set_params(eval_params, text_params)
    if args.eval_enable_zeroshot_tal:
        # per-class contrastive scores on every prediction
        # (reference: eval_enable_zeroshot_tal + eval_prompt)
        from gvl_tpu.data.vocabulary import ClassMap
        cmap = ClassMap(cfg.action_classes_path)
        names = [cmap.idx2name[i] for i in range(len(cmap.idx2name))]
        prompt = args.eval_prompt or "a video of"
        runner.enable_zeroshot_tal([f"{prompt} {n}" for n in names])
    dvc_path = os.path.join(folder, f"eval_{args.eval_checkpoint}.json")
    out_path, *_ = runner.run(batcher, dvc_path, debug=bool(cfg.debug))

    scores = {}
    if args.eval_mode == "eval":
        if cfg.caption_loss_coef > 0 and not cfg.eval_disable_captioning:
            # standalone eval scores verbosely by default (full scorer set),
            # like the reference's show_all_results=True (eval.py:125-131)
            verbose = True if args.show_all_results is None \
                else str(args.show_all_results).lower() not in ("0", "false")
            scores.update(eval_metrics(
                out_path, gt_filenames=cfg.gt_file_for_eval,
                para_gt_filenames=cfg.gt_file_for_para_eval,
                dvc_eval_version=cfg.eval_tool_version, verbose=verbose))
        if cfg.enable_contrastive and cfg.eval_enable_grounding:
            if os.path.exists(cfg.eval_gt_file_for_grounding):
                scores.update(eval_metrics_grounding(
                    out_path + ".grounding.json",
                    cfg.eval_gt_file_for_grounding))
            else:
                print(f"grounding GT not found, skipping: "
                      f"{cfg.eval_gt_file_for_grounding}")
    print(json.dumps({k: (round(float(v), 4) if isinstance(v, (int, float))
                          else v) for k, v in scores.items()}, indent=1))
    with open(os.path.join(folder, f"eval_{args.eval_checkpoint}_scores.json"),
              "w") as f:
        json.dump(scores, f, indent=1)


if __name__ == "__main__":
    main()
