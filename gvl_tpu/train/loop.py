"""Training orchestration: epochs, schedules, checkpoints, eval, best-model
bookkeeping.

Behavioral spec: reference train.py:151-595 —
- run dir + source backup + logger (misc/utils.py);
- contrastive-weight schedule per epoch (train.py:304-310, 363-367);
- scheduled-sampling probability schedule (train.py:355-358);
- per-epoch model-last checkpoint, per-task best checkpoints with criteria:
  grounding = sum R@1@IoU{.1,.3,.5,.7}; dvc = METEOR + soda_c;
  pc = para_METEOR + para_CIDEr + para_Bleu_4 (train.py:475-559);
- info.json carrying the full opt snapshot + loss/score histories
  (train.py:561-578).
"""

from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gvl_tpu.config import Config
from gvl_tpu.data.dataset import Batcher, DenseVideoDataset
from gvl_tpu.eval.evaluate import EvalRunner
from gvl_tpu.eval.metrics import eval_metrics, eval_metrics_grounding
from gvl_tpu.models import build_model
from gvl_tpu.models.text_encoder import load_text_encoder
from gvl_tpu.parallel import make_mesh_for_batch, replicate_tree, shard_batch
from gvl_tpu.train.checkpoint import CheckpointManager
from gvl_tpu.train.criterion import (LossSpec, cl_weight_at_epoch,
                                     make_weight_dict)
from gvl_tpu.train.state import (StepStatics, create_train_state,
                                 make_train_step)
from gvl_tpu.utils.logging import (MetricsWriter, backup_envir, build_folder,
                                   create_logger, set_seed)

TASKS = ("dvc", "pc", "grounding")


def criteria_score(task: str, scores: Dict[str, float]) -> float:
    if task == "val_loss":
        # lower val loss is better; negate so 'higher wins' stays uniform
        # (reference train.py:475-494 val_loss criterion)
        return -scores.get("val_loss_total", 1e18)
    if task == "grounding":
        return sum(scores.get(f"grounding_R@1IOU{t}", 0.0)
                   for t in (0.1, 0.3, 0.5, 0.7))
    if task == "dvc":
        return scores.get("METEOR", 0.0) + scores.get("soda_c", 0.0)
    if task == "pc":
        return (scores.get("para_METEOR", 0.0) + scores.get("para_CIDEr", 0.0)
                + scores.get("para_Bleu_4", 0.0))
    raise ValueError(task)


def init_params(model, cfg: Config, bundle, probe_batch):
    db = {k: jnp.asarray(v) for k, v in probe_batch.items()
          if isinstance(v, np.ndarray)}
    G = cfg.effective_max_gt_events
    kwargs = dict(captions=db["captions"])
    if cfg.enable_contrastive:
        B = db["captions"].shape[0]
        kwargs.update(
            word_embed=jnp.zeros((B, G, cfg.max_text_input_len,
                                  bundle.hidden_size)),
            token_mask=jnp.ones((B, G, cfg.max_text_input_len), bool),
            gt_mask=db["gt_mask"])
    if cfg.transformer_input_type == "gt_proposals":
        kwargs.update(proposals=db["gt_boxes"], proposals_mask=db["gt_mask"])
    return model.init(jax.random.PRNGKey(cfg.seed), db["video_feats"],
                      db["video_mask"], db["duration"], method=model.init_all,
                      **kwargs)


def add_text_inputs(batch, bundle, cfg: Config):
    if bundle is not None:
        ids, mask = bundle.tokenize(batch["captions_raw"],
                                    cfg.effective_max_gt_events,
                                    cfg.max_text_input_len)
        batch["text_ids"] = ids
        batch["text_mask"] = mask
    return batch


def make_gpt_tokenize(cfg: Config):
    """(gpt_spec, batch-tokenizer fn) for the ClipCap head; None when the
    config doesn't use it. Uses the real gpt2 tokenizer when available, the
    hash fallback otherwise (reference GPT.py tokenizes raw captions with
    GPT2Tokenizer on the fly)."""
    if cfg.caption_decoder_type != "gpt2":
        return None, None, None
    from gvl_tpu.models.gpt_captioner import load_gpt2_spec
    from gvl_tpu.models.text_encoder import HashTokenizer, _batch_tokenize
    spec, tok = load_gpt2_spec(cfg)
    if tok is not None:
        def decode_fn(ids):
            text = tok.decode([int(i) for i in ids])
            return text.split(".")[0]
    else:
        def decode_fn(ids):
            return " ".join(f"w{int(i)}" for i in ids if int(i) > 2)
    if tok is not None:
        def tok_fn(sents, max_len):
            out = tok([s + "." for s in sents], return_tensors="np",
                      truncation=True, padding="max_length",
                      max_length=max_len)
            return (out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32))
    else:
        hash_tok = HashTokenizer(spec.vocab_size)

        def tok_fn(sents, max_len):
            return hash_tok(sents, max_len)

    def add_gpt_inputs(batch):
        ids, mask = _batch_tokenize(tok_fn, batch["captions_raw"],
                                    cfg.effective_max_gt_events,
                                    cfg.max_caption_len)
        batch["gpt_tokens"] = ids
        batch["gpt_mask"] = mask
        return batch

    return spec, add_gpt_inputs, decode_fn


def train(cfg: Config) -> str:
    if cfg.start_from:
        # resume continues with the run's original hyperparameters: restore
        # every saved opt except the resume controls (reference
        # train.py:168-183, exclude list there)
        info_path = os.path.join(cfg.save_dir, cfg.start_from, "info.json")
        if os.path.exists(info_path):
            with open(info_path) as f:
                saved = json.load(f).get("opt", {})
            # reference exclude list + {epoch, id, save_dir}: restoring
            # those would forbid extending a run or resuming a relocated
            # run dir (deliberate usability deviation)
            exclude = {"start_from", "start_from_mode", "pretrain", "debug",
                       "epoch", "id", "save_dir"}
            for k, v in saved.items():
                if k.startswith("_"):   # internal derived scratch keys
                    continue
                if k not in exclude and cfg.get(k, None) != v:
                    print(f"resume opt {k}: {cfg.get(k, None)} -> {v}")
                    cfg.set(k, v)
            cfg.pretrain = False
    assert cfg.num_queries >= cfg.effective_max_gt_events, (
        f"num_queries ({cfg.num_queries}) must be >= the padded GT width "
        f"({cfg.effective_max_gt_events}): one-to-one matching needs a "
        "query per GT slot (lower max_gt_events/gt_proposal_sample_num or "
        "raise num_queries)")
    set_seed(cfg.seed)
    folder = build_folder(cfg)
    logger = create_logger(folder)
    backup_envir(folder)
    writer = MetricsWriter(folder)
    cfg.dump_json(os.path.join(folder, "opts.json"))
    logger.info(f"run dir: {folder}")

    rng_data = np.random.RandomState(cfg.seed)
    train_ds = DenseVideoDataset(cfg.train_caption_file,
                                 cfg.visual_feature_folder, cfg.dict_file,
                                 True, cfg, rng_data)
    val_ds = DenseVideoDataset(cfg.val_caption_file,
                               cfg.visual_feature_folder, cfg.dict_file,
                               False, cfg, np.random.RandomState(0))
    train_batcher = Batcher(train_ds, cfg, cfg.batch_size, shuffle=True,
                            rng=rng_data, drop_last=True)
    val_batcher = Batcher(val_ds, cfg, cfg.eval_batch_size, shuffle=False)

    bundle = load_text_encoder(cfg)
    text_hidden = bundle.hidden_size if bundle else 768
    gpt_spec, add_gpt_inputs, gpt_decode = make_gpt_tokenize(cfg)
    model = build_model(cfg, text_hidden_dim=text_hidden, gpt_spec=gpt_spec)
    if bundle is not None and not bundle.pretrained:
        logger.warning("text encoder: no pretrained weights available "
                       "(offline) — using random init")

    probe = add_text_inputs(next(iter(train_batcher)), bundle, cfg)
    params = init_params(model, cfg, bundle, probe)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    logger.info(f"model params: {n_params / 1e6:.2f}M")

    statics = StepStatics(
        spec=LossSpec.from_config(cfg),
        enable_contrastive=cfg.enable_contrastive,
        caption_loss=cfg.caption_loss_coef > 0 and
        cfg.caption_decoder_type != "none",
        two_stage=cfg.transformer_input_type == "gt_proposals",
        train_text_encoder=cfg.enable_contrastive and
        cfg.text_encoder_learning_strategy != "frozen",
        disable_mid_caption_heads=cfg.disable_mid_caption_heads,
        enable_pos_emb_for_captioner=bool(
            cfg.get("enable_pos_emb_for_captioner", False)),
        temporal_shapes=tuple(cfg.temporal_shapes()),
        caption_rl=cfg.caption_loss_type == "rl",
        # two-stage also disables the caption matching cost (reference
        # decide_two_stage sets matcher.cost_caption = 0)
        caption_cost=cfg.set_cost_caption > 0 and
        cfg.transformer_input_type != "gt_proposals",
        caption_gpt=cfg.caption_decoder_type == "gpt2",
        text_bf16=bool(cfg.train_use_amp),
        caption_bf16=bool(cfg.get("train_caption_bf16", False)))

    if cfg.pretrain and cfg.pretrain_path:
        from gvl_tpu.train.checkpoint import load_pretrained
        params = load_pretrained(params, cfg.pretrain_path, cfg.pretrain, cfg)
        logger.info(f"loaded pretrained weights ({cfg.pretrain}) from "
                    f"{cfg.pretrain_path}")

    steps_per_epoch = max(len(train_batcher), 1)
    state = create_train_state(cfg, model, params,
                               bundle.params if bundle else None,
                               steps_per_epoch, statics)
    step_fn, _, _ = make_train_step(
        model, bundle.apply_fn if bundle else None, cfg, statics)
    mesh = make_mesh_for_batch(cfg.batch_size, cfg.mesh_shape)
    logger.info(f"mesh: {mesh}")
    if cfg.get("sp_msda", True):
        from gvl_tpu.parallel.sp import set_sp_context
        ctx = set_sp_context(mesh, halo_frac=float(cfg.sp_halo_frac))
        if ctx is not None:
            logger.info(f"sp-MSDA enabled: sp={ctx.sp} "
                        f"halo_frac={ctx.halo_frac}")
    # ss_prob is STATIC: it takes only a handful of distinct values over
    # training (the reference schedule bumps it every
    # scheduled_sampling_increase_every epochs, train.py:355-358), and a
    # traced ss_prob would force the captioner's serial scheduled-sampling
    # branch even when ss_prob == 0 — losing the fused teacher-forcing path.
    # Cost: one re-trace per distinct value.
    step_jit = jax.jit(step_fn, donate_argnums=(0,), static_argnums=(4,))
    state = replicate_tree(state, mesh)

    ckpt = CheckpointManager(folder)
    start_epoch = 0
    if cfg.start_from:
        payload = ckpt.restore(f"model-{cfg.start_from_mode}", state)
        if payload is not None:
            state = payload["state"]
            start_epoch = int(payload["epoch"])
            logger.info(f"resumed from epoch {start_epoch}")

    # evaluate on the training mesh when it can shard the eval batch
    eval_mesh = mesh if (len(mesh.devices.flat) > 1
                         and cfg.eval_batch_size % mesh.shape["dp"] == 0) \
        else None
    runner = EvalRunner(cfg, model, bundle, train_ds.translator,
                        gpt_decode=gpt_decode, mesh=eval_mesh)
    base_weights = make_weight_dict(cfg)
    if statics.two_stage:
        # gt_proposals mode: localization is given, so the reference zeroes
        # every class/box/giou loss weight (misc/utils.decide_two_stage,
        # utils.py:32-43)
        for k in list(base_weights):
            if any(q in k for q in ("loss_ce", "loss_bbox", "loss_giou")):
                base_weights[k] = 0.0
    history: Dict[str, Dict] = {"val_scores": {}, "train_loss": {}}
    best = {t: -1e18 for t in TASKS}
    best_overall = -1e18
    # val-loss checkpoint selection must compare the SAME weighting across
    # epochs — use the schedule's final contrastive weight, not the ramping
    # per-epoch one (otherwise an early epoch wins merely because its total
    # was computed with a smaller weight vector)
    weights_val = dict(base_weights)
    cl_final = cl_weight_at_epoch(cfg, cfg.epoch)
    for k in weights_val:
        if "contrastive_loss" in k:
            weights_val[k] = cl_final

    global_step = int(start_epoch * steps_per_epoch)
    for epoch in range(start_epoch, cfg.epoch):
        cl_w = cl_weight_at_epoch(cfg, epoch)
        weights = dict(base_weights)
        for k in weights:
            if "contrastive_loss" in k:
                weights[k] = cl_w
        weights_dev = {k: jnp.asarray(v, jnp.float32)
                       for k, v in weights.items()}

        # scheduled sampling probability (reference train.py:355-358)
        ss_prob = 0.0
        if epoch > cfg.scheduled_sampling_start >= 0:
            frac = (epoch - cfg.scheduled_sampling_start) \
                // cfg.scheduled_sampling_increase_every
            ss_prob = min(cfg.basic_ss_prob
                          + cfg.scheduled_sampling_increase_prob * frac,
                          cfg.scheduled_sampling_max_prob)

        epoch_losses: "OrderedDict[str, float]" = OrderedDict()
        t_epoch = time.time()
        n_iter = 0
        # tracing/profiling (SURVEY.md §5.1: the reference has only wall-clock
        # logging; here a device trace is one flag away)
        profiling = cfg.profile_steps > 0 and epoch == start_epoch
        if profiling:
            jax.profiler.start_trace(os.path.join(folder, "trace"))
        for batch in train_batcher:
            batch = add_text_inputs(batch, bundle, cfg)
            if add_gpt_inputs is not None:
                batch = add_gpt_inputs(batch)
            db = shard_batch({k: v for k, v in batch.items()
                              if isinstance(v, np.ndarray)}, mesh)
            state, losses = step_jit(state, db, weights_dev,
                                     jax.random.PRNGKey(global_step),
                                     float(ss_prob))
            global_step += 1
            n_iter += 1
            if profiling and n_iter == cfg.profile_steps:
                jax.block_until_ready(losses["total_loss"])
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"profiler trace written to {folder}/trace")
            if n_iter % max(steps_per_epoch // 10, 1) == 0:
                losses_h = jax.device_get(losses)
                for k, v in losses_h.items():
                    epoch_losses[k] = epoch_losses.get(k, 0.0) + float(v)
                logger.info(
                    f"ep {epoch} it {n_iter}/{steps_per_epoch} "
                    f"total={float(losses_h['total_loss']):.4f}")
                writer.write(global_step, losses_h, prefix="train/")
            if cfg.debug and n_iter >= 5:
                break

        if profiling:
            jax.profiler.stop_trace()
        logger.info(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s "
                    f"(bad videos: {train_ds.bad_video_num})")
        history["train_loss"][str(epoch)] = {
            k: v / max(n_iter // max(steps_per_epoch // 10, 1), 1)
            for k, v in epoch_losses.items()}

        ckpt.save("model-last", jax.device_get(state), epoch)
        if cfg.save_all_checkpoint:
            ckpt.save(f"model_iter_{global_step}", jax.device_get(state), epoch)

        if epoch % cfg.save_checkpoint_every == 0 and \
                epoch >= cfg.min_epoch_when_save:
            scores = run_validation(cfg, runner, state, bundle, val_batcher,
                                    folder, epoch, logger,
                                    weights=weights_val)
            history["val_scores"][str(epoch)] = scores
            writer.write(global_step, scores, prefix="eval/")

            for task in TASKS:
                s = criteria_score(task, scores)
                if s > best[task]:
                    best[task] = s
                    ckpt.save(f"model-best-{task}", jax.device_get(state),
                              epoch)
            crit = criteria_score(cfg.criteria_for_best_ckpt, scores)
            if crit > best_overall:
                best_overall = crit
                ckpt.save("model-best", jax.device_get(state), epoch)
                logger.info(f"new best ({cfg.criteria_for_best_ckpt}): "
                            f"{crit:.4f} @ epoch {epoch}")

        info = {"opt": cfg.to_dict(), "history": history,
                "best": best, "best_overall": best_overall, "epoch": epoch}
        with open(os.path.join(folder, "info.json"), "w") as f:
            json.dump(info, f, indent=1, default=str)

    if cfg.get("sp_msda", True):
        from gvl_tpu.parallel.sp import set_sp_context
        set_sp_context(None)    # don't leak the mesh into later traces
    logger.info("training finished")
    return folder


def run_validation(cfg: Config, runner: EvalRunner, state, bundle,
                   val_batcher, folder: str, epoch: int, logger,
                   weights: Optional[Dict[str, float]] = None
                   ) -> Dict[str, float]:
    params = state.params
    text_params = state.text_params
    runner.set_params(params, text_params)
    dvc_path = os.path.join(folder, f"pred_epoch{epoch}.json")
    # the trainer's global sp context must not leak into the eval trace:
    # eval may run mesh-less (batch not divisible) or on a different mesh,
    # and shard_map would reject its batch shapes
    from gvl_tpu.parallel.sp import sp_context
    with sp_context(runner.mesh):
        out_path, out_json, out_g, aux_g, loss_sum = runner.run(
            val_batcher, dvc_path, logger=logger, debug=cfg.debug)

    scores: Dict[str, float] = {}
    skip_lang = cfg.eval_disable_captioning or \
        cfg.caption_decoder_type == "none" or cfg.caption_loss_coef == 0
    if not skip_lang:
        scores.update(eval_metrics(
            out_path, gt_filenames=cfg.gt_file_for_eval,
            para_gt_filenames=cfg.gt_file_for_para_eval,
            dvc_eval_version=cfg.eval_tool_version))
    if cfg.enable_contrastive and cfg.eval_enable_grounding:
        scores.update(eval_metrics_grounding(
            out_path + ".grounding.json", cfg.eval_gt_file_for_grounding))
        aux_scores = eval_metrics_grounding(
            out_path + "_aux.grounding.json", cfg.eval_gt_file_for_grounding)
        scores.update({"aux_" + k: v for k, v in aux_scores.items()})
    if cfg.only_ft_class_head and os.path.exists(cfg.tal_gt_file) and \
            getattr(runner, "last_tal_json", None):
        from gvl_tpu.eval.metrics import eval_tal
        scores.update(eval_tal(cfg.tal_gt_file, runner.last_tal_json))
    scores.update({"val_" + k: v for k, v in loss_sum.items()})
    if weights is not None:
        # weighted total val loss (same weight_dict as training) — drives
        # criteria_for_best_ckpt == 'val_loss'
        scores["val_loss_total"] = float(sum(
            w * loss_sum[k] for k, w in weights.items() if k in loss_sum))
    summary = {k: round(float(v), 4) for k, v in scores.items()
               if isinstance(v, (int, float))}
    if scores.get("approx"):
        # VERDICT r4 #6: the summary line itself must flag approximate
        # metrics (METEOR jar data absent, SPICE chunker parser) so a
        # human reading the log can't mistake them for jar-exact numbers.
        summary["approx"] = scores["approx"]
    logger.info("val scores: " + json.dumps(summary))
    return scores
