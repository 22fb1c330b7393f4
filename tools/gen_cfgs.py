#!/usr/bin/env python
"""Generate the shipped config suite (cfgs/*.yml).

One config per dataset x task, hyperparameter-compatible with the reference's
cfgs/ (reference: cfgs/*.yml — the values are the experimental contract; the
file layout/comments here are our own). Run: python tools/gen_cfgs.py
"""

import os

HEADER = """\
# GVL-TPU config — {id}
# Hyperparameters match the reference experiment of the same name.
"""

# ---------------------------------------------------------------- blocks
MODEL = dict(
    enc_layers=2, dec_layers=2, transformer_ff_dim=512,
    transformer_dropout_prob=0.1, with_box_refine=1, fix_xcw=1,
    caption_decoder_type="standard", cap_nheads=1, cap_dec_n_points=4,
    cap_num_feature_levels=4, att_hid_size=512)

COSTS = dict(set_cost_caption=0, set_cost_giou=4, set_cost_bbox=0,
             set_cost_class=2, set_cost_cl=2.0)

LOSSES = dict(caption_loss_coef=2, giou_loss_coef=4, bbox_loss_coef=0,
              cls_loss_coef=2, count_loss_coef=0.5, max_eseq_length=10,
              lloss_gau_mask=1)

CONTRASTIVE = dict(
    enable_contrastive=True, enable_cross_video_cl=True,
    cl_schedule_time=[0, 2], cl_schedule_val=[0, 0.1],
    contrastive_loss_temperature=0.1, contrastive_hidden_size=128,
    eval_set_cost_class=0, pretrained_language_model="roberta-base",
    huggingface_cache_dir=".cache", word_context_modeling_type="attention_pool",
    enable_word_context_modeling=True)

OPTIM = dict(lr=0.00005, learning_rate_decay_start=8,
             learning_rate_decay_every=3, learning_rate_decay_rate=0.5,
             weight_decay=0.0001, epoch=25, eval_batch_size=16,
             min_epoch_when_save=2)

ANET_DATA = dict(
    train_caption_file="data/anet/captiondata/train_modified.json",
    val_caption_file="data/anet/captiondata/val_1.json",
    gt_file_for_eval=["data/anet/captiondata/val_1.json",
                      "data/anet/captiondata/val_2.json"],
    gt_file_for_para_eval=[
        "data/anet/captiondata/para/anet_entities_val_1_para.json",
        "data/anet/captiondata/para/anet_entities_val_2_para.json"],
    eval_gt_file_for_grounding=
    "data/anet/captiondata/grounding/val1_for_grounding.json",
    dict_file="data/anet/vocabulary_activitynet_thres2.json",
    vocab_size=8517, gt_proposal_sample_num=30, sample_method="nearest",
    invalid_video_json=[])

TSP_FEATS = dict(visual_feature_type=["tsp"],
                 visual_feature_folder=["data/anet/features/tsp"],
                 feature_dim=512)
C3D_FEATS = dict(visual_feature_type="c3d",
                 visual_feature_folder="data/anet/features/c3d",
                 feature_dim=500)

SENT_CTX = dict(enable_sentence_context_modeling=True,
                enable_sentence_pos_embedding=True,
                sentence_modeling_layer_num=1,
                enable_layer_diff_text_feature=True)
NO_SENT_CTX = dict(enable_sentence_context_modeling=False,
                   enable_sentence_pos_embedding=False,
                   sentence_modeling_layer_num=1,
                   enable_layer_diff_text_feature=False)


def merge(*dicts, **kw):
    out = {}
    for d in dicts:
        out.update(d)
    out.update(kw)
    return out


CFGS = {
    # single-sentence video grounding on ANet (TSP / C3D features)
    "anet_tsp_ssvg": merge(
        ANET_DATA, TSP_FEATS, MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM,
        NO_SENT_CTX, id="anet_tsp_ssvg", num_queries=30, ec_alpha=1.0,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True),
    "anet_c3d_ssvg": merge(
        ANET_DATA, C3D_FEATS, MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM,
        NO_SENT_CTX, id="anet_c3d_ssvg", num_queries=30, ec_alpha=1.0,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True),
    # joint multi-sentence grounding + dense captioning
    "anet_tsp_msvg_dvc": merge(
        ANET_DATA, TSP_FEATS, MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM,
        SENT_CTX, id="anet_tsp_msvg_dvc_pc", num_queries=30, ec_alpha=1.0,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True),
    "anet_c3d_msvg_dvc": merge(
        ANET_DATA, C3D_FEATS, MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM,
        SENT_CTX, id="anet_c3d_msvg_dvc", num_queries=30, ec_alpha=1.0,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True),
    # paragraph captioning
    "anet_tsp_pc": merge(
        ANET_DATA, TSP_FEATS, MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM,
        SENT_CTX, id="anet_tsp_pc", num_queries=50, ec_alpha=0.5, epoch=40,
        enable_layer_diff_text_feature=False,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True,
        criteria_for_best_ckpt="pc"),
    # TACoS grounding (long videos: 200-frame embedding). The msvg variant
    # differs from ssvg only by enabling sentence-context modeling
    # (reference: diff of cfgs/tacos_c3d_{ssvg,msvg}.yml).
    "tacos_c3d_ssvg": merge(
        MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM, NO_SENT_CTX,
        id="tacos_c3d_ssvg", dataset="tacos",
        visual_feature_type=["c3d4096"],
        visual_feature_folder=["data/tacos/features/c3d"], feature_dim=4096,
        train_caption_file="data/tacos/loss_ratio/split_train.json",
        val_caption_file="data/tacos/loss_ratio/split_val.json",
        gt_file_for_eval=["data/tacos/loss_ratio/split_val.json"],
        eval_gt_file_for_grounding="data/tacos/loss_ratio/split_val.json",
        dict_file="data/tacos/vocabulary_tacos.json", vocab_size=1569,
        train_proposal_sample_num=30, gt_proposal_sample_num=1000,
        sample_method="nearest", frame_embedding_num=200,
        train_with_split_anno=True, lr=0.0001, text_encoder_lr=0.00001,
        text_encoder_lr_decay_start=8, text_encoder_lr_decay_every=3,
        text_encoder_lr_decay_rate=0.5, epoch=20, batch_size=4,
        min_epoch_when_save=3, num_queries=100, ec_alpha=1.0,
        eval_enable_grounding=True,
        eval_enable_maximum_matching_for_grounding=True,
        text_encoder_learning_strategy="multi_step",
        criteria_for_best_ckpt="grounding", max_eseq_length=20,
        invalid_video_json=[]),
    # TACoS multi-sentence grounding
    "tacos_c3d_msvg": None,  # filled in below from tacos_c3d_ssvg
    # YouCook2 dense captioning (resnet+bn features)
    "yc2_tsn_dvc": merge(
        MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM, SENT_CTX,
        id="yc2_tsn_dvc", dataset="youcook2",
        visual_feature_type=["resnet", "bn"],
        visual_feature_folder=["data/yc2/features/resnet_bn/",
                               "data/yc2/features/resnet_bn/"],
        feature_dim=3072,
        train_caption_file="data/yc2/captiondata/yc2_train.json",
        val_caption_file="data/yc2/captiondata/yc2_val.json",
        gt_file_for_auc="data/yc2/captiondata/yc2_val.json",
        gt_file_for_eval=["data/yc2/captiondata/yc2_val.json"],
        gt_file_for_para_eval=["data/yc2/captiondata/para/para_yc2_val.json"],
        eval_gt_file_for_grounding=
        "data/yc2/captiondata/grounding/yc2_val_for_grounding.json",
        dict_file="data/yc2/vocabulary_youcook2.json", vocab_size=1607,
        gt_proposal_sample_num=30, frame_embedding_num=200, num_queries=100,
        batch_size=1, ec_alpha=1.0, text_encoder_lr=0.00001,
        text_encoder_lr_decay_start=8, text_encoder_lr_decay_every=3,
        text_encoder_lr_decay_rate=0.5,
        text_encoder_learning_strategy="frozen", eval_enable_grounding=True,
        invalid_video_json=[]),
    # YouMakeup joint grounding + captioning (i3d features, long videos)
    "ym_i3d_msvg_dvc": merge(
        MODEL, COSTS, LOSSES, CONTRASTIVE, OPTIM, SENT_CTX,
        id="ym_i3d_msvg_dvc", visual_feature_type="i3d_rgb",
        visual_feature_folder="data/youmakeup/features/i3d_rgb",
        feature_dim=1024,
        train_caption_file="data/youmakeup/annotations/caption/train.json",
        val_caption_file="data/youmakeup/annotations/caption/val.json",
        gt_file_for_eval=["data/youmakeup/annotations/caption/val.json"],
        eval_gt_file_for_grounding=
        "data/youmakeup/annotations/grounding/gt_val_for_grounding.json",
        dict_file="data/youmakeup/annotations/vocabulary_youmakeup.json",
        vocab_size=1247, gt_proposal_sample_num=300, lr=0.0001, batch_size=4,
        frame_embedding_num=800, num_queries=100, eval_tool_version="2021",
        enable_layer_diff_text_feature=False,
        text_encoder_learning_strategy="multi_step",
        text_encoder_lr=0.00001, text_encoder_lr_decay_start=8,
        text_encoder_lr_decay_every=3, text_encoder_lr_decay_rate=0.5,
        eval_enable_grounding=True, invalid_video_json=[]),
    # SCST reinforcement fine-tuning of the captioner
    "anet_c3d_dvc_rl": dict(
        id="anet_c3d_dvc_rl", base_cfg_path="cfgs/anet_c3d_msvg_dvc.yml",
        lr=0.00005, learning_rate_decay_start=3, learning_rate_decay_every=3,
        learning_rate_decay_rate=0.5, caption_loss_type="rl",
        only_ft_captioner=True, rl_scorer_weights=[0.95, 0.05],
        rl_scorer_types=["Meteor", "CiderD"], enable_video_cropping=True,
        crop_num=256, min_crop_ratio=0.5, nthreads=4, pretrain="full",
        optimizer_type="adamw", pretrain_path="PRETRAINED_CHECKPOINT",
        cached_tokens="anet/activitynet_train_ngrams_for_cider-idxs",
        min_epoch_when_save=0),
    "anet_tsp_dvc_rl": dict(
        id="anet_tsp_dvc_rl", base_cfg_path="cfgs/anet_tsp_msvg_dvc.yml",
        lr=0.00005, learning_rate_decay_start=3, learning_rate_decay_every=3,
        learning_rate_decay_rate=0.5, caption_loss_type="rl",
        only_ft_captioner=True, rl_scorer_weights=[0.95, 0.05],
        rl_scorer_types=["Meteor", "CiderD"], enable_video_cropping=True,
        crop_num=256, min_crop_ratio=0.5, nthreads=4, pretrain="full",
        optimizer_type="adamw", pretrain_path="PRETRAINED_CHECKPOINT",
        cached_tokens="anet/activitynet_train_ngrams_for_cider-idxs",
        min_epoch_when_save=0),
}


CFGS["tacos_c3d_msvg"] = merge(
    CFGS["tacos_c3d_ssvg"], id="tacos_c3d_msvg",
    enable_sentence_context_modeling=True,
    enable_sentence_pos_embedding=True)


def dump(name, cfg):
    import yaml
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", name + ".yml")
    with open(path, "w") as f:
        f.write(HEADER.format(id=cfg.get("id", name)))
        f.write(yaml.safe_dump(cfg, sort_keys=True, default_flow_style=None))
    print("wrote", path)


if __name__ == "__main__":
    os.makedirs("cfgs", exist_ok=True)
    for name, cfg in CFGS.items():
        dump(name, cfg)
