"""Full train() orchestration test: 2 debug epochs on synthetic data with
per-epoch validation, checkpoints, and info.json history."""

import json
import os

from gvl_tpu.config import Config
from gvl_tpu.data.synthetic import make_synthetic_dataset
from gvl_tpu.train.loop import train


def test_train_loop_end_to_end(tmp_path):
    anno, feats, vocab, vsize = make_synthetic_dataset(str(tmp_path),
                                                       num_videos=6,
                                                       feat_dim=16)
    cfg = Config()
    cfg.update(dict(
        id="synthetic_run", save_dir=str(tmp_path / "save"),
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        eval_gt_file_for_grounding=anno.replace('anno.json', 'grounding.json'),
        visual_feature_folder=feats, visual_feature_type="npy",
        dict_file=vocab, vocab_size=vsize, feature_dim=16,
        frame_embedding_num=24, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_feature_levels=3,
        num_queries=8, gt_proposal_sample_num=4, max_caption_len=8,
        input_encoding_size=32, rnn_size=32, att_hid_size=32, cap_nheads=1,
        cap_num_feature_levels=3, with_box_refine=1, enable_contrastive=True,
        contrastive_hidden_size=16, caption_decoder_type="standard",
        caption_loss_coef=1.0, count_loss_coef=0.5, set_cost_cl=1.0,
        contrastive_loss_start_coef=0.1, max_eseq_length=6, batch_size=3,
        eval_batch_size=3, epoch=2, msda_impl="ref", max_text_input_len=12,
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=32, offline_text_encoder_layers=1,
        criteria_for_best_ckpt="grounding", debug=True,
        eval_tool_version="2018",
    ))
    folder = train(cfg)

    # artifacts exist
    assert os.path.exists(os.path.join(folder, "info.json"))
    assert os.path.exists(os.path.join(folder, "model-last.ckpt"))
    assert os.path.exists(os.path.join(folder, "model-best.ckpt"))
    assert os.path.exists(os.path.join(folder, "metrics.jsonl"))

    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    assert "history" in info and len(info["history"]["val_scores"]) == 2
    ep_scores = info["history"]["val_scores"]["1"]
    for key in ["grounding_R@1IOU0.5", "METEOR", "soda_c", "val_loss_ce"]:
        assert key in ep_scores, sorted(ep_scores)
