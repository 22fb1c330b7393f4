"""Checkpoint resume: a run killed after epoch 0 continues from model-last
with the epoch counter and state intact."""

import json
import os

from gvl_tpu.config import Config
from gvl_tpu.data.synthetic import make_synthetic_dataset
from gvl_tpu.train.loop import train


def make_cfg(tmp_path, **kw):
    anno, feats, vocab, vsize = make_synthetic_dataset(str(tmp_path),
                                                       num_videos=4,
                                                       feat_dim=16)
    cfg = Config()
    cfg.update(dict(
        id="resume_run", save_dir=str(tmp_path / "save"),
        train_caption_file=anno, val_caption_file=anno,
        gt_file_for_eval=[anno], gt_file_for_para_eval=[],
        eval_gt_file_for_grounding=anno.replace('anno.json', 'grounding.json'),
        visual_feature_folder=feats, visual_feature_type="npy",
        dict_file=vocab, vocab_size=vsize, feature_dim=16,
        frame_embedding_num=16, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=2, transformer_ff_dim=64, num_feature_levels=2,
        num_queries=6, gt_proposal_sample_num=3, max_caption_len=6,
        input_encoding_size=32, rnn_size=32, att_hid_size=16, cap_nheads=1,
        cap_num_feature_levels=2, with_box_refine=1, enable_contrastive=True,
        contrastive_hidden_size=16, caption_decoder_type="standard",
        caption_loss_coef=1.0, count_loss_coef=0.5, set_cost_cl=1.0,
        max_eseq_length=4, batch_size=2, eval_batch_size=2,
        msda_impl="ref", max_text_input_len=8,
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=32, offline_text_encoder_layers=1,
        criteria_for_best_ckpt="grounding", debug=True))
    cfg.update(kw)
    return cfg


def test_resume_from_last(tmp_path):
    cfg = make_cfg(tmp_path, epoch=1)
    folder = train(cfg)
    info1 = json.load(open(os.path.join(folder, "info.json")))
    assert info1["epoch"] == 0

    cfg2 = make_cfg(tmp_path, epoch=2, start_from="resume_run",
                    start_from_mode="last")
    folder2 = train(cfg2)
    assert folder2 == folder                        # same run dir, no rename
    info2 = json.load(open(os.path.join(folder2, "info.json")))
    assert info2["epoch"] == 1                      # continued, not restarted
    assert "1" in info2["history"]["val_scores"]


def test_resume_restores_saved_opts(tmp_path):
    """Resume continues with the run's ORIGINAL hyperparameters (reference
    train.py:168-183): CLI values are overridden by the saved opt snapshot,
    except the resume controls and epoch/id/save_dir."""
    cfg = make_cfg(tmp_path, epoch=1, lr=0.002, weight_decay=0.01)
    train(cfg)

    # attempt to resume with a DIFFERENT lr: the saved one must win
    cfg2 = make_cfg(tmp_path, epoch=2, start_from="resume_run",
                    start_from_mode="last", lr=0.5, weight_decay=0.3)
    folder2 = train(cfg2)
    assert cfg2.lr == 0.002
    assert cfg2.weight_decay == 0.01
    assert cfg2.epoch == 2                 # epoch IS extendable (deviation)
    info = json.load(open(os.path.join(folder2, "info.json")))
    assert info["opt"]["lr"] == 0.002
