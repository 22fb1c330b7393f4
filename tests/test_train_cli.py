"""train.py CLI subprocess smoke test: YAML config + flags -> debug epoch."""

import json
import os
import subprocess
import sys

import yaml

from gvl_tpu.data.synthetic import make_synthetic_dataset


def test_train_cli(tmp_path):
    anno, feats, vocab, vsize = make_synthetic_dataset(str(tmp_path),
                                                       num_videos=4,
                                                       feat_dim=16)
    cfg = dict(
        id="cli_train", save_dir=str(tmp_path / "save"),
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
        max_eseq_length=4, batch_size=2, eval_batch_size=2, epoch=1,
        msda_impl="ref", max_text_input_len=8,
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=32, offline_text_encoder_layers=1,
        criteria_for_best_ckpt="grounding", device="cpu")
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    res = subprocess.run(
        [sys.executable, "train.py", "--cfg_path", str(cfg_path), "--debug",
         "true"],
        capture_output=True, text=True, cwd="/root/repo", timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    # debug mode renames the run id with a timestamp
    save = tmp_path / "save"
    runs = os.listdir(save)
    assert len(runs) == 1 and runs[0].startswith("debug_"), runs
    info = json.load(open(save / runs[0] / "info.json"))
    assert "0" in info["history"]["val_scores"]
