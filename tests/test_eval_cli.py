"""eval.py CLI smoke test: train a tiny synthetic run via train(), then
evaluate its checkpoint through the standalone CLI code path (opt restore
from the run dir, checkpoint load, metrics)."""

import json
import os
import subprocess
import sys

from gvl_tpu.config import Config
from gvl_tpu.data.synthetic import make_synthetic_dataset
from gvl_tpu.train.loop import train


def test_eval_cli_roundtrip(tmp_path):
    anno, feats, vocab, vsize = make_synthetic_dataset(str(tmp_path),
                                                       num_videos=4,
                                                       feat_dim=16)
    cfg = Config()
    cfg.update(dict(
        id="cli_run", save_dir=str(tmp_path / "save"),
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
        criteria_for_best_ckpt="grounding", debug=True))
    folder = train(cfg)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "eval.py", "--eval_save_dir", str(tmp_path / "save"),
         "--eval_folder", "cli_run", "--eval_checkpoint", "model-best",
         "--eval_batch_size", "2",
         "--eval_gt_file_for_grounding", anno],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=900)
    assert res.returncode == 0, res.stderr[-3000:]
    scores_path = os.path.join(folder, "eval_model-best_scores.json")
    assert os.path.exists(scores_path)
    scores = json.load(open(scores_path))
    assert "grounding_mIOU" in scores and "METEOR" in scores
