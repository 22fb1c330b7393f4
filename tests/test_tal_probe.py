"""TAL linear-probe path: only_ft_class_head training with action classes,
TAL submission written at eval, mAP computed."""

import json
import os

import numpy as np

from gvl_tpu.config import Config
from gvl_tpu.data.synthetic import make_synthetic_dataset
from gvl_tpu.train.loop import train


def test_tal_linear_probe(tmp_path):
    anno, feats, vocab, vsize = make_synthetic_dataset(str(tmp_path),
                                                       num_videos=4,
                                                       feat_dim=16)
    # add action labels + class file + TAL GT
    data = json.load(open(anno))
    classes = ["run", "jump", "cook"]
    gt = {"database": {}, "taxonomy": [], "version": "1.3"}
    rng = np.random.RandomState(0)
    for vid, v in data.items():
        labels = [classes[rng.randint(3)] for _ in v["timestamps"]]
        v["action_labels"] = labels
        gt["database"][vid[2:]] = {
            "subset": "validation",
            "annotations": [{"segment": ts, "label": l}
                            for ts, l in zip(v["timestamps"], labels)]}
    json.dump(data, open(anno, "w"))
    cls_path = tmp_path / "classes.txt"
    cls_path.write_text("\n".join(classes))
    tal_gt = tmp_path / "tal_gt.json"
    tal_gt.write_text(json.dumps(gt))

    cfg = Config()
    cfg.update(dict(
        id="tal_run", save_dir=str(tmp_path / "save"),
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
        contrastive_hidden_size=16, caption_decoder_type="none",
        caption_loss_coef=0.0, set_cost_caption=0.0, count_loss_coef=0.5,
        set_cost_cl=1.0, max_eseq_length=4, batch_size=2, eval_batch_size=2,
        epoch=1, msda_impl="ref", max_text_input_len=8,
        load_pretrained_language_model_from_config="offline",
        offline_text_encoder_hidden=32, offline_text_encoder_layers=1,
        criteria_for_best_ckpt="grounding", debug=True,
        only_ft_class_head=True, num_classes=3,
        action_classes_path=str(cls_path), tal_gt_file=str(tal_gt)))
    folder = train(cfg)

    tal_files = [f for f in os.listdir(folder) if f.endswith(".tal.json")]
    assert tal_files, os.listdir(folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    scores = info["history"]["val_scores"]["0"]
    assert "TAL_Average_mAP" in scores
