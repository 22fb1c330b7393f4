#!/bin/bash
# Evaluate TACoS sentence grounding (maximum matching) on the test split.
eval_folder=$1
python eval.py --eval_folder ${eval_folder} \
  --eval_save_dir save \
  --eval_batch_size 4 \
  --eval_caption_file data/tacos/loss_ratio/split_test.json \
  --eval_gt_file_for_grounding data/tacos/loss_ratio/split_test.json \
  --eval_enable_maximum_matching_for_grounding \
  --eval_disable_captioning
