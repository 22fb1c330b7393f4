#!/bin/bash
# Evaluate ActivityNet sentence grounding with the best-grounding checkpoint.
eval_folder=$1
python eval.py --eval_folder ${eval_folder} \
  --eval_checkpoint model-best-grounding \
  --eval_batch_size 16 \
  --eval_disable_captioning \
  --eval_caption_file data/anet/captiondata/val_2.json \
  --eval_save_dir save \
  --eval_gt_file_for_grounding data/anet/captiondata/grounding/val2_for_grounding.json
