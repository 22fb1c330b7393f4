#!/bin/bash
# Evaluate ActivityNet dense video captioning with the best-DVC checkpoint.
eval_folder=$1   # run folder under save/
python eval.py --eval_folder ${eval_folder} \
  --eval_checkpoint model-best-dvc \
  --eval_batch_size 16 \
  --eval_caption_file data/anet/captiondata/val_1.json \
  --eval_save_dir save
