#!/usr/bin/env bash
# Train MEE on TVR (video retrieval baseline).
set -e
feature_root=${TVR_FEATURE_ROOT:-data/tvr_feature_release}
python -m tvretrieval_tpu.training.train_mee \
  --dset_name tvr --ctx_mode video_sub \
  --train_path data/tvr_train_release.jsonl \
  --eval_path data/tvr_val_release.jsonl \
  --video_duration_idx_path data/tvr_video2dur_idx.json \
  --desc_bert_path ${feature_root}/bert_feature/sub_query/tvr_query_pretrained_w_sub_query.h5 \
  --sub_bert_path ${feature_root}/bert_feature/sub_query/tvr_sub_pretrained_w_sub_query_max_cl-1.5.h5 \
  --vid_feat_path ${feature_root}/video_feature/tvr_i3d_rgb600_avg_cl-1.5.h5 \
  "$@"
