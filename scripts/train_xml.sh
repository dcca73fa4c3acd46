#!/usr/bin/env bash
# Train XML on TVR (reference scripts/train.sh equivalent).
# Usage: bash scripts/train_xml.sh CTX_MODE VID_FEAT_TYPE [extra args...]
#   CTX_MODE: video|sub|video_sub[+_tef]  VID_FEAT_TYPE: resnet|i3d|resnet_i3d
set -e
ctx_mode=${1:-video_sub_tef}
vid_feat_type=${2:-resnet_i3d}
shift 2 || true

feature_root=${TVR_FEATURE_ROOT:-data/tvr_feature_release}
case ${vid_feat_type} in
  resnet)     vid_feat_path=${feature_root}/video_feature/tvr_resnet152_rgb_max_cl-1.5.h5; extra=() ;;
  i3d)        vid_feat_path=${feature_root}/video_feature/tvr_i3d_rgb600_avg_cl-1.5.h5; extra=() ;;
  resnet_i3d) vid_feat_path=${feature_root}/video_feature/tvr_resnet152_rgb_max_i3d_rgb600_avg_cat_cl-1.5.h5
              extra=(--no_norm_vfeat) ;;  # already normalized per-stream
esac

python -m tvretrieval_tpu.training.train_xml \
  --dset_name tvr --ctx_mode "${ctx_mode}" \
  --train_path data/tvr_train_release.jsonl \
  --eval_path data/tvr_val_release.jsonl \
  --video_duration_idx_path data/tvr_video2dur_idx.json \
  --desc_bert_path ${feature_root}/bert_feature/sub_query/tvr_query_pretrained_w_sub_query.h5 \
  --sub_bert_path ${feature_root}/bert_feature/sub_query/tvr_sub_pretrained_w_sub_query_max_cl-1.5.h5 \
  --vid_feat_path "${vid_feat_path}" \
  "${extra[@]}" "$@"
