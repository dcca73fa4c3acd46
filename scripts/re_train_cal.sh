#!/usr/bin/env bash
# Re-train CAL/MCN with MEE-guided inter-video negatives, warm-started
# from a first-round checkpoint (reference scripts/re_train_cal.sh +
# re_train_mcn.sh). Usage:
#   scripts/re_train_cal.sh <first_run_results_dir> <mee_vr_submission.json> \
#       [--model_type mcn] [extra train_cal flags...]
set -e
init_dir=${1:?usage: re_train_cal.sh <first_run_results_dir> <mee_vr.json> [flags...]}
vr_json=${2:?usage: re_train_cal.sh <first_run_results_dir> <mee_vr.json> [flags...]}
shift 2
exec scripts/train_cal.sh \
  --init_ckpt_path "${init_dir}/ckpt" \
  --external_train_vr_res_path "${vr_json}" \
  "$@"
