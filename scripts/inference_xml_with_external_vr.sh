#!/usr/bin/env bash
# XML VCMR guided by an external VR submission (e.g. MEE's), replacing the
# internal video ranking (reference scripts/inference_with_external.sh).
# Usage: bash scripts/inference_xml_with_external_vr.sh MODEL_DIR VR_SUBMISSION.json [extra args...]
set -e
model_dir=$1; vr_path=$2; shift 2
python -m tvretrieval_tpu.retrieval.inference_xml \
  --model_dir "${model_dir}" --tasks VCMR VR \
  --external_inference_vr_res_path "${vr_path}" \
  --eval_id external_vr "$@"
