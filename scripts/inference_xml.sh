#!/usr/bin/env bash
# Usage: bash scripts/inference_xml.sh MODEL_DIR [extra args...]
set -e
model_dir=$1; shift || true
python -m tvretrieval_tpu.retrieval.inference_xml \
  --model_dir "${model_dir}" --tasks VCMR SVMR VR --nms_thd 0.5 "$@"
